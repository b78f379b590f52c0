package graft.io

import graft.SparkSpec
import graft.contracts._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Format-binding evidence for [[MergeIO]]: the `format` parameter must
  * thread through EVERY read and write inside upsert/scd2Upsert (read
  * of the existing snapshot, staging write, side-writes), because that
  * is the seam Delta binds through — `format("delta")` resolves via
  * Spark's DataSource registry exactly like the built-ins (the
  * [[graft.contracts.DeltaContractStore]] precedent). Proven two ways:
  *
  *  1. LIVE, always: the full upsert / scd2Upsert sequences run under
  *     ORC and JSON — non-default built-in formats, so a missed
  *     `format` thread (an accidental `.parquet(...)` or default-format
  *     read) fails loudly here instead of only surfacing when a delta
  *     jar appears.
  *  2. DELTA PROFILE: the identical parity assertions run on
  *     `format("delta")` whenever delta-spark is on the classpath.
  *     This zero-egress build has no delta jar, so the profile CANCELS
  *     with an explicit message (visible in the test report as
  *     canceled, not silently green).
  */
class MergeFormatSpec extends SparkSpec {
  import spark.implicits._

  private val contract = Contract(id = "t.fmt", version = "1.0.0",
    schema = Seq(SchemaObjectDef("t", Seq(
      FieldDef("id", Some("bigint"), required = true),
      FieldDef("v", Some("string"), required = true)))))

  private def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 00:00:00")

  private def canonKv(df: DataFrame): Seq[(Long, String)] =
    df.select(col("id"), col("v")).collect()
      .map(r => (r.getLong(0), r.getString(1))).sortBy(_._1).toSeq

  /** The same two-step upsert under `format`; returns the final table. */
  private def upsertSequence(format: String): Seq[(Long, String)] = {
    val path = tmpDir(s"graft_mergefmt_$format") + "/data"
    MergeIO.upsert(Seq((1L, "a"), (2L, "b")).toDF("id", "v"),
      path, contract, Seq("id"), format = format)
    MergeIO.upsert(Seq((2L, "B"), (3L, "c")).toDF("id", "v"),
      path, contract, Seq("id"), format = format)
    canonKv(spark.read.format(format).load(path))
  }

  private def scd2Sequence(format: String): Seq[(Long, String, Long, Boolean)] = {
    val dir = tmpDir(s"graft_scd2fmt_$format") + "/hist"
    MergeIO.scd2Upsert(spark, dir, Seq((1L, "A"), (2L, "P")).toDF("k", "status"),
      Seq("k"), Seq("status"), ts(1), format = format)
    MergeIO.scd2Upsert(spark, dir, Seq((1L, "B"), (2L, "P")).toDF("k", "status"),
      Seq("k"), Seq("status"), ts(2), format = format)
    spark.read.format(format).load(dir)
      .select(col("k"), col("status"), col("version"), col("is_current"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getBoolean(3)))
      .sortBy(x => (x._1, x._3)).toSeq
  }

  private val expectedUpsert = Seq((1L, "a"), (2L, "B"), (3L, "c"))
  private val expectedScd2 = Seq(
    (1L, "A", 1L, false), (1L, "B", 2L, true), (2L, "P", 1L, true))

  test("upsert format threads end-to-end: ORC and JSON match the parquet result") {
    assert(upsertSequence("parquet") == expectedUpsert)
    assert(upsertSequence("orc") == expectedUpsert, "orc upsert diverged")
    assert(upsertSequence("json") == expectedUpsert, "json upsert diverged")
  }

  test("scd2Upsert format threads end-to-end: ORC history equals parquet history") {
    assert(scd2Sequence("parquet") == expectedScd2)
    assert(scd2Sequence("orc") == expectedScd2, "orc scd2 history diverged")
  }

  test("side-writes (quarantine) land in the merge format, not the default") {
    val path = tmpDir("graft_mergefmt_side") + "/data"
    // id=null violates required -> Split routes it to the reject sibling
    val mixed = Seq((Some(1L), "a"), (None, "broken")).toDF("id", "v")
    MergeIO.upsert(mixed, path, contract, Seq("id"), format = "orc",
      strategy = graft.strategies.SplitStrategy())
    assert(canonKv(spark.read.format("orc").load(path)) == Seq((1L, "a")))
    val reject = spark.read.format("orc").load(path + "_reject")
    assert(reject.count() == 1L, "reject sibling must be readable as orc")
  }

  private def deltaOnClasspath: Boolean =
    try { Class.forName("org.apache.spark.sql.delta.sources.DeltaDataSource"); true }
    catch { case _: ClassNotFoundException => false }

  test("delta profile: upsert + scd2Upsert parity on format(\"delta\")") {
    assume(deltaOnClasspath,
      "delta-spark not on the classpath (zero-egress build) — profile canceled; " +
        "with the jar present this runs the same parity assertions on delta")
    assert(upsertSequence("delta") == expectedUpsert, "delta upsert diverged")
    assert(scd2Sequence("delta") == expectedScd2, "delta scd2 history diverged")
  }
}
