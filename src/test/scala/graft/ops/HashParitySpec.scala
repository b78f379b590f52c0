package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{BinaryType, LongType}

/** Pins the codegen'd `graft_md5hh` digest pair bit-identical to the
  * composable `conv(substr(md5(x), …), 16, 10)` spelling — the exact
  * expression the DuckDB oracles replicate. If this drifts, every
  * portable-hash gate (minhash/cluster) silently diverges from its
  * oracle. */
class HashModePortableParitySpec extends SparkSpec {
  import spark.implicits._

  private def composable(c: org.apache.spark.sql.Column) = {
    val digest = md5(c.cast(BinaryType))
    (conv(substring(digest, 1, 15), 16, 10).cast(LongType),
      conv(substring(digest, 17, 13), 16, 10).cast(LongType))
  }

  test("graft_md5hh equals the composable conv/substr/md5 spelling on corpus shingles") {
    val docs = graft.T.load(spark, "/root/testdata/sf0.001", "documents")
    val shingles = NearDup.explodedShingles(docs).select(col("shingle"))
    val (h1c, h2c) = composable(col("shingle"))
    val hh = call_function("graft_md5hh", col("shingle").cast(BinaryType))
    val mismatches = shingles
      .select(h1c.as("h1c"), h2c.as("h2c"),
        element_at(hh, 1).as("h1n"), element_at(hh, 2).as("h2n"))
      .filter(col("h1c") =!= col("h1n") || col("h2c") =!= col("h2n"))
      .count()
    assert(mismatches == 0)
    assert(shingles.count() > 1000) // the comparison actually covered data
  }

  test("parity holds on edge inputs: empty, unicode, separators, long strings") {
    val edge = Seq("", " ", "a", "a:b", "::", "naïve café 中文 🙂",
      "\n\t", "x" * 10000).toDF("s")
    val (h1c, h2c) = composable(col("s"))
    val hh = call_function("graft_md5hh", col("s").cast(BinaryType))
    val rows = edge.select(h1c, h2c, element_at(hh, 1), element_at(hh, 2))
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (a, b, c, d) => assert(a == c && b == d, s"($a,$b) vs ($c,$d)") }
    // 60/52-bit ranges: always non-negative, below the construction bounds
    rows.foreach { case (_, _, c, d) =>
      assert(c >= 0 && c < (1L << 60) && d >= 0 && d < (1L << 52))
    }
  }

  test("PortableComposable is bit-identical to Portable (hash, hashTuple, seeded family)") {
    val edge = Seq("", " ", "a", "a:b", "::", "naïve café 中文 🙂", "x" * 500).toDF("s")
    val p = HashMode.Portable
    val c = HashMode.PortableComposable
    val rows = edge.select(
        p.hash(col("s")).as("ph"), c.hash(col("s")).as("ch"),
        p.hashTuple(col("s"), lit("t")).as("pt"), c.hashTuple(col("s"), lit("t")).as("ct"))
      .as[(Long, Long, Long, Long)].collect()
    rows.foreach { case (ph, ch, pt, ct) => assert(ph == ch && pt == ct) }
    // the full seeded minhash family agrees too
    def sigs(mode: HashMode) = {
      val e = mode.minhashPrep(col("shingle")).foldLeft(
        NearDup.explodedShingles(
          graft.T.load(spark, "/root/testdata/sf0.001", "documents").limit(50))) {
        case (df, (n, cc)) => df.withColumn(n, cc)
      }
      e.groupBy(col("doc_id"))
        .agg(min(mode.seededHash(0)).as("s0"), min(mode.seededHash(7)).as("s7"))
    }
    assert(sigs(p).exceptAll(sigs(c)).isEmpty && sigs(c).exceptAll(sigs(p)).isEmpty)
  }

  test("minhash signatures are unchanged by the native digest path") {
    val docs = graft.T.load(spark, "/root/testdata/sf0.001", "documents")
    // signatures via the public path (native graft_md5hh inside)
    val sig = NearDup.minhashSignatures(docs, mode = HashMode.Portable)
    // independent recomputation from the composable spelling
    val (h1c, h2c) = composable(col("shingle"))
    val e = NearDup.explodedShingles(docs)
      .withColumn("_mh_h1", h1c).withColumn("_mh_h2", h2c)
    val sigs = (0 until NearDup.MinHashK)
      .map(i => min(col("_mh_h1") + lit(i.toLong) * col("_mh_h2")).as(s"mh$i"))
    val ref = e.groupBy(col("doc_id")).agg(first(col("nsh")).as("nsh"), sigs: _*)
    assert(sig.exceptAll(ref).isEmpty && ref.exceptAll(sig).isEmpty)
  }
}
