package graft.contracts

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Contract store backed by a Spark-managed dataset (parquet path) — the
  * Spark-native analogue of the reference's Delta-table store
  * (`contracts/backend/stores/delta.py`): contracts live with the data, on
  * the same storage the cluster already reads, and every `put` is an
  * append of `(contract_id, version, body, written_at)`. Readers resolve
  * the newest `written_at` per (id, version), so re-putting a version
  * supersedes it without rewrites — the same event-log shape Delta gives,
  * expressed on plain parquet.
  */
final class SparkTableContractStore(spark: SparkSession, path: String) extends ContractStore {
  import spark.implicits._

  private def exists: Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    p.getFileSystem(spark.sparkContext.hadoopConfiguration).exists(p)
  }

  private def all = {
    val base = spark.read.parquet(path)
    // stores written before the tiebreak column existed lack `seq`
    val withSeq = if (base.columns.contains("seq")) base else base.withColumn("seq", lit(0L))
    withSeq
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("contract_id", "version")
          .orderBy(col("written_at").desc, col("seq").desc)))
      .filter(col("rn") === 1)
  }

  override def put(contract: Contract): Unit =
    // seq (per-JVM monotonic) breaks same-millisecond written_at ties so
    // supersession is deterministic under rapid re-puts
    Seq((contract.id, contract.version, ContractJson.toJson(contract),
        System.currentTimeMillis(), System.nanoTime()))
      .toDF("contract_id", "version", "body", "written_at", "seq")
      .coalesce(1).write.mode(SaveMode.Append).parquet(path)

  override def get(id: String, version: String): Option[Contract] =
    if (!exists) None
    else all.filter(col("contract_id") === id && col("version") === version)
      .select("body").as[String].collect().headOption.map(ContractJson.fromJson)

  override def listVersions(id: String): Seq[String] =
    if (!exists) Nil
    else all.filter(col("contract_id") === id)
      .select("version").as[String].collect().toSeq.sorted

  override def listContractIds(): Seq[String] =
    if (!exists) Nil
    else all.select("contract_id").distinct().as[String].collect().toSeq.sorted
}
