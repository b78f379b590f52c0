package graft.io

import graft.align.ApplyContract
import graft.contracts.Contract
import graft.quality._
import graft.strategies._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Outcome of a governed read: the aligned frame plus its verdict. */
final case class ReadResult(df: DataFrame, validation: ValidationResult)

/** Outcome of a governed write: verdict + every path written. */
final case class WriteResult(validation: ValidationResult, writtenPaths: Seq[String], warnings: Seq[String])

/** Contract-governed IO — the Spark-native core of dc43's
  * `read_with_governance` / `write_with_governance`
  * (`spark/io/read.py`, `spark/io/write.py`, `spark/io/base.py:459-535`):
  * load → observe (one-pass metrics) → evaluate → align, and on write
  * validate → plan via a violation strategy → execute the plan.
  *
  * Scale notes: metrics are a single aggregation pass (see [[Metrics]]);
  * alignment is a projection so column pruning reaches the scan; the Split
  * strategy caches the aligned frame so valid/reject subsets don't re-read
  * the source.
  */
object ContractIO {

  def read(
      spark: SparkSession,
      path: String,
      contract: Contract,
      format: String = "parquet",
      options: Map[String, String] = Map.empty,
      autoCast: Boolean = true,
      collectMetrics: Boolean = true,
      enforce: Boolean = false
  ): ReadResult = {
    val raw = spark.read.format(format).options(options).load(path)
    val specs = Expectations.fromContract(contract)
    val metrics: Map[String, Any] =
      if (collectMetrics) Metrics.compute(raw, specs) else Map.empty
    val validation = Evaluator.evaluate(contract, SchemaSnapshot.of(raw).toMap, metrics)
    if (enforce && !validation.ok)
      throw new IllegalStateException(
        s"contract ${contract.id}:${contract.version} violated on read: ${validation.errors.mkString("; ")}")
    ReadResult(ApplyContract.align(raw, contract, autoCast), validation)
  }

  def write(
      df: DataFrame,
      path: String,
      contract: Contract,
      format: String = "parquet",
      mode: String = "error",
      options: Map[String, String] = Map.empty,
      strategy: ViolationStrategy = NoOpStrategy,
      autoCast: Boolean = true
  ): WriteResult = {
    val aligned = ApplyContract.align(df, contract, autoCast)
    val specs = Expectations.fromContract(contract)
    // cache: metrics pass + up to two strategy subsets reuse one materialisation
    aligned.persist()
    try {
      val metrics: Map[String, Any] = Metrics.compute(aligned, specs)
      val validation = Evaluator.evaluate(contract, SchemaSnapshot.of(aligned).toMap, metrics)
      val plan = strategy.plan(aligned, specs, validation)
      val written = Seq.newBuilder[String]
      val warnings = Seq.newBuilder[String]
      def execute(req: WriteRequest): Unit = {
        val target = req.pathSuffix.map(s => s"${path.stripSuffix("/")}/$s").getOrElse(path)
        req.df.write.format(format).options(options).mode(mode).save(target)
        written += target
        warnings ++= req.warnings
      }
      plan.primary.foreach(execute)
      plan.additional.foreach(execute)
      plan.failWith.foreach { msg =>
        throw new IllegalStateException(s"$msg: ${validation.errors.mkString("; ")}")
      }
      WriteResult(validation, written.result(), validation.warnings ++ warnings.result())
    } finally aligned.unpersist()
  }
}
