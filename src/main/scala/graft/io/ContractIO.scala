package graft.io

import graft.align.ApplyContract
import graft.contracts.Contract
import graft.quality._
import graft.strategies._
import org.apache.spark.sql.{DataFrame, Observation, SparkSession}

/** Outcome of a governed read: the aligned frame plus its verdict. */
final case class ReadResult(df: DataFrame, validation: ValidationResult)

/** Outcome of a governed write: verdict + every path written. */
final case class WriteResult(validation: ValidationResult, writtenPaths: Seq[String], warnings: Seq[String])

/** Contract-governed IO — the Spark-native core of dc43's
  * `read_with_governance` / `write_with_governance`
  * (`spark/io/read.py`, `spark/io/write.py`, `spark/io/base.py:459-535`):
  * load → metrics (one pass) → evaluate → align; and on write
  * observe-the-input → evaluate → plan via a violation strategy → write.
  *
  * Scale notes (100 TB posture):
  *   - Observations are collected on the *input* frame, before alignment
  *     auto-casts can mask type mismatches (reference order,
  *     `spark/io/base.py:782,801`).
  *   - When the strategy does not gate on the verdict, metrics ride the
  *     primary write via `Dataset.observe` — zero extra scans, zero cache.
  *   - When it does (Split/Strict), or the contract carries unique/query
  *     rules (not expressible in observe), exactly one metrics pre-scan
  *     runs. Nothing is ever persisted: Split's valid/reject subsets are
  *     two pushed-down filter scans of the source, not a cached
  *     materialisation of the whole input.
  */
object ContractIO {

  private def metricsOf(df: DataFrame, specs: Seq[ExpectationSpec]): Map[String, Any] =
    if (specs.exists(s => s.rule == "query" && s.query.isDefined))
      Metrics.computeWithQueries(df, specs, df.sparkSession)
    else Metrics.compute(df, specs)

  def read(
      spark: SparkSession,
      path: String,
      contract: Contract,
      format: String = "parquet",
      options: Map[String, String] = Map.empty,
      autoCast: Boolean = true,
      collectMetrics: Boolean = true,
      enforce: Boolean = false,
      interceptors: Seq[GovernanceInterceptor] = Nil,
      statusPolicy: Option[ReadStatusPolicy] = None
  ): ReadResult = {
    statusPolicy.foreach(_.check(contract))
    val ctx = InterceptorContext("read", None, Some(path), Some(contract))
    interceptors.foreach(_.preRead(ctx))
    val raw = spark.read.format(format).options(options).load(path)
    val specs = Expectations.fromContract(contract)
    val metrics: Map[String, Any] =
      if (collectMetrics) metricsOf(raw, specs) else Map.empty
    val validation = Evaluator.evaluate(contract, SchemaSnapshot.of(raw).toMap, metrics)
    if (enforce && !validation.ok)
      throw new IllegalStateException(
        s"contract ${contract.id}:${contract.version} violated on read: ${validation.errors.mkString("; ")}")
    val aligned = ApplyContract.align(raw, contract, autoCast)
    ReadResult(interceptors.foldLeft(aligned)((df, i) => i.postRead(ctx, df)), validation)
  }

  /** Governed read resolving the contract from a store by version spec
    * (`None` = latest, `"==v"`/bare = exact, `">=v"` = highest satisfying)
    * — the reference's `contract_id` + `expected_contract_version` read
    * surface (`spark/io/validation.py:83-127`). */
  def readResolved(
      spark: SparkSession,
      path: String,
      store: graft.contracts.ContractStore,
      contractId: String,
      versionSpec: Option[String] = None,
      format: String = "parquet",
      options: Map[String, String] = Map.empty,
      autoCast: Boolean = true,
      collectMetrics: Boolean = true,
      enforce: Boolean = false,
      interceptors: Seq[GovernanceInterceptor] = Nil,
      statusPolicy: Option[ReadStatusPolicy] = None
  ): ReadResult = {
    val contract = graft.contracts.VersionPolicy.resolve(store, contractId, versionSpec)
    read(spark, path, contract, format, options, autoCast, collectMetrics,
      enforce, interceptors, statusPolicy)
  }

  def write(
      df: DataFrame,
      path: String,
      contract: Contract,
      format: String = "parquet",
      mode: String = "error",
      options: Map[String, String] = Map.empty,
      strategy: ViolationStrategy = NoOpStrategy,
      autoCast: Boolean = true,
      interceptors: Seq[GovernanceInterceptor] = Nil
  ): WriteResult = {
    val ctx = InterceptorContext("write", None, Some(path), Some(contract))
    val df0 = interceptors.foldLeft(df)((d, i) => i.preWrite(ctx, d))
    val specs = Expectations.fromContract(contract)
    val schema = SchemaSnapshot.of(df0).toMap
    // observe can't express count_distinct (unique) or custom SQL (query)
    val observable = !strategy.gatesOnVerdict &&
      !specs.exists(s => s.rule == "unique" || s.rule == "query")

    val written = Seq.newBuilder[String]
    val warnings = Seq.newBuilder[String]
    def execute(req: WriteRequest): Unit = {
      val target = req.pathSuffix.map(s => s"${path.stripSuffix("/")}/$s").getOrElse(path)
      req.df.write.format(format).options(options).mode(mode).save(target)
      written += target
      warnings ++= req.warnings
    }

    val validation =
      if (observable) {
        // metrics ride the primary write: one scan total
        val obs = Observation("graft_dq_" + java.util.UUID.randomUUID().toString.replace("-", ""))
        val exprs = Metrics.aggregateExprs(specs, df0.columns.toSet)
        val observed = df0.observe(obs, exprs.head, exprs.tail: _*)
        val aligned = ApplyContract.align(observed, contract, autoCast)
        val plan = strategy.plan(aligned, specs,
          ValidationResult(ok = true, Nil, Nil, Map.empty, schema))
        plan.primary.foreach(execute)
        plan.additional.foreach(execute)
        val metrics: Map[String, Any] = obs.get.map {
          case (k, v: Number) => k -> (v.longValue: Any)
          case (k, v)         => k -> v
        }
        Evaluator.evaluate(contract, schema, metrics)
      } else {
        // one metrics pre-scan on the input, then plan against the verdict
        val metrics = metricsOf(df0, specs)
        val v = Evaluator.evaluate(contract, schema, metrics)
        val aligned = ApplyContract.align(df0, contract, autoCast)
        val plan = strategy.plan(aligned, specs, v)
        // strict strategies abort before anything is written
        plan.failWith.foreach { msg =>
          throw new IllegalStateException(s"$msg: ${v.errors.mkString("; ")}")
        }
        plan.primary.foreach(execute)
        plan.additional.foreach(execute)
        v
      }
    val result = WriteResult(validation, written.result(), validation.warnings ++ warnings.result())
    interceptors.foreach(_.postWrite(ctx, result))
    result
  }
}
