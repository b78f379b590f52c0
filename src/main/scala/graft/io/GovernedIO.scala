package graft.io

import graft.contracts.{Contract, ContractStore}
import graft.strategies.{NoOpStrategy, ViolationStrategy}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Dataset-id-level governed IO: contract resolution (store) + location
  * resolution (locator) + validated read/write — the top of the
  * reference's pipeline API (`spark/io/read.py:241`, `write.py:107`),
  * where callers speak dataset ids, not paths.
  *
  * {{{
  * val gov = GovernedIO(store, ContractVersionLocator(spark, "/lake"))
  * val ReadResult(df, v) = gov.read(spark, "sales.orders")
  * gov.write(df2, "sales.orders", strategy = SplitStrategy())
  * }}}
  */
final case class GovernedIO(
    store: ContractStore,
    locator: DatasetLocator,
    products: Option[graft.products.DataProductService] = None,
    governance: Option[graft.governance.GovernanceService] = None,
    // publication seam: every governed write records its metric set +
    // verdict here — select the sink from deployment config via
    // PublicationMode.resolve(...).sink(...) (legacy structured log /
    // OpenLineage events / OTel spans), the reference's
    // publication-mode switch applied to batch IO exactly as
    // ContractStream applies it per micro-batch
    sink: graft.obs.ObservationSink = graft.obs.LogObservationSink) {

  /** Whether the recorded status of (datasetId, datasetVersion) blocks
    * consumption — the reference's dq-status gate on reads. */
  def assertReadable(datasetId: String, datasetVersion: String): Unit =
    for (g <- governance; st <- g.getStatus(datasetId, datasetVersion)
         if st.status == "block")
      throw new IllegalStateException(
        s"dataset $datasetId@$datasetVersion is blocked by governance: " +
          st.errors.mkString("; "))

  /** Read through a data product's input port: the product revision is
    * resolved under the status/version policy ([[graft.products
    * .ProductPolicy.select]] — pinned / `>=` / latest, disallowed-status
    * revisions skipped or warned per `enforce`), then the port binding
    * names the contract (and pins its version) and the locator resolves
    * the data — reference `read_with_governance` input-binding resolution
    * plus the `_select_data_product` orchestration of
    * `io/validation.py:261-533`. */
  def readPort(
      spark: SparkSession,
      productId: String,
      portName: String,
      enforce: Boolean = false,
      productVersion: Option[String] = None,
      productStatusPolicy: graft.products.ProductStatusPolicy =
        graft.products.ProductStatusPolicy()
  ): ReadResult = {
    val backend = products.getOrElse(
      throw new IllegalStateException("GovernedIO has no data-product service configured"))
    val product = graft.products.ProductPolicy.select(
      backend, productId, productVersion, productStatusPolicy, enforce,
      operation = "read")
      .getOrElse(throw new IllegalArgumentException(
        s"no revision of data product $productId is readable" +
          productVersion.fold("")(v => s" under version spec '$v'")))
    val port = product.findInputPort(portName)
      .getOrElse(throw new IllegalArgumentException(
        s"data product $productId has no input port '$portName'"))
    read(spark, port.contractId, contractVersion = Some(port.version).filter(_.nonEmpty),
      enforce = enforce)
  }

  /** Governed write that registers (or refreshes) the product's output
    * port binding to the contract version written — reference
    * `write_with_governance` output-binding registration. */
  def writePort(
      df: DataFrame,
      productId: String,
      portName: String,
      datasetId: String,
      mode: String = "overwrite",
      strategy: ViolationStrategy = NoOpStrategy,
      productStatusPolicy: Option[graft.products.ProductStatusPolicy] = None,
      enforce: Boolean = false
  ): WriteResult = {
    val backend = products.getOrElse(
      throw new IllegalStateException("GovernedIO has no data-product service configured"))
    // optional write-side status gate (reference applies the same handler
    // on both operations); opt-in because port registration itself evolves
    // the product to a new draft revision
    for (policy <- productStatusPolicy; p <- backend.latest(productId))
      policy.validate(p, enforce, operation = "write")
    val contract = contractFor(datasetId)
    val result = write(df, datasetId, mode = mode, strategy = strategy)
    backend.registerOutputPort(productId,
      graft.products.OutputPort(portName, contract.version, contract.id))
    result
  }

  /** Resolve the contract for a dataset id: pinned version, else the
    * SemVer-latest *released* contract — draft revisions (including
    * governance-proposed ones) never serve consumers implicitly. Falls
    * back to the absolute latest only when every version is a draft.
    * Delegates to [[GovernedIO.resolveContract]] (shared with the
    * facade's `/governance/read/resolve` plan routes). */
  def contractFor(datasetId: String, version: Option[String] = None): Contract =
    GovernedIO.resolveContract(store, datasetId, version)

  def read(
      spark: SparkSession,
      datasetId: String,
      contractVersion: Option[String] = None,
      datasetVersion: Option[String] = None,
      enforce: Boolean = false
  ): ReadResult = {
    val contract = contractFor(datasetId, contractVersion)
    val res = locator.forRead(datasetId, Some(contract), datasetVersion)
    val path = res.path.getOrElse(throw new IllegalArgumentException(
      s"locator resolved no path for dataset $datasetId"))
    assertReadable(datasetId, datasetVersion.getOrElse(contract.version))
    ContractIO.read(spark, path, contract,
      format = res.format.getOrElse("parquet"), options = res.options, enforce = enforce)
  }

  def write(
      df: DataFrame,
      datasetId: String,
      contractVersion: Option[String] = None,
      datasetVersion: Option[String] = None,
      mode: String = "overwrite",
      strategy: ViolationStrategy = NoOpStrategy
  ): WriteResult = {
    val contract = contractFor(datasetId, contractVersion)
    val res = locator.forWrite(datasetId, Some(contract), datasetVersion)
    val path = res.path.getOrElse(throw new IllegalArgumentException(
      s"locator resolved no path for dataset $datasetId"))
    val result = ContractIO.write(df, path, contract,
      format = res.format.getOrElse("parquet"), mode = mode,
      options = res.options, strategy = strategy)
    // record the verdict + link for downstream status gating / drafting
    governance.foreach { g =>
      g.record(datasetId, datasetVersion.getOrElse(contract.version),
        contract, result.validation)
      g.linkDatasetContract(datasetId, contract.id, contract.version,
        datasetVersion.getOrElse(contract.version))
    }
    // publish the observation through the configured sink (batch writes
    // carry no micro-batch id — the streaming path supplies one)
    sink.record(datasetId, None, result.validation.metrics, result.validation)
    result
  }
}

object GovernedIO {

  /** The ONE contract-resolution rule ([[GovernedIO.contractFor]]'s
    * body, shared with the facade's plan-resolution routes so local and
    * remote resolution can never drift): pinned version (`==v` or bare)
    * is exact, `>=v` picks the highest satisfying NON-DRAFT version, no
    * version picks the SemVer-latest released revision — drafts
    * (including governance-proposed ones) never serve consumers
    * implicitly; absolute-latest only when every revision is a draft. */
  def resolveContract(store: ContractStore, datasetId: String,
                      version: Option[String] = None): Contract = {
    def latestReleased: Option[Contract] = {
      val byVersion = store.listVersions(datasetId)
        .flatMap(v => graft.contracts.SemVer.tryParse(v).map(_ -> v))
        .sortBy(_._1).reverse.map(_._2)
      byVersion.iterator.flatMap(v => store.get(datasetId, v))
        .find(!_.status.map(_.toLowerCase).contains("draft"))
        .orElse(store.latest(datasetId))
    }
    def isDraft(c: Contract): Boolean = c.status.map(_.toLowerCase).contains("draft")
    version.map(_.trim).filter(_.nonEmpty) match {
      // `>=v` specs (reference input-binding pins, `io/validation.py:214`)
      // pick the HIGHEST satisfying NON-DRAFT version: governance
      // auto-drafts land in the same store, and an unreviewed draft must
      // never serve a pinned consumer implicitly
      case Some(v) if v.startsWith(">=") =>
        val candidates = store.listVersions(datasetId)
          .filter(ver => graft.contracts.SemVer.tryParse(ver).isDefined &&
            graft.contracts.VersionPolicy.satisfies(ver, v))
          .flatMap(ver => graft.contracts.SemVer.tryParse(ver).map(_ -> ver))
          .sortBy(_._1).reverse.map(_._2)
        candidates.iterator.flatMap(ver => store.get(datasetId, ver))
          .find(!isDraft(_))
          .getOrElse(throw new IllegalArgumentException(
            s"no released versions of $datasetId satisfy $v (have: ${store.listVersions(datasetId).mkString(", ")})"))
      // `==v` and bare versions are BOTH exact pins: a missing pinned
      // version is an error, never a silent fallback to some other
      // version's schema
      case Some(v) =>
        graft.contracts.VersionPolicy.resolve(store, datasetId, Some(v))
      case None =>
        latestReleased.getOrElse(throw new IllegalArgumentException(
          s"no contract for dataset $datasetId"))
    }
  }
}
