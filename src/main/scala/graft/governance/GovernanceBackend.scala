package graft.governance

import graft.contracts.{Contract, ContractJson, ContractStore}
import graft.draft.Drafter
import graft.quality.ValidationResult
import org.json4s._
import org.json4s.jackson.JsonMethods

/** One pipeline run's recorded read/write against a dataset version —
  * the reference's pipeline-activity record
  * (`governance/backend/local.py:832,1034-1055`). */
final case class PipelineActivity(
    pipeline: String,
    operation: String, // "read" | "write"
    datasetId: String,
    datasetVersion: String,
    contractId: String,
    contractVersion: String,
    recordedAt: Long,
    context: Map[String, String] = Map.empty)

/** One (dataset version, contract) entry of a dataset's version chain:
  * every pipeline touch of that combination plus its recorded verdict —
  * the reference's merged dataset-record view
  * (`governance/backend/local.py:630-830`). */
final case class DatasetRecord(
    datasetId: String,
    datasetVersion: String,
    contractId: String,
    contractVersion: String,
    status: Option[DatasetStatus],
    activity: Seq[PipelineActivity]) {
  /** Most recent touch/verdict time — the chain's ordering key. */
  def lastSeenAt: Long =
    (activity.map(_.recordedAt) ++ status.map(_.recordedAt)).maxOption.getOrElse(0L)
}

/** One stored metric observation — the reference's `dq_metrics` row shape
  * (`governance/backend/stores/_metrics.py:34-66`): the value as TEXT
  * (nothing is dropped for being non-numeric) plus a numeric hint when
  * the value resembles a number, which is what history charts filter on. */
final case class MetricObservation(
    datasetId: String,
    datasetVersion: String,
    key: String,
    valueText: String,
    valueNumeric: Option[Double],
    recordedAt: Long)

/** One dataset version's recorded governance verdict. */
final case class DatasetStatus(
    datasetId: String,
    datasetVersion: String,
    contractId: String,
    contractVersion: String,
    status: String, // "ok" | "warn" | "block"
    errors: Seq[String],
    warnings: Seq[String],
    metrics: Map[String, Double],
    recordedAt: Long)

/** Local governance coordinator — the data-relevant core of the
  * reference's `LocalGovernanceServiceBackend`
  * (`governance/backend/local.py:129`): persist per-(dataset, version)
  * validation outcomes, maintain dataset↔contract links, answer status
  * queries, and propose draft contracts from violation feedback. All
  * records are driver-side metadata (verdicts and links, never data).
  *
  * Persistence is pluggable (the reference's store seam,
  * `governance/backend/stores/`): [[FsGovernanceStore]] by default (the
  * string constructors), [[JdbcGovernanceStore]] for SQL,
  * [[SparkTableGovernanceStore]]/[[DeltaGovernanceStore]] for
  * table-backed deployments — matching the contract side's
  * Fs/JDBC/Spark-table/Delta store family. */
final class GovernanceBackend(store: GovernanceStore, contracts: Option[ContractStore])
    extends GovernanceService {

  def this(rootDir: String, contracts: Option[ContractStore]) =
    this(new FsGovernanceStore(rootDir), contracts)
  def this(rootDir: String) = this(rootDir, None)
  def this(store: GovernanceStore) = this(store, None)

  /** ok (clean) / warn (warnings only) / block (errors) — delegates to
    * the canonical [[ValidationResult.recordStatus]]. */
  def statusOf(validation: ValidationResult): String = validation.recordStatus

  /** Record a validation outcome; when feedback exists and a contract
    * store is attached, a draft revision is proposed into it
    * (reference `propose_draft`, `local.py:378`). Returns the status. */
  def recordValidation(
      datasetId: String,
      datasetVersion: String,
      contract: Contract,
      validation: ValidationResult,
      proposeDraftOnFeedback: Boolean = true,
      draftContext: Map[String, String] = Map.empty
  ): DatasetStatus = {
    val record = DatasetStatus(datasetId, datasetVersion, contract.id, contract.version,
      statusOf(validation), validation.errors, validation.warnings,
      validation.metrics.collect { case (k, v: Number) => k -> v.doubleValue },
      System.currentTimeMillis())
    // every metric survives as text with a numeric hint (the reference's
    // normalise_metric_value, `stores/_metrics.py:34`): numeric-only
    // storage would silently drop observation payloads like the
    // observed.enum_* value lists
    val metricsRaw = validation.metrics.toList.sortBy(_._1).map { case (k, v) =>
      val (text, num) = GovernanceBackend.normaliseMetricValue(v)
      k -> (JObject(
        "text" -> JString(text),
        "numeric" -> num.map(JDouble(_): JValue).getOrElse(JNull)): JValue)
    }
    val json = JObject(
      "datasetId" -> JString(record.datasetId),
      "datasetVersion" -> JString(record.datasetVersion),
      "contractId" -> JString(record.contractId),
      "contractVersion" -> JString(record.contractVersion),
      "status" -> JString(record.status),
      "errors" -> JArray(record.errors.toList.map(JString(_))),
      "warnings" -> JArray(record.warnings.toList.map(JString(_))),
      "metrics" -> JObject(record.metrics.toList.map { case (k, v) => k -> (JDouble(v): JValue) }),
      "metricsRaw" -> JObject(metricsRaw),
      // the OBSERVED schema snapshot rides along (additive — older
      // records simply lack the key): it is what lets the UI's
      // validate/preview action re-evaluate this dataset version against
      // a DIFFERENT contract revision later, schema checks included
      "schemaRaw" -> JObject(validation.schema.toList.sortBy(_._1).map {
        case (k, fs) => k -> (JObject(
          "backendType" -> JString(fs.backendType),
          "odcsType" -> JString(fs.odcsType),
          "nullable" -> JBool(fs.nullable)): JValue)
      }),
      "recordedAt" -> JLong(record.recordedAt))
    store.putStatus(datasetId, datasetVersion,
      JsonMethods.pretty(JsonMethods.render(json)))
    if (proposeDraftOnFeedback)
      // caller-supplied draft context (pipeline name, run id, ...) rides
      // along with the provenance pair — the reference's draft_context
      for (store <- contracts; draft <- Drafter.fromValidation(validation, contract,
             draftContext = draftContext ++
               Map("dataset_id" -> datasetId, "dataset_version" -> datasetVersion)))
        putDraftDeduped(store, draft)
    record
  }

  /** Store a draft without clobbering a DIFFERENT draft already parked at
    * the same version. The deterministic draft suffix makes byte-identical
    * retries converge on one stored draft, but two runs with the same
    * (dataset id, dataset version, context) and different validation
    * outcomes would otherwise silently overwrite a draft possibly under
    * review. A differing payload takes the next free `.N` slot — the same
    * counter discipline as `DataProductBackend.nextDraftVersion`. */
  private def putDraftDeduped(store: ContractStore, draft: Contract): Unit = {
    val taken = store.listVersions(draft.id).toSet
    val slot = Iterator.from(1)
      .map(i => if (i == 1) draft.version else s"${draft.version}.$i")
      .find { v =>
        !taken(v) || store.get(draft.id, v).exists(c =>
          ContractJson.toJson(c) == ContractJson.toJson(draft.copy(version = v)))
      }.get
    if (!taken(slot)) store.put(draft.copy(version = slot))
  }

  private def parseStatus(json: String): Option[DatasetStatus] =
    parseStatusJson(JsonMethods.parse(json))

  private def parseStatusJson(parsed: JValue): Option[DatasetStatus] = {
    val fields = parsed match {
      case JObject(fs) => fs.toMap
      case _ => Map.empty[String, JValue]
    }
    if (fields.isEmpty) None
    else {
      def str(k: String) = fields.get(k).collect { case JString(v) => v }.getOrElse("")
      def strs(k: String) = fields.get(k) match {
        case Some(JArray(vs)) => vs.collect { case JString(v) => v }
        case _ => Nil
      }
      val metrics = fields.get("metrics") match {
        case Some(JObject(ms)) => ms.collect {
          case (k, JDouble(v)) => k -> v
          case (k, JInt(v)) => k -> v.toDouble
        }.toMap
        case _ => Map.empty[String, Double]
      }
      val at = fields.get("recordedAt") match {
        case Some(JLong(v)) => v
        case Some(JInt(v)) => v.toLong
        case _ => 0L
      }
      Some(DatasetStatus(str("datasetId"), str("datasetVersion"), str("contractId"),
        str("contractVersion"), str("status"), strs("errors"), strs("warnings"), metrics, at))
    }
  }

  /** The last recorded OBSERVATIONS for a dataset version — the schema
    * snapshot and the metric payload a governed run shipped — in the
    * exact shape [[graft.quality.Evaluator.evaluate]] consumes, so they
    * re-evaluate against ANY contract revision (the UI validate/preview
    * action: "would this dataset, as last observed, pass that draft?").
    * Metrics prefer the numeric hint and fall back to the stored text
    * (nothing recorded is dropped). Records predating schema
    * persistence return an EMPTY schema map — callers surface that
    * rather than fabricating a snapshot. `None` when the version has no
    * recorded observations at all. */
  def observedSnapshot(datasetId: String, datasetVersion: String)
      : Option[(Map[String, graft.quality.FieldSnapshot], Map[String, Any])] =
    store.statusesFor(datasetId).flatMap { doc =>
      val parsed = JsonMethods.parse(doc)
      parseStatusJson(parsed).filter(st => st.datasetId == datasetId &&
        st.datasetVersion == datasetVersion).map { st =>
        val fields = parsed match {
          case JObject(fs) => fs.toMap
          case _ => Map.empty[String, JValue]
        }
        val schema = fields.get("schemaRaw") match {
          case Some(JObject(cols)) => cols.collect { case (name, JObject(p)) =>
            val m = p.toMap
            def str(k: String) = m.get(k).collect { case JString(v) => v }.getOrElse("")
            name -> graft.quality.FieldSnapshot(str("backendType"), str("odcsType"),
              m.get("nullable").collect { case JBool(b) => b }.getOrElse(true))
          }.toMap
          case _ => Map.empty[String, graft.quality.FieldSnapshot]
        }
        val metrics: Map[String, Any] = fields.get("metricsRaw") match {
          case Some(JObject(ms)) => ms.collect { case (k, JObject(payload)) =>
            val p = payload.toMap
            val num = p.get("numeric").collect {
              case JDouble(v) => v
              case JInt(v) => v.toDouble
            }
            k -> num.map(v => v: Any).getOrElse(
              p.get("text").collect { case JString(v) => v }.getOrElse(""): Any)
          }.toMap
          case _ => st.metrics
        }
        (schema, metrics, st.recordedAt)
      }
    }.sortBy(-_._3).headOption.map(t => (t._1, t._2))

  def getStatus(datasetId: String, datasetVersion: String): Option[DatasetStatus] =
    store.getStatus(datasetId, datasetVersion).flatMap(parseStatus)

  /** Post-link hooks `(datasetId, datasetVersion, contractId,
    * contractVersion)` — the reference's `DatasetContractLinkHook` seam
    * (`governance/hooks.py`) through which [[CatalogLinker]] attaches.
    * Hooks run AFTER the link persists; a throwing hook does not undo
    * the link (the shipped [[CatalogLinker]] never throws — every
    * failure path warns). */
  private val linkHooks =
    scala.collection.mutable.ArrayBuffer.empty[(String, String, String, String) => Unit]

  def addLinkHook(hook: (String, String, String, String) => Unit): this.type = {
    linkHooks += hook; this
  }

  def linkDatasetContract(datasetId: String, contractId: String, contractVersion: String,
                          datasetVersion: String = ""): Unit = {
    store.putLink(datasetId, contractId, contractVersion)
    linkHooks.foreach(_(datasetId, datasetVersion, contractId, contractVersion))
  }

  def linkedContract(datasetId: String): Option[(String, String)] =
    store.getLink(datasetId)

  /** Append one pipeline-activity record (reference
    * `register_read_activity`/`register_write_activity`,
    * `local.py:1034-1055`): which pipeline touched which dataset version
    * under which contract. One JSON line per run, per-dataset log file. */
  def recordActivity(
      pipeline: String,
      operation: String,
      datasetId: String,
      datasetVersion: String,
      contract: Contract,
      context: Map[String, String] = Map.empty): PipelineActivity = {
    val rec = PipelineActivity(pipeline, operation, datasetId, datasetVersion,
      contract.id, contract.version, System.currentTimeMillis(), context)
    val json = JsonMethods.compact(JsonMethods.render(JObject(
      "pipeline" -> JString(rec.pipeline),
      "operation" -> JString(rec.operation),
      "datasetId" -> JString(rec.datasetId),
      "datasetVersion" -> JString(rec.datasetVersion),
      "contractId" -> JString(rec.contractId),
      "contractVersion" -> JString(rec.contractVersion),
      "recordedAt" -> JLong(rec.recordedAt),
      "context" -> JObject(rec.context.toList.sortBy(_._1).map {
        case (k, v) => k -> (JString(v): JValue)
      }))))
    store.appendActivity(datasetId, json)
    rec
  }

  /** Activity log of a dataset (optionally one version), each record
    * joined to its validation status when available — the reference's
    * `get_pipeline_activity(include_status = true)` (`local.py:832`). */
  def pipelineActivity(
      datasetId: String,
      datasetVersion: Option[String] = None
  ): Seq[(PipelineActivity, Option[DatasetStatus])] =
    store.activityLines(datasetId).flatMap { line =>
      parseActivityLine(line).flatMap { rec =>
        // the payload id is authoritative — a store that can only key by
        // sanitised filename over-returns collided ids' records here
        if (rec.datasetId == datasetId && datasetVersion.forall(_ == rec.datasetVersion))
          Some(rec -> getStatus(rec.datasetId, rec.datasetVersion))
        else None
      }
    }

  // a torn line (concurrent cross-process appends are not atomic) must
  // not poison the whole log — skip anything that doesn't parse to an
  // activity object
  private def parseActivityLine(line: String): Option[PipelineActivity] =
    scala.util.Try(JsonMethods.parse(line)).toOption.collect {
      case JObject(fs) if fs.nonEmpty => fs.toMap
    }.map { fields =>
      def str(k: String) = fields.get(k).collect { case JString(v) => v }.getOrElse("")
      val at = fields.get("recordedAt") match {
        case Some(JLong(v)) => v
        case Some(JInt(v)) => v.toLong
        case _ => 0L
      }
      val ctx = fields.get("context") match {
        case Some(JObject(cs)) => cs.collect { case (k, JString(v)) => k -> v }.toMap
        case _ => Map.empty[String, String]
      }
      PipelineActivity(str("pipeline"), str("operation"), str("datasetId"),
        str("datasetVersion"), str("contractId"), str("contractVersion"), at, ctx)
    }

  /** Draft lifecycle (reference `review_validation_outcome`/draft
    * handling, `local.py:333-409`): drafts proposed into the attached
    * store carry status "draft"; a review either promotes the draft to
    * "active" or marks it "rejected", re-putting it so the store's
    * latest-wins log records the transition. */
  // same case-insensitive draft test GovernedIO's serving gate uses — a
  // "Draft"-status contract must not be excluded from serving yet
  // invisible to the review lifecycle
  private def isDraft(c: Contract): Boolean =
    c.status.map(_.toLowerCase).contains("draft")

  def listDrafts(contractId: String): Seq[Contract] =
    contracts.toSeq.flatMap { store =>
      store.listVersions(contractId)
        .flatMap(v => store.get(contractId, v))
        .filter(isDraft)
    }

  override def listDraftVersions(contractId: String): Seq[String] =
    listDrafts(contractId).map(_.version)

  override def record(datasetId: String, datasetVersion: String, contract: Contract,
                      validation: ValidationResult): DatasetStatus =
    recordValidation(datasetId, datasetVersion, contract, validation)

  /** The [[GovernanceService]] observation round trip, in-process: the
    * same evaluate → record → report-drafts sequence the HTTP facade's
    * `/governance/evaluate` route performs (it delegates here), so local
    * and remote pipelines see identical semantics. */
  override def evaluateAndRecord(datasetId: String, datasetVersion: String,
                                 contract: Contract,
                                 schema: Map[String, graft.quality.FieldSnapshot],
                                 metrics: Map[String, Any]): GovernanceEvaluation = {
    val res = graft.quality.Evaluator.evaluate(contract, schema, metrics)
    val record = recordValidation(datasetId, datasetVersion, contract, res)
    GovernanceEvaluation(record, res.ok, listDraftVersions(contract.id))
  }

  // reviewDraft/updateDraft are check-then-act over the store and the
  // HTTP facade serves them from a thread pool: without mutual
  // exclusion an edit racing an approval could re-draft (and rewrite)
  // an already-approved revision — the exact bypass the status pinning
  // prevents. Synchronized on this backend; concurrent writers in
  // OTHER processes sharing a filesystem store remain the deployment's
  // problem (single-writer per store, the reference's posture too).
  def reviewDraft(contractId: String, version: String, approve: Boolean): Contract =
    synchronized {
      val (store, draft) = requireDraft(contractId, version)
      val reviewed = draft.copy(status = Some(if (approve) "active" else "rejected"))
      store.put(reviewed)
      reviewed
    }

  override def updateDraft(contractId: String, version: String,
                           edited: Contract): Contract = synchronized {
    val (store, _) = requireDraft(contractId, version)
    // the edit can change anything EXCEPT where it lives and what it
    // is: id/version pin to the addressed draft (an edit must not mint
    // or move a revision) and status stays draft (approval is
    // reviewDraft's job — an edit that smuggled status="active" in its
    // body would bypass review)
    val pinned = edited.copy(id = contractId, version = version,
      status = Some("draft"))
    store.put(pinned)
    pinned
  }

  /** Shared draft-addressing guard for [[reviewDraft]]/[[updateDraft]]:
    * a store must be attached, the revision must exist, and it must
    * still BE a draft. */
  private def requireDraft(contractId: String,
                           version: String): (graft.contracts.ContractStore, Contract) = {
    val store = contracts.getOrElse(
      throw new IllegalStateException("no contract store attached to governance backend"))
    val draft = store.get(contractId, version).getOrElse(
      throw new IllegalArgumentException(s"draft $contractId:$version not found"))
    if (!isDraft(draft))
      throw new IllegalArgumentException(
        s"$contractId:$version has status ${draft.status.getOrElse("none")}, not draft")
    (store, draft)
  }

  /** Every dataset id with any status, activity, or link record — the
    * reference's `list_datasets` (`local.py:627`). Authoritative ids live
    * inside each payload (filenames are sanitised). */
  def listDatasets(): Seq[String] = {
    val fromStatus = statusMatrix().map(_.datasetId)
    // links: ids recoverable from payloads only (the filesystem store's
    // pre-r4 one-line files carry none — such datasets appear here only
    // once they also have a status or activity record)
    val fromLinks = store.linkedDatasetIds()
    // scan EVERY activity line: a malformed line must not hide the ids
    // recorded after it, and filesystem stores collide sanitised names
    val fromActivity = store.allActivityLines()
      .flatMap(parseActivityLine).map(_.datasetId).filter(_.nonEmpty)
    (fromStatus ++ fromLinks ++ fromActivity).distinct.sorted
  }

  /** Per-dataset version chains — the reference's merged dataset-record
    * view (`get_dataset_records`, `local.py:630`): one record per
    * (dataset version, contract id, contract version) combination seen in
    * the activity log or the status store, each carrying its pipeline
    * touches and verdict, newest-first. With no filters, chains for every
    * known dataset. */
  def datasetRecords(
      datasetId: Option[String] = None,
      datasetVersion: Option[String] = None
  ): Seq[DatasetRecord] = {
    val ids = datasetId.map(Seq(_)).getOrElse(listDatasets())
    val matrix = statusMatrix() // one store read, shared across the chains
    ids.flatMap { id =>
      val acts = pipelineActivity(id, datasetVersion).map(_._1)
      val statuses = matrix
        .filter(s => s.datasetId == id && datasetVersion.forall(_ == s.datasetVersion))
      val keys =
        acts.map(a => (a.datasetVersion, a.contractId, a.contractVersion)) ++
          statuses.map(s => (s.datasetVersion, s.contractId, s.contractVersion))
      keys.distinct.map { case (dv, cid, cver) =>
        DatasetRecord(id, dv, cid, cver,
          status = statuses.find(s =>
            s.datasetVersion == dv && s.contractId == cid && s.contractVersion == cver),
          activity = acts.filter(a =>
            a.datasetVersion == dv && a.contractId == cid && a.contractVersion == cver))
      }
    }.sortBy(-_.lastSeenAt)
  }

  /** All recorded (dataset, version) statuses — the status-matrix view
    * (authoritative ids live inside each payload, filenames are
    * sanitised). */
  def statusMatrix(): Seq[DatasetStatus] =
    store.listStatuses().flatMap(parseStatus)

  /** Per-dataset metric history — the reference's `dq_metrics` charting
    * surface: one [[MetricObservation]] per (version, metric), text value
    * always present, numeric hint when the value resembles a number.
    * Records written before the `metricsRaw` payload existed fall back to
    * their numeric metrics map. Ordered (recordedAt, version, key). */
  def metricHistory(datasetId: String): Seq[MetricObservation] = {
    // statusesFor may over-return (the filesystem store prefix-prunes
    // sanitised filenames); the payload check below arbitrates collisions
    store.statusesFor(datasetId).flatMap { doc =>
      val parsed = JsonMethods.parse(doc)
      parseStatusJson(parsed).filter(_.datasetId == datasetId).toSeq.flatMap { st =>
        val fields = parsed match {
          case JObject(fs) => fs.toMap
          case _ => Map.empty[String, JValue]
        }
        fields.get("metricsRaw") match {
          case Some(JObject(ms)) => ms.collect { case (k, JObject(payload)) =>
            val p = payload.toMap
            MetricObservation(st.datasetId, st.datasetVersion, k,
              p.get("text").collect { case JString(v) => v }.getOrElse(""),
              p.get("numeric").collect {
                case JDouble(v) => v
                case JInt(v) => v.toDouble
              },
              st.recordedAt)
          }
          case _ => st.metrics.toSeq.map { case (k, v) =>
            MetricObservation(st.datasetId, st.datasetVersion, k,
              GovernanceBackend.normaliseMetricValue(v)._1, Some(v), st.recordedAt)
          }
        }
      }
    }.sortBy(o => (o.recordedAt, o.datasetVersion, o.key))
  }
}

object GovernanceBackend {
  /** Storage-friendly (text, numeric hint) for a metric value — the
    * reference's `normalise_metric_value` (`stores/_metrics.py:34-66`):
    * numbers keep a float twin, numeric-looking strings are coerced,
    * collections serialise as a JSON array (the reference json.dumps's
    * non-scalars; a `List(x, y)` toString would be unparseable the moment
    * a value contains a comma), everything else is text-only. */
  def normaliseMetricValue(value: Any): (String, Option[Double]) = value match {
    case null => ("", None)
    case n: Number => (String.valueOf(n), Some(n.doubleValue))
    case s: String =>
      (s, Option(s.trim).filter(_.nonEmpty).flatMap(_.toDoubleOption))
    case vs: Iterable[_] =>
      (JsonMethods.compact(JsonMethods.render(
        JArray(vs.toList.map(v => JString(String.valueOf(v)))))), None)
    case other => (String.valueOf(other), None)
  }
}
