package graft.service

import graft.contracts.{Contract, ContractJson}
import graft.governance.{DatasetStatus, GovernanceEvaluation, GovernanceService, MetricObservation}
import graft.products._
import graft.quality.FieldSnapshot
import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Shared JDK-http plumbing for the facade's remote clients — the
  * transport half of the reference's `dc43-service-clients` package
  * (`.../governance/transport.py:1-536`): base URL, bearer header,
  * query-parameter ids, loud transport errors.
  *
  * STRICT by default: every non-2xx answer — including 404 — throws.
  * Only the `*Opt` lookup variants treat 404 as a domain answer
  * ("absent"), because on every other route a 404 means the route
  * itself is missing (wrong base URL, facade started without that
  * family) and swallowing it would turn a mutation into a silent
  * no-op or parse an error body as a result. */
private[service] abstract class FacadeClient(baseUrl: String,
                                             timeout: Duration,
                                             bearerToken: Option[String]) {

  protected val base: String = baseUrl.stripSuffix("/")
  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  protected def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  private def withAuth(b: HttpRequest.Builder): HttpRequest.Builder =
    bearerToken.fold(b)(t => b.header("Authorization", s"Bearer $t"))

  private def fail(r: HttpResponse[String]): Nothing =
    throw new java.io.IOException(
      s"service ${r.uri()} answered HTTP ${r.statusCode()}: ${r.body()}")

  private def send(req: HttpRequest): HttpResponse[String] =
    client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))

  private def getRaw(pathAndQuery: String): HttpResponse[String] =
    send(withAuth(HttpRequest.newBuilder(URI.create(base + pathAndQuery))
      .timeout(timeout)).GET().build())

  private def postRaw(pathAndQuery: String, body: String): HttpResponse[String] =
    send(withAuth(HttpRequest.newBuilder(URI.create(base + pathAndQuery))
      .timeout(timeout)
      .header("Content-Type", "application/json; charset=utf-8"))
      .POST(HttpRequest.BodyPublishers.ofString(body)).build())

  /** GET that must succeed — any non-2xx (404 included) is loud. */
  protected def get(pathAndQuery: String): String = {
    val r = getRaw(pathAndQuery)
    if (r.statusCode() / 100 != 2) fail(r)
    r.body()
  }

  /** GET on a lookup route: 404 means "absent", other non-2xx is loud. */
  protected def getOpt(pathAndQuery: String): Option[String] = {
    val r = getRaw(pathAndQuery)
    if (r.statusCode() == 404) None
    else if (r.statusCode() / 100 != 2) fail(r)
    else Some(r.body())
  }

  /** POST that must succeed — mutations never swallow a missing route. */
  protected def post(pathAndQuery: String, body: String): String = {
    val r = postRaw(pathAndQuery, body)
    if (r.statusCode() / 100 != 2) fail(r)
    r.body()
  }

  // ---- JSON decode helpers shared by every client ----

  protected def fields(body: String): Map[String, JValue] =
    JsonMethods.parse(body) match {
      case JObject(fs) => fs.toMap
      case other => throw new java.io.IOException(
        s"expected a JSON object from the service, got ${other.getClass.getSimpleName}")
    }

  /** Top-level JSON array of objects → one field-map per element. */
  protected def objArray(body: String): Seq[Map[String, JValue]] =
    JsonMethods.parse(body) match {
      case JArray(items) => items.collect { case JObject(fs) => fs.toMap }
      case _ => Nil
    }

  protected def strings(body: String, key: String): Seq[String] =
    strArr(fields(body), key)

  protected def strArr(m: Map[String, JValue], k: String): Seq[String] =
    m.get(k) match {
      case Some(JArray(vs)) => vs.collect { case JString(v) => v }
      case _ => Nil
    }

  protected def str(m: Map[String, JValue], k: String): String =
    m.get(k).collect { case JString(v) => v }.getOrElse("")

  protected def lng(m: Map[String, JValue], k: String): Long =
    m.get(k) match {
      case Some(JInt(v)) => v.longValue
      case Some(JLong(v)) => v
      case _ => 0L
    }

  protected def bool(m: Map[String, JValue], k: String): Boolean =
    m.get(k).collect { case JBool(b) => b }.getOrElse(false)
}

private[service] object FacadeJson {

  /** The observation payload both evaluate routes accept
    * (`GovernanceHttpServer` jsonBody/decodeSchema/decodeMetrics):
    * contract + schema snapshot + one-pass metrics — the pipeline's
    * OBSERVATIONS cross the wire, never its data. Metric values cover
    * everything graft's own producers emit: longs/doubles/strings from
    * `Metrics.compute`, `java.math.BigDecimal`/boxed numerics from
    * query rules, and `Seq[String]` observed-enum lists from
    * `Metrics.computeWithObservations` (the server decodes string
    * arrays back to `Seq[String]` so the drafting enum-extension path
    * works remotely). */
  def observationPayload(contract: Contract,
                         schema: Map[String, FieldSnapshot],
                         metrics: Map[String, Any]): String = {
    val schemaJson = JObject(schema.toList.sortBy(_._1).map { case (name, fs) =>
      name -> (JObject(
        "backendType" -> JString(fs.backendType),
        "odcsType" -> JString(fs.odcsType),
        "nullable" -> JBool(fs.nullable)): JValue)
    })
    def metricValue(k: String, v: Any): JValue = v match {
      case n: Long => JLong(n)
      case n: Int => JLong(n.toLong)
      case n: Short => JLong(n.toLong)
      case n: Double => JDouble(n)
      case n: Float => JDouble(n.toDouble)
      case n: BigDecimal => JDecimal(n)
      case n: java.math.BigDecimal => JDecimal(BigDecimal(n))
      case n: java.math.BigInteger => JLong(n.longValueExact())
      case s: String => JString(s)
      case xs: Seq[_] => JArray(xs.toList.map(x => JString(String.valueOf(x)): JValue))
      case other => throw new IllegalArgumentException(
        s"metrics.$k: unsupported value type ${other.getClass.getSimpleName}")
    }
    val metricsJson = JObject(metrics.toList.sortBy(_._1).map { case (k, v) =>
      k -> metricValue(k, v)
    })
    JsonMethods.compact(JsonMethods.render(JObject(
      "contract" -> JsonMethods.parse(ContractJson.toJson(contract)),
      "schema" -> schemaJson,
      "metrics" -> metricsJson)))
  }

  def statusFrom(m: Map[String, JValue]): DatasetStatus = {
    def s(k: String) = m.get(k).collect { case JString(v) => v }.getOrElse("")
    def arr(k: String) = m.get(k) match {
      case Some(JArray(vs)) => vs.collect { case JString(v) => v }
      case _ => Nil
    }
    val metrics = m.get("metrics") match {
      case Some(JObject(kvs)) => kvs.toMap.collect {
        case (k, JDouble(v)) => k -> v
        case (k, JInt(v)) => k -> v.toDouble
        case (k, JLong(v)) => k -> v.toDouble
        case (k, JDecimal(v)) => k -> v.toDouble
      }
      case _ => Map.empty[String, Double]
    }
    val recordedAt = m.get("recordedAt") match {
      case Some(JInt(v)) => v.longValue
      case Some(JLong(v)) => v
      case _ => 0L
    }
    DatasetStatus(s("datasetId"), s("datasetVersion"), s("contractId"),
      s("contractVersion"), s("status"), arr("errors"), arr("warnings"),
      metrics, recordedAt)
  }
}

/** Remote [[DataProductService]] over the facade's `/products` routes —
  * the data-product half of the reference's remote service clients
  * (`dc43-service-clients/.../data_products/client/remote.py`). A
  * pipeline links this where it would link a [[DataProductBackend]]
  * ([[graft.io.GovernedIO]] binds to the trait), so port-governed reads
  * and writes work against a deployed facade with no code change. The
  * registration lifecycle runs on the SERVER (one authoritative
  * draft-minting sequence, whatever the client count); extra
  * `customProperties` travel in the wrapped register body so the
  * server-side merge keeps the local backend's no-op-comparison
  * semantics. */
final class HttpDataProductClient(baseUrl: String,
                                  timeout: Duration = Duration.ofSeconds(30),
                                  bearerToken: Option[String] = None)
    extends FacadeClient(baseUrl, timeout, bearerToken) with DataProductService {

  override def put(p: DataProduct): Unit = {
    post("/products/put", DataProductJson.toJson(p))
    ()
  }

  override def get(id: String, version: String): Option[DataProduct] =
    getOpt(s"/products/get?id=${enc(id)}&version=${enc(version)}")
      .map(DataProductJson.fromJson)

  override def latest(id: String): Option[DataProduct] =
    getOpt(s"/products/latest?id=${enc(id)}").map(DataProductJson.fromJson)

  override def listVersions(id: String): Seq[String] =
    strings(get(s"/products/versions?id=${enc(id)}"), "versions")

  override def listDataProducts(limit: Option[Int] = None,
                                offset: Int = 0): ProductListing = {
    val q = limit.map(l => s"limit=$l&").getOrElse("") + s"offset=$offset"
    val m = fields(get(s"/products?$q"))
    val lim = m.get("limit") match {
      case Some(JInt(v)) => Some(v.intValue)
      case Some(JLong(v)) => Some(v.toInt)
      case _ => None
    }
    ProductListing(strArr(m, "items"), lng(m, "total").toInt, lim, lng(m, "offset").toInt)
  }

  private def registration(body: String): RegistrationResult = {
    val m = fields(body)
    val product = m.get("product").map(DataProductJson.fromJValue)
      .getOrElse(throw new java.io.IOException("registration answer without product"))
    RegistrationResult(product, bool(m, "changed"))
  }

  private def wrapped(port: JValue, props: Map[String, String]): String =
    JsonMethods.compact(JsonMethods.render(JObject(
      "port" -> port,
      "customProperties" -> JObject(props.toList.sortBy(_._1)
        .map { case (k, v) => k -> (JString(v): JValue) }))))

  override def registerInputPort(id: String, port: InputPort, bump: String = "minor",
                                 customProperties: Map[String, String] = Map.empty,
                                 sourceDataProduct: Option[String] = None,
                                 sourceOutputPort: Option[String] = None): RegistrationResult = {
    val q = s"/products/register-input?id=${enc(id)}&bump=${enc(bump)}" +
      sourceDataProduct.fold("")(v => s"&sourceDataProduct=${enc(v)}") +
      sourceOutputPort.fold("")(v => s"&sourceOutputPort=${enc(v)}")
    registration(post(q,
      wrapped(DataProductJson.inputPortToJValue(port), customProperties)))
  }

  override def registerOutputPort(id: String, port: OutputPort, bump: String = "minor",
                                  customProperties: Map[String, String] = Map.empty): RegistrationResult =
    registration(post(s"/products/register-output?id=${enc(id)}&bump=${enc(bump)}",
      wrapped(DataProductJson.outputPortToJValue(port), customProperties)))

  override def reviewDraft(id: String, version: String, approve: Boolean): DataProduct =
    DataProductJson.fromJson(post(
      s"/products/review?id=${enc(id)}&version=${enc(version)}&approve=$approve", ""))

  override def resolveOutputContract(id: String, portName: String): Option[(String, String)] =
    getOpt(s"/products/resolve-output?id=${enc(id)}&port=${enc(portName)}").map { b =>
      val m = fields(b)
      (str(m, "contractId"), str(m, "contractVersion"))
    }
}

/** One expectation descriptor as served by `/data-quality/expectations`. */
final case class RemoteExpectation(key: String, rule: String,
                                   column: Option[String], optional: Boolean,
                                   predicate: Option[String])

/** A data-quality verdict as served by `/data-quality/evaluate`. */
final case class RemoteVerdict(ok: Boolean, status: String,
                               errors: Seq[String], warnings: Seq[String])

/** One row of `/governance/dataset-records` (the activity list is
  * summarised to its count on the wire). */
final case class RemoteDatasetRecord(datasetId: String, datasetVersion: String,
                                     contractId: String, contractVersion: String,
                                     status: Option[DatasetStatus],
                                     activityCount: Int, lastSeenAt: Long)

/** A resolved governance read/write plan over the wire — the reference's
  * encode_read_plan/encode_write_plan shape reduced to what graft's
  * pipeline consumes: the concrete contract plus the ids the governed
  * operation will run under. */
final case class RemoteResolvedPlan(contractId: String, contractVersion: String,
                                    datasetId: String, datasetVersion: String,
                                    contract: Contract)

/** One row of `/governance/activity`. */
final case class RemoteActivity(pipeline: String, operation: String,
                                datasetId: String, datasetVersion: String,
                                contractId: String, contractVersion: String,
                                recordedAt: Long, status: Option[DatasetStatus])

/** Remote client for the governance + data-quality families — the
  * governance half of the reference's remote service clients
  * (`dc43-service-clients/.../governance/client/remote.py:1-653`). The
  * heavy routes ship OBSERVATIONS (contract + schema snapshot + one-pass
  * metrics) and the server evaluates, records, and auto-drafts — the
  * pipeline's data never crosses the wire, which is the only shape that
  * survives 100 TB inputs. */
final class HttpGovernanceClient(baseUrl: String,
                                 timeout: Duration = Duration.ofSeconds(30),
                                 bearerToken: Option[String] = None)
    extends FacadeClient(baseUrl, timeout, bearerToken) with GovernanceService {

  private def statusOf(m: Map[String, JValue], k: String): Option[DatasetStatus] =
    m.get(k).collect { case JObject(st) => FacadeJson.statusFrom(st.toMap) }

  override def getStatus(datasetId: String, datasetVersion: String): Option[DatasetStatus] =
    getOpt(s"/governance/status?dataset=${enc(datasetId)}&version=${enc(datasetVersion)}")
      .map(b => FacadeJson.statusFrom(fields(b)))

  override def listDatasets(): Seq[String] =
    strings(get("/governance/datasets"), "ids")

  override def linkDatasetContract(datasetId: String, contractId: String,
                                   contractVersion: String,
                                   datasetVersion: String = ""): Unit = {
    // datasetVersion crosses the wire so server-side link hooks (e.g.
    // catalog sync) see the same arguments as in-process wiring
    val dv = if (datasetVersion.isEmpty) "" else s"&datasetVersion=${enc(datasetVersion)}"
    post(s"/governance/link?dataset=${enc(datasetId)}" +
      s"&contractId=${enc(contractId)}&contractVersion=${enc(contractVersion)}$dv", "")
    ()
  }

  override def linkedContract(datasetId: String): Option[(String, String)] =
    getOpt(s"/governance/link?dataset=${enc(datasetId)}").map { b =>
      val m = fields(b)
      (str(m, "contractId"), str(m, "contractVersion"))
    }

  /** Evaluate observations, RECORD the verdict against the dataset
    * version, and report the contract's outstanding drafts — one round
    * trip (the reference's `/governance/evaluate`). */
  override def evaluateAndRecord(datasetId: String, datasetVersion: String,
                        contract: Contract,
                        schema: Map[String, FieldSnapshot],
                        metrics: Map[String, Any]): GovernanceEvaluation = {
    val m = fields(post(
      s"/governance/evaluate?dataset=${enc(datasetId)}&version=${enc(datasetVersion)}",
      FacadeJson.observationPayload(contract, schema, metrics)))
    val status = statusOf(m, "status").getOrElse(
      throw new java.io.IOException("evaluate answer without status"))
    GovernanceEvaluation(status, bool(m, "ok"), strArr(m, "draftVersions"))
  }

  /** [[GovernanceService.record]] over the wire: the validation's own
    * schema snapshot + metrics travel as observations through
    * `/governance/evaluate` and the server re-derives the verdict —
    * identical for Evaluator-default validations (GovernedIO's path). */
  override def record(datasetId: String, datasetVersion: String,
                      contract: Contract,
                      validation: graft.quality.ValidationResult): DatasetStatus =
    evaluateAndRecord(datasetId, datasetVersion, contract,
      validation.schema, validation.metrics).status

  /** Stateless evaluation (nothing recorded) — `/data-quality/evaluate`. */
  def evaluate(contract: Contract, schema: Map[String, FieldSnapshot],
               metrics: Map[String, Any]): RemoteVerdict = {
    val m = fields(post("/data-quality/evaluate",
      FacadeJson.observationPayload(contract, schema, metrics)))
    RemoteVerdict(bool(m, "ok"), str(m, "status"),
      strArr(m, "errors"), strArr(m, "warnings"))
  }

  /** The contract's expectation descriptors with SQL predicates, so the
    * pipeline can pre-check locally — `/data-quality/expectations`. */
  def expectations(contract: Contract): Seq[RemoteExpectation] = {
    val body = post("/data-quality/expectations",
      JsonMethods.compact(JsonMethods.render(JObject(
        "contract" -> JsonMethods.parse(ContractJson.toJson(contract))))))
    fields(body).get("expectations") match {
      case Some(JArray(items)) => items.collect { case JObject(fs) =>
        val m = fs.toMap
        RemoteExpectation(str(m, "key"), str(m, "rule"),
          m.get("column").collect { case JString(v) => v },
          bool(m, "optional"),
          m.get("predicate").collect { case JString(v) => v })
      }
      case _ => Nil
    }
  }

  override def listDraftVersions(contractId: String): Seq[String] =
    strings(get(s"/governance/drafts?contractId=${enc(contractId)}"), "versions")

  override def reviewDraft(contractId: String, version: String, approve: Boolean): Contract =
    ContractJson.fromJson(post(
      s"/governance/review-draft?contractId=${enc(contractId)}" +
        s"&version=${enc(version)}&approve=$approve", ""))

  override def updateDraft(contractId: String, version: String,
                           edited: Contract): Contract =
    ContractJson.fromJson(post(
      s"/governance/update-draft?contractId=${enc(contractId)}" +
        s"&version=${enc(version)}", ContractJson.toJson(edited)))

  private def resolvePlan(route: String, contractId: Option[String],
                          version: Option[String], product: Option[String],
                          port: Option[String], dataset: Option[String],
                          datasetVersion: Option[String]): RemoteResolvedPlan = {
    val q = (contractId.map(c => s"contractId=${enc(c)}") ++
      version.map(v => s"version=${enc(v)}") ++
      product.map(p => s"product=${enc(p)}") ++
      port.map(p => s"port=${enc(p)}") ++
      dataset.map(d => s"dataset=${enc(d)}") ++
      datasetVersion.map(v => s"datasetVersion=${enc(v)}")).mkString("&")
    val body = post(s"$route?$q", "")
    val m = fields(body)
    RemoteResolvedPlan(str(m, "contractId"), str(m, "contractVersion"),
      str(m, "datasetId"), str(m, "datasetVersion"),
      ContractJson.fromJson(JsonMethods.compact(JsonMethods.render(m("contract")))))
  }

  /** The reference's `/governance/read/resolve` round trip: a context
    * (contract reference OR product-port binding) in, the resolved
    * read plan out — the server runs the same
    * [[graft.io.GovernedIO.resolveContract]] rule the in-process
    * pipeline runs. */
  def resolveReadPlan(contractId: Option[String] = None,
                      version: Option[String] = None,
                      product: Option[String] = None,
                      port: Option[String] = None,
                      dataset: Option[String] = None,
                      datasetVersion: Option[String] = None): RemoteResolvedPlan =
    resolvePlan("/governance/read/resolve", contractId, version, product,
      port, dataset, datasetVersion)

  /** `/governance/write/resolve` — [[resolveReadPlan]]'s write twin. */
  def resolveWritePlan(contractId: Option[String] = None,
                       version: Option[String] = None,
                       product: Option[String] = None,
                       port: Option[String] = None,
                       dataset: Option[String] = None,
                       datasetVersion: Option[String] = None): RemoteResolvedPlan =
    resolvePlan("/governance/write/resolve", contractId, version, product,
      port, dataset, datasetVersion)

  override def statusMatrix(): Seq[DatasetStatus] =
    objArray(get("/governance/status-matrix")).map(FacadeJson.statusFrom)

  def datasetRecords(dataset: Option[String] = None,
                     version: Option[String] = None): Seq[RemoteDatasetRecord] = {
    val q = (dataset.map(d => s"dataset=${enc(d)}") ++
      version.map(v => s"version=${enc(v)}")).mkString("&")
    objArray(get(s"/governance/dataset-records?$q")).map { m =>
      RemoteDatasetRecord(str(m, "datasetId"), str(m, "datasetVersion"),
        str(m, "contractId"), str(m, "contractVersion"), statusOf(m, "status"),
        lng(m, "activityCount").toInt, lng(m, "lastSeenAt"))
    }
  }

  override def metricHistory(datasetId: String): Seq[MetricObservation] =
    objArray(get(s"/governance/metrics?dataset=${enc(datasetId)}")).map { m =>
      val numeric = m.get("valueNumeric") match {
        case Some(JDouble(v)) => Some(v)
        case Some(JInt(v)) => Some(v.toDouble)
        case Some(JLong(v)) => Some(v.toDouble)
        case Some(JDecimal(v)) => Some(v.toDouble)
        case _ => None
      }
      MetricObservation(str(m, "datasetId"), str(m, "datasetVersion"),
        str(m, "key"), str(m, "valueText"), numeric, lng(m, "recordedAt"))
    }

  def activity(datasetId: String,
               version: Option[String] = None): Seq[RemoteActivity] = {
    val q = s"dataset=${enc(datasetId)}" +
      version.fold("")(v => s"&version=${enc(v)}")
    objArray(get(s"/governance/activity?$q")).map { m =>
      RemoteActivity(str(m, "pipeline"), str(m, "operation"),
        str(m, "datasetId"), str(m, "datasetVersion"),
        str(m, "contractId"), str(m, "contractVersion"), lng(m, "recordedAt"),
        statusOf(m, "status"))
    }
  }
}
