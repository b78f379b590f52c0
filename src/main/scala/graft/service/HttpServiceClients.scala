package graft.service

import graft.contracts.{Contract, ContractJson}
import graft.governance.{DatasetStatus, MetricObservation}
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
  * query-parameter ids, 404-as-domain-answer, loud transport errors. */
private[service] abstract class FacadeClient(baseUrl: String,
                                             timeout: Duration,
                                             bearerToken: Option[String]) {

  protected val base: String = baseUrl.stripSuffix("/")
  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  protected def enc(s: String): String = URLEncoder.encode(s, "UTF-8")

  private def withAuth(b: HttpRequest.Builder): HttpRequest.Builder =
    bearerToken.fold(b)(t => b.header("Authorization", s"Bearer $t"))

  private def expect(r: HttpResponse[String]): HttpResponse[String] = {
    if (r.statusCode() / 100 != 2 && r.statusCode() != 404)
      throw new java.io.IOException(
        s"service ${r.uri()} answered HTTP ${r.statusCode()}: ${r.body()}")
    r
  }

  protected def get(pathAndQuery: String): HttpResponse[String] =
    expect(client.send(
      withAuth(HttpRequest.newBuilder(URI.create(base + pathAndQuery))
        .timeout(timeout)).GET().build(),
      HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8)))

  protected def post(pathAndQuery: String, body: String): HttpResponse[String] =
    expect(client.send(
      withAuth(HttpRequest.newBuilder(URI.create(base + pathAndQuery))
        .timeout(timeout)
        .header("Content-Type", "application/json; charset=utf-8"))
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
      HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8)))

  /** A 404 on a lookup route means "absent", anything else parses. */
  protected def opt(r: HttpResponse[String]): Option[String] =
    if (r.statusCode() == 404) None else Some(r.body())

  protected def fields(body: String): Map[String, JValue] =
    JsonMethods.parse(body) match {
      case JObject(fs) => fs.toMap
      case other => throw new java.io.IOException(
        s"expected a JSON object from the service, got ${other.getClass.getSimpleName}")
    }

  protected def strings(body: String, key: String): Seq[String] =
    fields(body).get(key) match {
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
}

private[service] object FacadeJson {

  /** The observation payload both evaluate routes accept
    * (`GovernanceHttpServer` jsonBody/decodeSchema/decodeMetrics):
    * contract + schema snapshot + one-pass metrics — the pipeline's
    * OBSERVATIONS cross the wire, never its data. */
  def observationPayload(contract: Contract,
                         schema: Map[String, FieldSnapshot],
                         metrics: Map[String, Any]): String = {
    val schemaJson = JObject(schema.toList.sortBy(_._1).map { case (name, fs) =>
      name -> (JObject(
        "backendType" -> JString(fs.backendType),
        "odcsType" -> JString(fs.odcsType),
        "nullable" -> JBool(fs.nullable)): JValue)
    })
    val metricsJson = JObject(metrics.toList.sortBy(_._1).map { case (k, v) =>
      val jv: JValue = v match {
        case n: Long => JLong(n)
        case n: Int => JLong(n.toLong)
        case n: Double => JDouble(n)
        case n: BigDecimal => JDecimal(n)
        case s: String => JString(s)
        case other => throw new IllegalArgumentException(
          s"metrics.$k: unsupported value type ${other.getClass.getSimpleName}")
      }
      k -> jv
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
    opt(get(s"/products/get?id=${enc(id)}&version=${enc(version)}"))
      .map(DataProductJson.fromJson)

  override def latest(id: String): Option[DataProduct] =
    opt(get(s"/products/latest?id=${enc(id)}")).map(DataProductJson.fromJson)

  override def listVersions(id: String): Seq[String] =
    strings(get(s"/products/versions?id=${enc(id)}").body(), "versions")

  override def listDataProducts(limit: Option[Int] = None,
                                offset: Int = 0): ProductListing = {
    val q = limit.map(l => s"limit=$l&").getOrElse("") + s"offset=$offset"
    val m = fields(get(s"/products?$q").body())
    val items = m.get("items") match {
      case Some(JArray(vs)) => vs.collect { case JString(v) => v }
      case _ => Nil
    }
    val lim = m.get("limit") match {
      case Some(JInt(v)) => Some(v.intValue)
      case Some(JLong(v)) => Some(v.toInt)
      case _ => None
    }
    ProductListing(items, lng(m, "total").toInt, lim, lng(m, "offset").toInt)
  }

  private def registration(body: String): RegistrationResult = {
    val m = fields(body)
    val changed = m.get("changed").collect { case JBool(b) => b }.getOrElse(false)
    val product = m.get("product").map(j =>
      DataProductJson.fromJson(JsonMethods.compact(JsonMethods.render(j))))
      .getOrElse(throw new java.io.IOException("registration answer without product"))
    RegistrationResult(product, changed)
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
      wrapped(DataProductJson.inputPortToJValue(port), customProperties)).body())
  }

  override def registerOutputPort(id: String, port: OutputPort, bump: String = "minor",
                                  customProperties: Map[String, String] = Map.empty): RegistrationResult =
    registration(post(s"/products/register-output?id=${enc(id)}&bump=${enc(bump)}",
      wrapped(DataProductJson.outputPortToJValue(port), customProperties)).body())

  override def reviewDraft(id: String, version: String, approve: Boolean): DataProduct =
    DataProductJson.fromJson(post(
      s"/products/review?id=${enc(id)}&version=${enc(version)}&approve=$approve",
      "").body())

  override def resolveOutputContract(id: String, portName: String): Option[(String, String)] =
    opt(get(s"/products/resolve-output?id=${enc(id)}&port=${enc(portName)}")).map { b =>
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

/** `/governance/evaluate`'s combined answer: the RECORDED status plus
  * any draft versions proposed from the feedback. */
final case class GovernanceEvaluation(status: DatasetStatus, ok: Boolean,
                                      draftVersions: Seq[String])

/** One row of `/governance/dataset-records` (the activity list is
  * summarised to its count on the wire). */
final case class RemoteDatasetRecord(datasetId: String, datasetVersion: String,
                                     contractId: String, contractVersion: String,
                                     status: Option[DatasetStatus],
                                     activityCount: Int, lastSeenAt: Long)

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
    extends FacadeClient(baseUrl, timeout, bearerToken) {

  def getStatus(datasetId: String, datasetVersion: String): Option[DatasetStatus] =
    opt(get(s"/governance/status?dataset=${enc(datasetId)}&version=${enc(datasetVersion)}"))
      .map(b => FacadeJson.statusFrom(fields(b)))

  def listDatasets(): Seq[String] =
    strings(get("/governance/datasets").body(), "ids")

  def linkDatasetContract(datasetId: String, contractId: String,
                          contractVersion: String): Unit = {
    post(s"/governance/link?dataset=${enc(datasetId)}" +
      s"&contractId=${enc(contractId)}&contractVersion=${enc(contractVersion)}", "")
    ()
  }

  def linkedContract(datasetId: String): Option[(String, String)] =
    opt(get(s"/governance/link?dataset=${enc(datasetId)}")).map { b =>
      val m = fields(b)
      (str(m, "contractId"), str(m, "contractVersion"))
    }

  /** Evaluate observations, RECORD the verdict against the dataset
    * version, and collect any proposed draft — one round trip (the
    * reference's `/governance/evaluate`). */
  def evaluateAndRecord(datasetId: String, datasetVersion: String,
                        contract: Contract,
                        schema: Map[String, FieldSnapshot],
                        metrics: Map[String, Any]): GovernanceEvaluation = {
    val body = post(
      s"/governance/evaluate?dataset=${enc(datasetId)}&version=${enc(datasetVersion)}",
      FacadeJson.observationPayload(contract, schema, metrics)).body()
    val m = fields(body)
    val status = m.get("status") match {
      case Some(JObject(fs)) => FacadeJson.statusFrom(fs.toMap)
      case _ => throw new java.io.IOException("evaluate answer without status")
    }
    GovernanceEvaluation(status,
      m.get("ok").collect { case JBool(b) => b }.getOrElse(false),
      m.get("draftVersions") match {
        case Some(JArray(vs)) => vs.collect { case JString(v) => v }
        case _ => Nil
      })
  }

  /** Stateless evaluation (nothing recorded) — `/data-quality/evaluate`. */
  def evaluate(contract: Contract, schema: Map[String, FieldSnapshot],
               metrics: Map[String, Any]): RemoteVerdict = {
    val m = fields(post("/data-quality/evaluate",
      FacadeJson.observationPayload(contract, schema, metrics)).body())
    def arr(k: String) = m.get(k) match {
      case Some(JArray(vs)) => vs.collect { case JString(v) => v }
      case _ => Nil
    }
    RemoteVerdict(m.get("ok").collect { case JBool(b) => b }.getOrElse(false),
      str(m, "status"), arr("errors"), arr("warnings"))
  }

  /** The contract's expectation descriptors with SQL predicates, so the
    * pipeline can pre-check locally — `/data-quality/expectations`. */
  def expectations(contract: Contract): Seq[RemoteExpectation] = {
    val body = post("/data-quality/expectations",
      JsonMethods.compact(JsonMethods.render(JObject(
        "contract" -> JsonMethods.parse(ContractJson.toJson(contract))))))
      .body()
    fields(body).get("expectations") match {
      case Some(JArray(items)) => items.collect { case JObject(fs) =>
        val m = fs.toMap
        RemoteExpectation(str(m, "key"), str(m, "rule"),
          m.get("column").collect { case JString(v) => v },
          m.get("optional").collect { case JBool(b) => b }.getOrElse(false),
          m.get("predicate").collect { case JString(v) => v })
      }
      case _ => Nil
    }
  }

  def listDrafts(contractId: String): Seq[String] =
    strings(get(s"/governance/drafts?contractId=${enc(contractId)}").body(), "versions")

  def reviewDraft(contractId: String, version: String, approve: Boolean): Contract =
    ContractJson.fromJson(post(
      s"/governance/review-draft?contractId=${enc(contractId)}" +
        s"&version=${enc(version)}&approve=$approve", "").body())

  def statusMatrix(): Seq[DatasetStatus] =
    JsonMethods.parse(get("/governance/status-matrix").body()) match {
      case JArray(items) => items.collect { case JObject(fs) =>
        FacadeJson.statusFrom(fs.toMap)
      }
      case _ => Nil
    }

  def datasetRecords(dataset: Option[String] = None,
                     version: Option[String] = None): Seq[RemoteDatasetRecord] = {
    val q = (dataset.map(d => s"dataset=${enc(d)}") ++
      version.map(v => s"version=${enc(v)}")).mkString("&")
    JsonMethods.parse(get(s"/governance/dataset-records?$q").body()) match {
      case JArray(items) => items.collect { case JObject(fs) =>
        val m = fs.toMap
        RemoteDatasetRecord(str(m, "datasetId"), str(m, "datasetVersion"),
          str(m, "contractId"), str(m, "contractVersion"),
          m.get("status").collect { case JObject(st) => FacadeJson.statusFrom(st.toMap) },
          lng(m, "activityCount").toInt, lng(m, "lastSeenAt"))
      }
      case _ => Nil
    }
  }

  def metricHistory(datasetId: String): Seq[MetricObservation] =
    JsonMethods.parse(get(s"/governance/metrics?dataset=${enc(datasetId)}").body()) match {
      case JArray(items) => items.collect { case JObject(fs) =>
        val m = fs.toMap
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
      case _ => Nil
    }

  def activity(datasetId: String,
               version: Option[String] = None): Seq[RemoteActivity] = {
    val q = s"dataset=${enc(datasetId)}" +
      version.fold("")(v => s"&version=${enc(v)}")
    JsonMethods.parse(get(s"/governance/activity?$q").body()) match {
      case JArray(items) => items.collect { case JObject(fs) =>
        val m = fs.toMap
        RemoteActivity(str(m, "pipeline"), str(m, "operation"),
          str(m, "datasetId"), str(m, "datasetVersion"),
          str(m, "contractId"), str(m, "contractVersion"), lng(m, "recordedAt"),
          m.get("status").collect { case JObject(st) => FacadeJson.statusFrom(st.toMap) })
      }
      case _ => Nil
    }
  }
}
