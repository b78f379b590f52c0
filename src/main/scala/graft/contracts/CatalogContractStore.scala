package graft.contracts

import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** One contract version as the catalog describes it — the reference's
  * `ContractSummary` DTO (`dc43-service-backends/.../contracts/backend/
  * stores/collibra.py:23-30`): id, version, lifecycle status, and the
  * catalog's last-update stamp when it sends one. */
final case class ContractSummary(contractId: String, version: String,
                                 status: String,
                                 updatedAt: Option[java.time.Instant] = None)

/** Minimal protocol an external governance catalog must speak for its
  * CONTRACTS to flow through graft's [[ContractStore]] surface — the
  * reference's `CollibraContractAdapter` protocol (`collibra.py:33-60`),
  * the contracts twin of
  * [[graft.products.CatalogDataProductAdapter]]. Everything above this
  * seam (drafting, review, governance links) is catalog-agnostic.
  *
  * DEVIATION (documented): the reference raises `LookupError` for
  * absent contracts; graft's store surface answers absence with
  * `Option` (the [[ContractStore.get]] contract), so `getContract` /
  * `getValidatedContract` return `None` — infrastructure failures still
  * throw. */
trait CatalogContractAdapter {
  def listContracts(): Seq[String]
  def listVersions(contractId: String): Seq[ContractSummary]
  def getContract(contractId: String, version: String): Option[Contract]
  def upsertContract(contract: Contract, status: String = "Draft"): Unit
  /** Convenience used when persisting draft proposals (`collibra.py:53`). */
  def submitDraft(contract: Contract): Unit = upsertContract(contract, "Draft")
  def updateStatus(contractId: String, version: String, status: String): Unit
  def getValidatedContract(contractId: String): Option[Contract]
}

/** Expose catalog-managed contracts through the same [[ContractStore]]
  * API as the filesystem/JDBC stores — the reference's
  * `CollibraContractStore` (`collibra.py:63-109`): persistence
  * primitives delegate to the adapter; `statusFilter` narrows the
  * visible version chain to one lifecycle state (a consumer pipeline
  * that must only ever see `"Validated"` revisions sets it and the
  * store's `latest` then resolves within that subset).
  *
  * DEVIATION (documented): `latest` inherits graft's semver ordering
  * (release ABOVE pre-release of the same core, semver.org §11) from the
  * [[ContractStore]] default; the reference's `_semver_key` sorts the
  * empty prerelease below any suffix, making a stale draft shadow its
  * own release — graft's stores all agree on the correct order instead. */
final class CatalogContractStore(adapter: CatalogContractAdapter,
                                 defaultStatus: String = "Draft",
                                 statusFilter: Option[String] = None)
    extends ContractStore {

  override def put(contract: Contract): Unit = {
    require(contract.version.trim.nonEmpty, "contract version is required")
    adapter.upsertContract(contract, defaultStatus)
  }

  override def get(id: String, version: String): Option[Contract] =
    adapter.getContract(id, version)

  override def listContractIds(): Seq[String] = adapter.listContracts()

  override def listVersions(id: String): Seq[String] = {
    val summaries = adapter.listVersions(id)
    statusFilter.fold(summaries)(f => summaries.filter(_.status == f))
      .map(_.version)
  }

  /** Latest revision the catalog marks `Validated` — the reference's
    * `latest_validated` (`collibra.py:102-109`), the revision a
    * production reader binds to when governance gates on catalog
    * lifecycle state. */
  def latestValidated(id: String): Option[Contract] =
    adapter.getValidatedContract(id)
}

/** Filesystem-backed stub adapter for tests and demos — the reference's
  * `StubCollibraContractAdapter` (`collibra.py:129-225`): wraps
  * [[FsContractStore]] behind the adapter protocol with an in-memory
  * status/updated-at sidecar, so the full store surface runs without a
  * catalog deployment. `catalog` pre-registers contract → (data product,
  * port) placements; unknown ids self-register under the reference's
  * `("data-product", "port")` placeholder. */
final class StubCatalogContractAdapter(basePath: String,
                                       catalog: Map[String, (String, String)] = Map.empty)
    extends CatalogContractAdapter {
  private val store = new FsContractStore(basePath)
  private val placements = scala.collection.mutable.Map(catalog.toSeq: _*)
  private val metadata =
    scala.collection.mutable.Map.empty[(String, String), (String, Option[java.time.Instant])]

  private def registerIfMissing(id: String): Unit =
    placements.getOrElseUpdate(id, ("data-product", "port"))

  private def info(id: String, version: String): (String, Option[java.time.Instant]) = {
    registerIfMissing(id)
    metadata.getOrElseUpdate((id, version), ("Draft", None))
  }

  override def listContracts(): Seq[String] =
    (placements.keySet ++ store.listContractIds()).toSeq.sorted

  override def listVersions(id: String): Seq[ContractSummary] =
    store.listVersions(id).map { v =>
      val (status, at) = info(id, v)
      ContractSummary(id, v, status, at)
    }.sortBy(s => SemVer.tryParse(s.version))

  override def getContract(id: String, version: String): Option[Contract] =
    store.get(id, version)

  override def upsertContract(contract: Contract, status: String): Unit = {
    require(contract.version.trim.nonEmpty, "contract version is required")
    store.put(contract)
    registerIfMissing(contract.id)
    metadata((contract.id, contract.version)) =
      (status, Some(java.time.Instant.now()))
  }

  override def updateStatus(id: String, version: String, status: String): Unit = {
    // the reference raises LookupError on an unknown version — a status
    // flip against nothing must be loud, not a silent metadata insert
    require(store.listVersions(id).contains(version),
      s"contract $id:$version not found in stub catalog store")
    metadata((id, version)) = (status, Some(java.time.Instant.now()))
  }

  override def getValidatedContract(id: String): Option[Contract] =
    listVersions(id).filter(_.status == "Validated")
      .maxByOption(s => SemVer.tryParse(s.version))
      .flatMap(s => store.get(id, s.version))
}

/** HTTP adapter speaking a REST catalog's per-port contract endpoints —
  * the reference's `HttpCollibraContractAdapter` (`collibra.py:228-355`).
  * A vendor catalog addresses contracts by their ASSET PLACEMENT, not by
  * bare id: `contractCatalog` maps each contract id to its
  * `(data product, port)` pair, spliced into the endpoint template
  * (reference default
  * `/rest/2.0/dataproducts/{data_product}/ports/{port}/contracts`).
  * Unregistered ids are refused loudly before the wire is touched.
  *
  * Route shape:
  *  - `GET   {contracts}`        → version summaries; tolerated payload
  *    envelopes: `{"data": [...]}`, `{"results": [...]}`,
  *    `{"contracts": [...]}`, or a bare array; items carry `version`,
  *    optional `status` (default `Draft`) and `updatedAt` ISO stamp
  *    (`Z` tolerated); items without a version are skipped
  *  - `GET   {contracts}/{v}`    → one revision; the ODCS document may
  *    arrive bare or wrapped under `contract` / `data`; 404 → absent
  *  - `PUT   {contracts}/{v}`    with `{"status": ..., "contract": <odcs>}`
  *  - `PATCH {contracts}/{v}`    with `{"status": ...}` — lifecycle flip
  *
  * Built on the JDK `HttpClient` like
  * [[graft.products.HttpCatalogAdapter]]; the optional bearer token
  * rides every request; ids travel URL-encoded in the path. 404 is a
  * domain answer; any other non-2xx throws. */
final class HttpCatalogContractAdapter(baseUrl: String,
                                       contractCatalog: Map[String, (String, String)],
                                       token: Option[String] = None,
                                       timeout: Duration = Duration.ofSeconds(10),
                                       endpointTemplate: String =
                                         "/rest/2.0/dataproducts/{data_product}/ports/{port}/contracts")
    extends CatalogContractAdapter {

  private val base = baseUrl.stripSuffix("/")
  private val template = endpointTemplate.stripSuffix("/")
  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  private def enc(s: String) = URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  private def locate(id: String): (String, String) =
    contractCatalog.getOrElse(id, throw new IllegalArgumentException(
      s"contract $id is not registered in the catalog — map it to its " +
        "(data product, port) placement"))

  private def contractsUrl(id: String, suffix: String = ""): String = {
    val (product, port) = locate(id)
    base + template.replace("{data_product}", enc(product))
      .replace("{port}", enc(port)) + suffix
  }

  private def request(url: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
      .header("Accept", "application/json")
    token.fold(b)(t => b.header("Authorization", s"Bearer $t"))
  }

  private def send(req: HttpRequest): HttpResponse[String] =
    client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))

  /** 404 is a domain answer; other non-2xx throws — the
    * [[graft.service.HttpContractStore]] convention (the reference's
    * `raise_for_status`). */
  private def expect(r: HttpResponse[String]): HttpResponse[String] = {
    if (r.statusCode() / 100 != 2 && r.statusCode() != 404)
      throw new java.io.IOException(
        s"catalog ${r.uri()} answered HTTP ${r.statusCode()}: ${r.body()}")
    r
  }

  override def listContracts(): Seq[String] = contractCatalog.keys.toSeq.sorted

  override def listVersions(id: String): Seq[ContractSummary] = {
    val r = expect(send(request(contractsUrl(id)).GET().build()))
    if (r.statusCode() == 404) return Nil
    def items(v: JValue): Option[List[JValue]] = v match {
      case JArray(xs) => Some(xs)
      case _ => None
    }
    val found = JsonMethods.parse(r.body()) match {
      case JObject(fs) =>
        val m = fs.toMap
        // first recognised envelope key wins, in the reference's order
        Seq("data", "results", "contracts").iterator
          .flatMap(k => m.get(k).flatMap(items)).nextOption().getOrElse(Nil)
      case arr => items(arr).getOrElse(Nil)
    }
    found.flatMap {
      case JObject(fields) =>
        val m = fields.toMap
        def str(k: String) = m.get(k).collect {
          case JString(s) => s
          case JInt(i) => i.toString
        }
        str("version").map { v =>
          ContractSummary(id, v, str("status").getOrElse("Draft"),
            str("updatedAt").flatMap(parseTimestamp))
        }
      case _ => None
    }.sortBy(s => SemVer.tryParse(s.version))
  }

  /** Lenient ISO-8601 parse (the reference's `_parse_timestamp`):
    * trailing `Z`, offset forms, and bare date-times all land; anything
    * else reads as no stamp rather than failing the listing. */
  private def parseTimestamp(s: String): Option[java.time.Instant] = {
    val t = s.trim
    if (t.isEmpty) None
    else scala.util.Try(java.time.Instant.parse(t)) // `...Z` form
      .orElse(scala.util.Try( // explicit-offset form (+02:00)
        java.time.OffsetDateTime.parse(t).toInstant))
      .orElse(scala.util.Try( // bare date-time: read as UTC
        java.time.LocalDateTime.parse(t)
          .atOffset(java.time.ZoneOffset.UTC).toInstant))
      .toOption
  }

  /** Unwrap `{"contract": {...}}` / `{"data": {...}}` envelopes; a bare
    * ODCS object passes through (`collibra.py:337-345`). */
  private def unwrap(body: String): Contract = {
    val parsed = JsonMethods.parse(body)
    val doc = parsed match {
      case JObject(fs) =>
        val m = fs.toMap
        m.get("contract").collect { case o: JObject => o }
          .orElse(m.get("data").collect { case o: JObject => o })
          .getOrElse(parsed)
      case other => other
    }
    ContractJson.jvalueToContract(doc)
  }

  override def getContract(id: String, version: String): Option[Contract] = {
    val r = expect(send(request(contractsUrl(id, s"/${enc(version)}")).GET().build()))
    if (r.statusCode() == 404) None else Some(unwrap(r.body()))
  }

  override def upsertContract(contract: Contract, status: String): Unit = {
    require(contract.id.trim.nonEmpty && contract.version.trim.nonEmpty,
      "catalog contract payload requires id and version")
    val body = JsonMethods.compact(JsonMethods.render(JObject(
      "status" -> JString(status),
      "contract" -> ContractJson.contractToJValue(contract))))
    val r = send(request(contractsUrl(contract.id, s"/${enc(contract.version)}"))
      .header("Content-Type", "application/json; charset=utf-8")
      .PUT(HttpRequest.BodyPublishers.ofString(body)).build())
    if (r.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"catalog ${r.uri()} answered HTTP ${r.statusCode()}: ${r.body()}")
  }

  override def updateStatus(id: String, version: String, status: String): Unit = {
    val body = JsonMethods.compact(JsonMethods.render(
      JObject("status" -> JString(status))))
    val r = send(request(contractsUrl(id, s"/${enc(version)}"))
      .header("Content-Type", "application/json; charset=utf-8")
      .method("PATCH", HttpRequest.BodyPublishers.ofString(body)).build())
    if (r.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"catalog ${r.uri()} answered HTTP ${r.statusCode()}: ${r.body()}")
  }

  override def getValidatedContract(id: String): Option[Contract] =
    listVersions(id).filter(_.status == "Validated")
      .maxByOption(s => SemVer.tryParse(s.version))
      .flatMap(s => getContract(id, s.version))
}
