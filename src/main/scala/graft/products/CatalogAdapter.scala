package graft.products

import org.json4s._
import org.json4s.jackson.JsonMethods

import java.net.{URI, URLEncoder}
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

/** Minimal protocol an external governance catalog must speak for its
  * data products to flow through graft's backend surface — the
  * reference's vendor-catalog adapter seam
  * (`dc43-service-backends/.../data_products/backend/collibra.py:19-37`,
  * `CollibraDataProductAdapter`): list versions, fetch one revision,
  * fetch the catalog's notion of "latest", and upsert with a lifecycle
  * status. Everything above this seam (port registration, draft
  * evolution, review — [[MutableDataProductOps]]) is catalog-agnostic.
  *
  * DEVIATION (documented): the reference trades `Mapping[str, object]`
  * payloads across this seam and re-parses them per call; graft's typed
  * [[DataProduct]] crosses instead — the HTTP adapter is the single
  * place JSON enters/leaves, so a malformed catalog payload fails loudly
  * at the transport edge rather than deep inside a registration flow. */
trait CatalogDataProductAdapter {
  def listVersions(dataProductId: String): Seq[String]
  def getDataProduct(dataProductId: String, version: String): Option[DataProduct]
  def latestDataProduct(dataProductId: String): Option[DataProduct]
  def upsertDataProduct(product: DataProduct, status: Option[String]): Unit
}

/** Expose catalog-managed data products through the same backend surface
  * as the filesystem [[DataProductBackend]] — the reference's
  * `CollibraDataProductServiceBackend` (`collibra.py:40-91`): persistence
  * primitives delegate to the adapter, the registration/review lifecycle
  * comes from the shared mixin, and bulk listing is loudly unsupported
  * (the reference raises `NotImplementedError("Collibra adapter does not
  * expose bulk listings")` — vendor catalogs page by asset query, not by
  * graft's id enumeration). */
final class CatalogDataProductBackend(adapter: CatalogDataProductAdapter,
                                      defaultStatusValue: String = "Draft")
    extends MutableDataProductOps {

  override protected def defaultStatus: String = defaultStatusValue

  /** reference `put` (`collibra.py:55-62`): a version is mandatory
    * (drafts are minted upstream by the registration flow), and the
    * lifecycle status defaults when the document carries none.
    * DEVIATION (documented): the default fills in LOWERCASED — the
    * reference passes `default_status` verbatim here ("Draft") while
    * its `_ensure_product` lowercases the same value, so one configured
    * default could seed two casings; here both paths agree, and a
    * case-sensitive `status == "draft"` consumer sees every draft. */
  override def put(p: DataProduct): Unit = {
    if (p.version.forall(_.trim.isEmpty))
      throw new IllegalArgumentException("Data product version is required")
    val status = Option(p.status).map(_.trim).filter(_.nonEmpty)
      .getOrElse(defaultStatusValue.toLowerCase)
    adapter.upsertDataProduct(p.copy(status = status), Some(status))
  }

  override def get(id: String, version: String): Option[DataProduct] =
    adapter.getDataProduct(id, version)

  override def latest(id: String): Option[DataProduct] =
    adapter.latestDataProduct(id)

  /** Sorted as STRINGS (reference `collibra.py:79-81`) — the catalog owns
    * version semantics; graft only needs a stable, deduplicatable set for
    * draft-counter allocation. */
  override def listVersions(id: String): Seq[String] =
    adapter.listVersions(id).sorted

  def listDataProducts(limit: Option[Int] = None, offset: Int = 0): ProductListing =
    throw new UnsupportedOperationException(
      "catalog adapter does not expose bulk listings")
}

/** Filesystem-backed stub adapter for tests and demos — the reference's
  * `StubCollibraDataProductAdapter` (`collibra.py:94-138`), which wraps
  * the local filesystem backend behind the adapter protocol so the full
  * registration lifecycle can run without a catalog deployment. */
final class StubCatalogAdapter(basePath: String) extends CatalogDataProductAdapter {
  private val backend = new DataProductBackend(basePath)

  override def listVersions(id: String): Seq[String] = backend.listVersions(id)

  override def getDataProduct(id: String, version: String): Option[DataProduct] =
    backend.get(id, version)

  override def latestDataProduct(id: String): Option[DataProduct] = backend.latest(id)

  override def upsertDataProduct(product: DataProduct, status: Option[String]): Unit =
    backend.put(status.filter(_.nonEmpty).fold(product)(s => product.copy(status = s)))
}

/** HTTP adapter speaking a REST catalog's data-product endpoints — the
  * reference's `HttpCollibraDataProductAdapter` (`collibra.py:141-255`).
  * Route shape under a configurable per-product endpoint template
  * (reference default `/rest/2.0/dataproducts/{data_product}`):
  *
  *   - `GET  {product}/versions`      → version list; tolerated payload
  *     shapes: `{"data": [...]}`, `{"results": [...]}`,
  *     `{"versions": [...]}`, or a bare JSON array (`collibra.py:192-205`)
  *   - `GET  {product}/versions/{v}`  → one revision; the ODPS document
  *     may arrive bare or wrapped under `dataProduct` / `data`
  *     (`collibra.py:207-219`)
  *   - `GET  {product}/latest`        → 404 means "no revisions yet",
  *     not an error (`collibra.py:221-235`)
  *   - `PUT  {product}/versions/{v}`  with `{"dataProduct": <odps>}` —
  *     id and version are required before the wire is touched
  *     (`collibra.py:237-255`)
  *
  * Built on the JDK `HttpClient` like [[graft.service.HttpContractStore]];
  * the optional bearer token rides every request. Ids travel URL-encoded
  * in the path, so ids containing `/` or `:` round-trip unharmed. */
final class HttpCatalogAdapter(baseUrl: String,
                               token: Option[String] = None,
                               timeout: Duration = Duration.ofSeconds(10),
                               endpointTemplate: String = "/rest/2.0/dataproducts/{data_product}")
    extends CatalogDataProductAdapter {

  private val base = baseUrl.stripSuffix("/")
  private val template = endpointTemplate.stripSuffix("/")
  private val client = HttpClient.newBuilder().connectTimeout(timeout).build()

  /** Path-segment encoding: form-encoding's `+`-for-space is only valid
    * in query strings, so spaces go `%20` here. */
  private def enc(s: String) = URLEncoder.encode(s, "UTF-8").replace("+", "%20")

  private def productUrl(id: String, suffix: String): String =
    base + template.replace("{data_product}", enc(id)) + suffix

  private def request(url: String): HttpRequest.Builder = {
    val b = HttpRequest.newBuilder(URI.create(url)).timeout(timeout)
      .header("Accept", "application/json")
    token.fold(b)(t => b.header("Authorization", s"Bearer $t"))
  }

  private def send(req: HttpRequest): HttpResponse[String] =
    client.send(req, HttpResponse.BodyHandlers.ofString(StandardCharsets.UTF_8))

  /** 404 is a domain answer (absent product/revision); any other non-2xx
    * is a transport failure the caller must see — the
    * [[graft.service.HttpContractStore]] convention (the reference's
    * `raise_for_status`). */
  private def expect(r: HttpResponse[String]): HttpResponse[String] = {
    if (r.statusCode() / 100 != 2 && r.statusCode() != 404)
      throw new java.io.IOException(
        s"catalog ${r.uri()} answered HTTP ${r.statusCode()}: ${r.body()}")
    r
  }

  /** Unwrap `{"dataProduct": {...}}` / `{"data": {...}}` envelopes; a
    * bare ODPS object passes through (`collibra.py:214-219`). */
  private def unwrap(body: String): DataProduct = {
    val parsed = JsonMethods.parse(body)
    val doc = parsed match {
      case JObject(fs) =>
        val m = fs.toMap
        m.get("dataProduct").collect { case o: JObject => o }
          .orElse(m.get("data").collect { case o: JObject => o })
          .getOrElse(parsed)
      case other => other
    }
    DataProductJson.fromJValue(doc)
  }

  override def listVersions(id: String): Seq[String] = {
    val r = expect(send(request(productUrl(id, "/versions")).GET().build()))
    if (r.statusCode() == 404) return Nil
    def versions(v: JValue): Option[Seq[String]] = v match {
      case JArray(items) => Some(items.collect {
        case JString(s) => s
        case JInt(i)    => i.toString
      })
      case _ => None
    }
    JsonMethods.parse(r.body()) match {
      case JObject(fs) =>
        val m = fs.toMap
        // first recognised key wins, in the reference's probe order
        Seq("data", "results", "versions").iterator
          .flatMap(k => m.get(k).flatMap(versions)).nextOption().getOrElse(Nil)
      case arr => versions(arr).getOrElse(Nil)
    }
  }

  override def getDataProduct(id: String, version: String): Option[DataProduct] = {
    val r = expect(send(request(productUrl(id, s"/versions/${enc(version)}")).GET().build()))
    if (r.statusCode() == 404) None else Some(unwrap(r.body()))
  }

  override def latestDataProduct(id: String): Option[DataProduct] = {
    val r = expect(send(request(productUrl(id, "/latest")).GET().build()))
    if (r.statusCode() == 404) None else Some(unwrap(r.body()))
  }

  override def upsertDataProduct(product: DataProduct, status: Option[String]): Unit = {
    val id = product.id.trim
    val version = product.version.map(_.trim).getOrElse("")
    if (id.isEmpty || version.isEmpty)
      throw new IllegalArgumentException(
        "catalog data product payload requires id and version")
    // a payload-carried status wins; the lifecycle default only fills a blank
    val withStatus = if (product.status.trim.nonEmpty) product
      else status.filter(_.nonEmpty).fold(product)(s => product.copy(status = s))
    val body = JsonMethods.compact(JsonMethods.render(
      JObject("dataProduct" -> DataProductJson.toJValue(withStatus))))
    val r = send(request(productUrl(id, s"/versions/${enc(version)}"))
      .header("Content-Type", "application/json; charset=utf-8")
      .PUT(HttpRequest.BodyPublishers.ofString(body)).build())
    if (r.statusCode() / 100 != 2)
      throw new java.io.IOException(
        s"catalog ${r.uri()} answered HTTP ${r.statusCode()}: ${r.body()}")
  }
}
