package graft.products

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** The external-catalog seam (reference `collibra.py`): the stub adapter
  * drives the full registration lifecycle through the shared mixin, and
  * the HTTP adapter is exercised against an in-process fake catalog
  * serving the vendor route shape — envelope unwrapping, version-list
  * payload probing, bearer propagation, 404-as-absence, and the
  * end-to-end draft/review flow over a real socket. */
class CatalogAdapterSpec extends AnyFunSuite {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_catalog").toString

  private def outPort(contract: String, v: String) =
    OutputPort(name = "gold", version = v, contractId = contract)

  // ------------------------------------------------------------------
  // Stub adapter: lifecycle through the shared mixin
  // ------------------------------------------------------------------

  test("stub-backed catalog backend runs the full registration lifecycle") {
    val be = new CatalogDataProductBackend(new StubCatalogAdapter(tmp()))

    val r1 = be.registerOutputPort("dp.orders", outPort("sales.orders", "1.0.0"))
    assert(r1.changed)
    assert(r1.product.version.contains("0.1.0-draft"))
    assert(r1.product.status == "draft")

    // payload-identical port: no-op, no new revision
    val r2 = be.registerOutputPort("dp.orders", outPort("sales.orders", "1.0.0"))
    assert(!r2.changed)
    assert(be.listVersions("dp.orders") == Seq("0.1.0-draft"))

    // review approves the draft in place
    val active = be.reviewDraft("dp.orders", "0.1.0-draft", approve = true)
    assert(active.status == "active")

    // changed binding re-drafts from the reviewed revision
    val r3 = be.registerOutputPort("dp.orders", outPort("sales.orders", "1.1.0"))
    assert(r3.changed)
    assert(r3.product.version.contains("0.2.0-draft"))
    assert(be.resolveOutputContract("dp.orders", "gold").contains(("sales.orders", "1.1.0")))
  }

  test("catalog backend put requires a version and rejects bulk listings") {
    val be = new CatalogDataProductBackend(new StubCatalogAdapter(tmp()))
    intercept[IllegalArgumentException] { be.put(DataProduct(id = "dp.x")) }
    intercept[UnsupportedOperationException] { be.listDataProducts() }
  }

  test("a blank status defaults LOWERCASED — one casing from every path") {
    val be = new CatalogDataProductBackend(new StubCatalogAdapter(tmp()),
      defaultStatusValue = "Proposed")
    be.put(DataProduct(id = "dp.s", version = Some("1.0.0"), status = ""))
    assert(be.get("dp.s", "1.0.0").get.status == "proposed")
  }

  test("default status seeds a fresh product lowercased") {
    val be = new CatalogDataProductBackend(new StubCatalogAdapter(tmp()),
      defaultStatusValue = "Proposed")
    val r = be.registerInputPort("dp.in", InputPort("bronze", "1.0.0", "raw.events"))
    // a fresh product seeds from the (lowercased) default, but the draft
    // evolution still forces `draft` on the minted revision
    assert(r.product.status == "draft")
    assert(r.product.version.contains("0.1.0-draft"))
  }

  // ------------------------------------------------------------------
  // HTTP adapter against a fake vendor catalog
  // ------------------------------------------------------------------

  /** In-memory fake speaking the vendor route shape: versions under a
    * configurable envelope key, revision GETs wrapped in `data`, latest
    * wrapped in `dataProduct`, PUT expecting `{"dataProduct": ...}`. */
  private final class FakeCatalog(token: Option[String], versionsKey: String) {
    val stored = mutable.LinkedHashMap[(String, String), JValue]()
    private var server: HttpServer = _

    private def respond(ex: HttpExchange, code: Int, body: String): Unit = {
      val bytes = body.getBytes(StandardCharsets.UTF_8)
      ex.sendResponseHeaders(code, if (bytes.isEmpty) -1 else bytes.length)
      if (bytes.nonEmpty) ex.getResponseBody.write(bytes)
      ex.close()
    }

    def start(): Int = {
      server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
      server.createContext("/rest/2.0/dataproducts", (ex: HttpExchange) => {
        val auth = Option(ex.getRequestHeaders.getFirst("Authorization"))
        if (token.exists(t => !auth.contains(s"Bearer $t"))) respond(ex, 401, "")
        else {
          // raw segments so %2F-encoded ids stay one segment
          val segs = ex.getRequestURI.getRawPath.stripPrefix("/rest/2.0/dataproducts/")
            .split("/").toList.map(URLDecoder.decode(_, "UTF-8"))
          (ex.getRequestMethod, segs) match {
            case ("GET", id :: "versions" :: Nil) =>
              val vs = stored.keys.collect { case (i, v) if i == id => JString(v) }.toList
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                JObject(versionsKey -> JArray(vs)))))
            case ("GET", id :: "latest" :: Nil) =>
              stored.collect { case ((i, _), doc) if i == id => doc }.lastOption match {
                case Some(doc) => respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                  JObject("dataProduct" -> doc))))
                case None => respond(ex, 404, "")
              }
            case ("GET", id :: "versions" :: v :: Nil) =>
              stored.get((id, v)) match {
                case Some(doc) => respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                  JObject("data" -> doc))))
                case None => respond(ex, 404, "")
              }
            case ("PUT", id :: "versions" :: v :: Nil) =>
              val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
              JsonMethods.parse(body) match {
                case JObject(fs) => fs.toMap.get("dataProduct") match {
                  case Some(doc: JObject) =>
                    stored((id, v)) = doc
                    respond(ex, 200, """{"ok":true}""")
                  case _ => respond(ex, 400, "missing dataProduct envelope")
                }
                case _ => respond(ex, 400, "not an object")
              }
            case _ => respond(ex, 404, "")
          }
        }
      })
      server.start()
      server.getAddress.getPort
    }

    def stop(): Unit = if (server != null) server.stop(0)
  }

  private def withFake[A](token: Option[String] = None, versionsKey: String = "results")
                         (f: (String, FakeCatalog) => A): A = {
    val fake = new FakeCatalog(token, versionsKey)
    val port = fake.start()
    try f(s"http://127.0.0.1:$port", fake) finally fake.stop()
  }

  test("http adapter round-trips upsert/get/latest and probes the versions envelope") {
    withFake() { (url, fake) =>
      val adapter = new HttpCatalogAdapter(url)
      assert(adapter.latestDataProduct("dp.orders").isEmpty) // 404 -> None
      assert(adapter.listVersions("dp.orders").isEmpty)

      val p = DataProduct(id = "dp.orders", version = Some("1.0.0"), status = "active",
        outputPorts = Seq(outPort("sales.orders", "2.0.0")))
      adapter.upsertDataProduct(p, status = None)
      // the fake stored the enveloped document under id/version
      assert(fake.stored.contains(("dp.orders", "1.0.0")))

      // `data`-wrapped revision GET and `dataProduct`-wrapped latest both unwrap
      val back = adapter.getDataProduct("dp.orders", "1.0.0").get
      assert(DataProductJson.toJson(back) == DataProductJson.toJson(p))
      assert(adapter.latestDataProduct("dp.orders").map(_.version).contains(Some("1.0.0")))
      // versions arrive under the `results` key here
      assert(adapter.listVersions("dp.orders") == Seq("1.0.0"))
    }
  }

  test("http adapter requires id and version before touching the wire") {
    val adapter = new HttpCatalogAdapter("http://127.0.0.1:9") // nothing listens
    intercept[IllegalArgumentException] {
      adapter.upsertDataProduct(DataProduct(id = "dp.x"), None)
    }
    intercept[IllegalArgumentException] {
      adapter.upsertDataProduct(DataProduct(id = "", version = Some("1.0.0")), None)
    }
  }

  test("bearer token rides every request; a missing token is a loud transport error") {
    withFake(token = Some("s3cret")) { (url, _) =>
      val authed = new HttpCatalogAdapter(url, token = Some("s3cret"))
      authed.upsertDataProduct(
        DataProduct(id = "dp.sec", version = Some("1.0.0")), None)
      assert(authed.listVersions("dp.sec") == Seq("1.0.0"))

      val anon = new HttpCatalogAdapter(url)
      intercept[java.io.IOException] { anon.listVersions("dp.sec") }
    }
  }

  test("ids with separators survive the wire url-encoded in the path") {
    withFake() { (url, fake) =>
      val adapter = new HttpCatalogAdapter(url)
      val weird = DataProduct(id = "team a/dp:orders", version = Some("1.0.0"))
      adapter.upsertDataProduct(weird, None)
      assert(fake.stored.contains(("team a/dp:orders", "1.0.0")))
      assert(adapter.getDataProduct("team a/dp:orders", "1.0.0").map(_.id)
        .contains(weird.id))
      // the sanitised-colliding sibling stays distinct
      assert(adapter.getDataProduct("team a/dp_orders", "1.0.0").isEmpty)
    }
  }

  test("the registration lifecycle runs end to end over the http adapter") {
    withFake() { (url, _) =>
      val be = new CatalogDataProductBackend(new HttpCatalogAdapter(url))
      val r1 = be.registerOutputPort("dp.wire", outPort("sales.orders", "1.0.0"))
      assert(r1.changed && r1.product.version.contains("0.1.0-draft"))
      assert(be.reviewDraft("dp.wire", "0.1.0-draft", approve = true).status == "active")
      val r2 = be.registerOutputPort("dp.wire", outPort("sales.orders", "1.1.0"))
      assert(r2.product.version.contains("0.2.0-draft"))
      assert(be.listVersions("dp.wire") == Seq("0.1.0-draft", "0.2.0-draft"))
      assert(be.resolveOutputContract("dp.wire", "gold").contains(("sales.orders", "1.1.0")))
    }
  }
}
