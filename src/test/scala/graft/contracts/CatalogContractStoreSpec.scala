package graft.contracts

import com.sun.net.httpserver.{HttpExchange, HttpServer}
import graft.DemoContracts
import org.json4s._
import org.json4s.jackson.JsonMethods
import org.scalatest.funsuite.AnyFunSuite

import java.net.{InetSocketAddress, URLDecoder}
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** The external-catalog CONTRACT store seam (reference
  * `contracts/backend/stores/collibra.py`): the stub adapter drives the
  * full store surface offline, and the HTTP adapter is exercised against
  * an in-process fake catalog serving the vendor route shape — asset
  * placement mapping, envelope probing, status/updatedAt parsing, bearer
  * propagation, 404-as-absence, PATCH lifecycle flips, and failure-path
  * degradation. */
class CatalogContractStoreSpec extends AnyFunSuite {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_ccat").toString

  private def c(version: String, status: Option[String] = None) =
    DemoContracts.lineitem.copy(version = version, status = status)

  // ------------------------------------------------------------------
  // stub adapter: the full store surface, offline
  // ------------------------------------------------------------------

  test("stub-backed catalog store: put/get/list/latest/status lifecycle") {
    val adapter = new StubCatalogContractAdapter(tmp(),
      catalog = Map("sales.lineitem" -> ("dp.sales", "gold")))
    val store = new CatalogContractStore(adapter)

    // pre-registered placement is listed even before any version lands
    assert(store.listContractIds() == Seq("sales.lineitem"))

    store.put(c("1.0.0"))
    store.put(c("1.1.0-draft"))
    assert(store.listVersions("sales.lineitem").toSet == Set("1.0.0", "1.1.0-draft"))
    assert(store.get("sales.lineitem", "1.0.0").map(_.version).contains("1.0.0"))
    // graft semver order: the RELEASE outranks its own later draft's core?
    // no — 1.1.0-draft has a higher core; latest = highest, release-over-pre
    // within a core. 1.1.0-draft > 1.0.0.
    assert(store.latest("sales.lineitem").map(_.version).contains("1.1.0-draft"))

    // lifecycle flips through the adapter; latestValidated resolves the
    // HIGHEST validated revision, not the newest write
    adapter.updateStatus("sales.lineitem", "1.0.0", "Validated")
    assert(store.latestValidated("sales.lineitem").map(_.version).contains("1.0.0"))
    store.put(c("2.0.0"))
    adapter.updateStatus("sales.lineitem", "2.0.0", "Validated")
    adapter.updateStatus("sales.lineitem", "1.0.0", "Deprecated")
    assert(store.latestValidated("sales.lineitem").map(_.version).contains("2.0.0"))

    // a status flip against an unknown version is loud, never a silent insert
    intercept[IllegalArgumentException] {
      adapter.updateStatus("sales.lineitem", "9.9.9", "Validated")
    }
    // a version-less put is refused before the adapter is touched
    intercept[IllegalArgumentException] { store.put(c("")) }

    // the status filter narrows the visible chain (a consumer pipeline
    // pinned to Validated revisions)
    val validatedOnly = new CatalogContractStore(adapter,
      statusFilter = Some("Validated"))
    assert(validatedOnly.listVersions("sales.lineitem") == Seq("2.0.0"))
    assert(validatedOnly.latest("sales.lineitem").map(_.version).contains("2.0.0"))

    // summaries carry status + updatedAt for versions the adapter wrote
    val sums = adapter.listVersions("sales.lineitem")
    assert(sums.map(_.version) == Seq("1.0.0", "1.1.0-draft", "2.0.0"))
    assert(sums.find(_.version == "2.0.0").exists(s =>
      s.status == "Validated" && s.updatedAt.nonEmpty))
  }

  // ------------------------------------------------------------------
  // HTTP adapter against a fake vendor catalog
  // ------------------------------------------------------------------

  /** Fake speaking the per-port contract routes: versions list under a
    * configurable envelope, revision GETs wrapped in `contract`, PUT
    * expecting `{"status", "contract"}`, PATCH flipping status. */
  private final class FakeCatalog(token: Option[String], envelopeKey: String) {
    // (product, port, version) -> (status, odcs JValue)
    val stored = mutable.LinkedHashMap[(String, String, String), (String, JValue)]()
    var lastPutBody: String = ""
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
          val segs = ex.getRequestURI.getRawPath
            .stripPrefix("/rest/2.0/dataproducts/")
            .split("/").toList.map(URLDecoder.decode(_, "UTF-8"))
          (ex.getRequestMethod, segs) match {
            case (_, "boom" :: _) => respond(ex, 500, "catalog exploded")
            case ("GET", product :: "ports" :: port :: "contracts" :: Nil) =>
              val items = stored.collect {
                case ((p, pt, v), (status, _)) if p == product && pt == port =>
                  JObject("version" -> JString(v), "status" -> JString(status),
                    "updatedAt" -> JString("2026-08-15T10:00:00Z"))
              }.toList
              // one version-less item the client must SKIP, not crash on
              val noise = JObject("name" -> JString("not-a-version")) :: items
              respond(ex, 200, JsonMethods.compact(JsonMethods.render(
                if (envelopeKey == "bare") JArray(noise)
                else JObject(envelopeKey -> JArray(noise)))))
            case ("GET", product :: "ports" :: port :: "contracts" :: v :: Nil) =>
              stored.get((product, port, v)) match {
                case Some((_, doc)) => respond(ex, 200,
                  JsonMethods.compact(JsonMethods.render(JObject("contract" -> doc))))
                case None => respond(ex, 404, "")
              }
            case ("PUT", product :: "ports" :: port :: "contracts" :: v :: Nil) =>
              val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
              lastPutBody = body
              JsonMethods.parse(body) match {
                case JObject(fs) =>
                  val m = fs.toMap
                  (m.get("contract"), m.get("status")) match {
                    case (Some(doc: JObject), Some(JString(st))) =>
                      stored((product, port, v)) = (st, doc)
                      respond(ex, 200, """{"ok":true}""")
                    case _ => respond(ex, 400, "missing status/contract envelope")
                  }
                case _ => respond(ex, 400, "not an object")
              }
            case ("PATCH", product :: "ports" :: port :: "contracts" :: v :: Nil) =>
              val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
              val st = JsonMethods.parse(body) match {
                case JObject(fs) => fs.toMap.get("status").collect { case JString(s) => s }
                case _ => None
              }
              (stored.get((product, port, v)), st) match {
                case (Some((_, doc)), Some(s)) =>
                  stored((product, port, v)) = (s, doc)
                  respond(ex, 200, """{"ok":true}""")
                case (None, _) => respond(ex, 404, "")
                case _ => respond(ex, 400, "missing status")
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

  private def withFake[A](token: Option[String] = None, envelopeKey: String = "data")
                         (f: (String, FakeCatalog) => A): A = {
    val fake = new FakeCatalog(token, envelopeKey)
    val port = fake.start()
    try f(s"http://127.0.0.1:$port", fake) finally fake.stop()
  }

  private val placement = Map("sales.lineitem" -> ("dp sales", "gold/tier"))

  test("http adapter round-trips upsert/get/status through the asset placement") {
    withFake() { (url, fake) =>
      val adapter = new HttpCatalogContractAdapter(url, placement)
      assert(adapter.listContracts() == Seq("sales.lineitem"))
      assert(adapter.getContract("sales.lineitem", "1.0.0").isEmpty) // 404 -> None
      assert(intercept[IllegalArgumentException](adapter.listVersions("nowhere"))
        .getMessage.contains("not registered"))

      adapter.upsertContract(c("1.0.0"), "Draft")
      // the placement (with a space and a slash) reached the fake intact
      assert(fake.stored.keySet.contains(("dp sales", "gold/tier", "1.0.0")))
      // the wire payload is the reference's {"status", "contract"} envelope
      assert(fake.lastPutBody.contains("\"status\":\"Draft\"") &&
        fake.lastPutBody.contains("\"contract\":"))

      val back = adapter.getContract("sales.lineitem", "1.0.0").get
      assert(ContractJson.toJson(back) == ContractJson.toJson(c("1.0.0")))

      // PATCH flips lifecycle; summaries carry status + parsed updatedAt
      adapter.upsertContract(c("2.0.0"), "Draft")
      adapter.updateStatus("sales.lineitem", "2.0.0", "Validated")
      val sums = adapter.listVersions("sales.lineitem")
      assert(sums.map(_.version) == Seq("1.0.0", "2.0.0")) // version-less item skipped
      assert(sums.find(_.version == "2.0.0").exists(_.status == "Validated"))
      assert(sums.forall(_.updatedAt.nonEmpty), "ISO Z stamps must parse")

      // validated resolution: highest validated, not newest write
      adapter.upsertContract(c("3.0.0-draft"), "Draft")
      assert(adapter.getValidatedContract("sales.lineitem").map(_.version)
        .contains("2.0.0"))

      // the whole ContractStore surface over the wire
      val store = new CatalogContractStore(adapter, statusFilter = Some("Validated"))
      assert(store.listVersions("sales.lineitem") == Seq("2.0.0"))
      assert(store.latestValidated("sales.lineitem").map(_.version).contains("2.0.0"))
    }
  }

  test("http adapter tolerates every versions envelope the vendor emits") {
    for (key <- Seq("data", "results", "contracts", "bare")) {
      withFake(envelopeKey = key) { (url, _) =>
        val adapter = new HttpCatalogContractAdapter(url, placement)
        adapter.upsertContract(c("1.0.0"), "Draft")
        assert(adapter.listVersions("sales.lineitem").map(_.version) == Seq("1.0.0"),
          s"envelope $key")
      }
    }
  }

  test("http adapter failure paths: auth, unregistered ids, server faults") {
    withFake(token = Some("s3cret")) { (url, _) =>
      // bearer rides every request
      val authed = new HttpCatalogContractAdapter(url, placement, token = Some("s3cret"))
      authed.upsertContract(c("1.0.0"), "Draft")
      assert(authed.listVersions("sales.lineitem").map(_.version) == Seq("1.0.0"))
      // a wrong token is a transport failure the caller must see
      val anon = new HttpCatalogContractAdapter(url, placement)
      intercept[java.io.IOException] { anon.listVersions("sales.lineitem") }
      intercept[java.io.IOException] { anon.upsertContract(c("1.0.0"), "Draft") }
    }
    withFake() { (url, _) =>
      // unregistered contract: loud BEFORE the wire
      val adapter = new HttpCatalogContractAdapter(url, placement)
      val e = intercept[IllegalArgumentException] {
        adapter.getContract("unknown.id", "1.0.0")
      }
      assert(e.getMessage.contains("not registered"))
      // a 500 from the catalog throws with the body in the message
      val boom = new HttpCatalogContractAdapter(url,
        Map("x" -> ("boom", "port")))
      val io = intercept[java.io.IOException] { boom.listVersions("x") }
      assert(io.getMessage.contains("500") && io.getMessage.contains("catalog exploded"))
      // id/version are validated before the wire
      intercept[IllegalArgumentException] {
        adapter.upsertContract(c("1.0.0").copy(id = "  "), "Draft")
      }
    }
  }
}
