package graft.service

import graft.contracts._
import graft.governance.GovernanceBackend
import graft.products.{DataProductBackend, OutputPort}
import graft.quality.{Evaluator, FieldSnapshot}
import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}

/** The read-only browse pages (reference contracts-app list/detail
  * views): rendering is a pure function of the stores — asserted without
  * a socket — and the `/ui` routes ride the facade's dispatch and bearer
  * policy like any JSON route. */
class WebUiSpec extends AnyFunSuite {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_webui").toString

  private val contract = Contract(
    id = "sales.orders", version = "1.0.0", status = Some("active"),
    name = Some("Orders"),
    description = Some("""orders <script>alert(1)</script> & "stuff""""),
    schema = Seq(SchemaObjectDef("orders", Seq(
      FieldDef("o_orderkey", physicalType = Some("bigint"), required = true, unique = true),
      FieldDef("o_totalprice", physicalType = Some("decimal"),
        quality = Seq(QualityRule(mustBeGreaterOrEqualTo = Some(BigDecimal(0))))),
      FieldDef("o_status", physicalType = Some("string"),
        quality = Seq(QualityRule(rule = Some("enum"), values = Seq("O", "F", "P"))))))))

  private def fixture() = {
    val root = tmp()
    val store = new FsContractStore(s"$root/contracts")
    val gov = new GovernanceBackend(s"$root/governance", Some(store))
    val pb = new DataProductBackend(s"$root/products")
    store.put(contract)
    store.put(contract.copy(version = "1.1.0-draft", status = Some("draft"),
      customProperties = Map(
        "dataset_id" -> "ds.orders",
        "draft_change_log" -> "o_totalprice: type decimal -> double")))
    // one recorded ok verdict so dataset pages have a chain to show
    val res = Evaluator.evaluate(contract,
      Map(
        "o_orderkey" -> FieldSnapshot("bigint", "bigint", nullable = false),
        "o_totalprice" -> FieldSnapshot("decimal", "decimal", nullable = true),
        "o_status" -> FieldSnapshot("string", "string", nullable = true)),
      Map("row_count" -> 100L))
    gov.recordValidation("ds.orders", "2024-01", contract, res)
    pb.registerOutputPort("dp.orders", OutputPort("gold", "1.0.0", "sales.orders"))
    (store, gov, pb)
  }

  test("pages render lists, details, field rules and counters from the stores") {
    val (store, gov, pb) = fixture()
    val ui = new WebUi(store, gov, Some(pb))

    val home = ui.index()
    assert(home.contains("Contracts") && home.contains("<td>1</td>")) // one contract id
    assert(home.contains("Data products"))

    val list = ui.contractsPage()
    assert(list.contains("sales.orders"))
    assert(list.contains("/ui/contract?id=sales.orders"))

    val versions = ui.contractPage("sales.orders", None).get
    assert(versions.contains("1.0.0") && versions.contains("1.1.0-draft"))

    val detail = ui.contractPage("sales.orders", Some("1.0.0")).get
    assert(detail.contains("o_orderkey") && detail.contains("bigint"))
    assert(detail.contains("&gt;= 0"))                 // threshold rule rendered
    assert(detail.contains("in {O, F, P}"))            // enum rule rendered
    assert(detail.contains("ds.orders"))               // linked verdict shown

    val ds = ui.datasetPage("ds.orders").get
    assert(ds.contains("2024-01") && ds.contains("row_count"))

    // the review queue lists the stored draft revision with the recorded
    // change log (not the base contract's static description) and the
    // proposing dataset
    val drafts = ui.draftsPage()
    assert(drafts.contains("1.1.0-draft"))
    assert(drafts.contains("/ui/contract?id=sales.orders&version=1.1.0-draft"))
    assert(drafts.contains("o_totalprice: type decimal -&gt; double"))
    assert(drafts.contains("ds.orders"))

    val products = ui.productsPage().get
    assert(products.contains("dp.orders"))
    val product = ui.productPage("dp.orders").get
    assert(product.contains("gold") && product.contains("0.1.0-draft"))

    assert(ui.contractPage("nope", None).isEmpty)
    assert(ui.datasetPage("nope").isEmpty)
    assert(ui.productPage("nope").isEmpty)
  }

  test("validate/preview action: recorded observations re-evaluate against any revision") {
    val (store, gov, pb) = fixture()
    val ui = new WebUi(store, gov, Some(pb))

    // the detail page carries the validate form and a one-click link to
    // the recorded dataset version
    val detail = ui.contractPage("sales.orders", Some("1.0.0")).get
    assert(detail.contains("/ui/validate-contract"))
    assert(detail.contains("dataset=ds.orders") && detail.contains("datasetVersion=2024-01"))

    // clean: the snapshot matches the revision it was recorded under —
    // the page renders the SAME verdict the evaluator computes, every
    // schema row ok, no missing rows
    val snapshot = Map(
      "o_orderkey" -> FieldSnapshot("bigint", "bigint", nullable = false),
      "o_totalprice" -> FieldSnapshot("decimal", "decimal", nullable = true),
      "o_status" -> FieldSnapshot("string", "string", nullable = true))
    val clean = ui.validatePage("sales.orders", "1.0.0", "ds.orders", "2024-01").get
    val expected = Evaluator.evaluate(contract, snapshot, Map("row_count" -> 100.0))
    assert(clean.contains(s""">${expected.recordStatus}</span>"""))
    assert(clean.contains("""<span class="ok">ok</span>"""), "schema rows render ok")
    assert(!clean.contains("""<span class="block">missing</span>"""),
      "no missing-column row on the matching snapshot")
    assert(clean.contains("row_count")) // observed metrics table

    // violated: a DRAFT revision demanding a column the observed
    // snapshot lacks — the preview answers "this draft would block"
    // BEFORE anyone approves it
    val breaking = contract.copy(version = "2.0.0-draft", status = Some("draft"),
      schema = Seq(SchemaObjectDef("orders",
        contract.schema.head.properties :+
          FieldDef("o_clerk", physicalType = Some("string"), required = true))))
    store.put(breaking)
    val bad = ui.validatePage("sales.orders", "2.0.0-draft", "ds.orders", "2024-01").get
    val expectedBad = Evaluator.evaluate(breaking, snapshot, Map("row_count" -> 100.0))
    assert(!expectedBad.ok, "fixture must actually violate")
    assert(bad.contains(s""">${expectedBad.recordStatus}</span>"""))
    assert(bad.contains("<h3>errors</h3>"), "error rows render")
    assert(bad.contains("""<span class="block">missing</span>""") &&
      bad.contains("o_clerk"), "the schema diff names the missing column")

    // a record with NO schema snapshot (pre-persistence vintage): the
    // schema half goes vacuous — the page must NOT fabricate a block
    // verdict naming every column as missing
    gov.recordValidation("ds.orders", "2023-12", contract,
      graft.quality.ValidationResult(ok = true, Nil, Nil,
        Map("row_count" -> 50L), Map.empty))
    val vintage = ui.validatePage("sales.orders", "1.0.0", "ds.orders", "2023-12").get
    assert(vintage.contains("predates schema snapshots"))
    assert(!vintage.contains("""<span class="block">missing</span>"""),
      "no phantom missing-column rows without a snapshot")
    assert(!vintage.contains("<h3>errors</h3>"),
      "no fabricated schema errors without a snapshot")

    // nothing recorded for that version: a clear message, not a throw
    val none = ui.validatePage("sales.orders", "1.0.0", "ds.orders", "2099-01").get
    assert(none.contains("No recorded observations"))
    // unknown contract revision: 404 semantics
    assert(ui.validatePage("sales.orders", "9.9.9", "ds.orders", "2024-01").isEmpty)
    // the route rides the facade dispatcher
    assert(ui.render("/ui/validate-contract", Map("id" -> "sales.orders",
      "version" -> "1.0.0", "dataset" -> "ds.orders",
      "datasetVersion" -> "2024-01")).isDefined)
  }

  test("listing-unsupported product backends degrade, never 500") {
    // a catalog-backed facade throws UnsupportedOperationException from
    // listDataProducts (vendor catalogs page by asset query, not id
    // enumeration) — the landing page and nav must render without the
    // products counter/link, /ui/products must 404, and per-id product
    // pages must keep working
    val (store, gov, _) = fixture()
    val root = tmp()
    val catalog = new graft.products.CatalogDataProductBackend(
      new graft.products.StubCatalogAdapter(s"$root/catalog"))
    catalog.registerOutputPort("dp.cat", OutputPort("gold", "1.0.0", "sales.orders"))
    val ui = new WebUi(store, gov, Some(catalog))

    val home = ui.index() // must not throw
    assert(!home.contains("Data products"), "no counter and no nav link without listing")
    assert(ui.productsPage().isEmpty)
    assert(ui.render("/ui/products", Map.empty).isEmpty) // 404, not 500
    val product = ui.productPage("dp.cat").get            // per-id page still works
    assert(product.contains("gold"))
  }

  test("a backend whose listing probe FAILS (not just unsupported) degrades too") {
    // transient I/O from a remote catalog must not 500 the landing page:
    // the probe catches NonFatal — and because a FAILED lazy val
    // re-evaluates, letting it out would also re-run the probe on every
    // render. The flaky backend counts the probe calls to prove the
    // outcome memoizes.
    val (store, gov, pb) = fixture()
    var probes = 0
    val flaky = new graft.products.DataProductService {
      private val inner = pb
      def listDataProducts(limit: Option[Int] = None, offset: Int = 0) = {
        probes += 1
        throw new RuntimeException("connection reset by catalog")
      }
      def listVersions(id: String) = inner.listVersions(id)
      def get(id: String, version: String) = inner.get(id, version)
      def latest(id: String) = inner.latest(id)
      def put(p: graft.products.DataProduct) = inner.put(p)
      def registerInputPort(id: String, port: graft.products.InputPort,
          bump: String, customProperties: Map[String, String],
          sourceDataProduct: Option[String], sourceOutputPort: Option[String]) =
        inner.registerInputPort(id, port, bump, customProperties,
          sourceDataProduct, sourceOutputPort)
      def registerOutputPort(id: String, port: OutputPort, bump: String,
          customProperties: Map[String, String]) =
        inner.registerOutputPort(id, port, bump, customProperties)
      def reviewDraft(id: String, version: String, approve: Boolean) =
        inner.reviewDraft(id, version, approve)
      def resolveOutputContract(id: String, port: String) =
        inner.resolveOutputContract(id, port)
    }
    val ui = new WebUi(store, gov, Some(flaky))
    val home = ui.index() // must not throw
    assert(!home.contains("Data products"))
    ui.index(); ui.productsPage()
    assert(probes == 1, s"probe outcome must memoize, ran $probes times")
  }

  test("interpolated user text is HTML-escaped") {
    val (store, gov, pb) = fixture()
    val detail = new WebUi(store, gov, Some(pb)).contractPage("sales.orders", Some("1.0.0")).get
    assert(!detail.contains("<script>alert(1)</script>"))
    assert(detail.contains("&lt;script&gt;alert(1)&lt;/script&gt; &amp; &quot;stuff&quot;"))
  }

  test("user text containing newline-pipe sequences survives rendering intact") {
    // pages are built by concatenation, not stripMargin-after-interpolation:
    // a description like "step 1\n  |step 2" must keep its pipe
    val (store, gov, pb) = fixture()
    store.put(contract.copy(version = "2.0.0",
      description = Some("step 1\n  |step 2"), name = Some("multi\n|line")))
    val detail = new WebUi(store, gov, Some(pb)).contractPage("sales.orders", Some("2.0.0")).get
    assert(detail.contains("step 1\n  |step 2"))
    assert(detail.contains("multi\n|line"))
  }

  test("/ui routes serve html through the facade, 404 unknown paths, honour auth") {
    val (store, gov, pb) = fixture()
    val client = HttpClient.newHttpClient()
    def get(url: String, token: Option[String] = None): HttpResponse[String] = {
      val b = HttpRequest.newBuilder(URI.create(url))
      token.foreach(t => b.header("Authorization", s"Bearer $t"))
      client.send(b.GET().build(), HttpResponse.BodyHandlers.ofString())
    }

    val open = new GovernanceHttpServer(store, gov, products = Some(pb))
    val port = open.start()
    try {
      val r = get(s"http://127.0.0.1:$port/ui/contracts")
      assert(r.statusCode() == 200)
      assert(r.headers().firstValue("Content-Type").orElse("").startsWith("text/html"))
      assert(r.body().contains("sales.orders"))
      val detail = get(s"http://127.0.0.1:$port/ui/contract?id=sales.orders&version=1.0.0")
      assert(detail.statusCode() == 200 && detail.body().contains("o_orderkey"))
      assert(get(s"http://127.0.0.1:$port/ui/drafts").statusCode() == 200)
      assert(get(s"http://127.0.0.1:$port/ui/bogus").statusCode() == 404)
      assert(get(s"http://127.0.0.1:$port/ui/contract").statusCode() == 404) // id required
    } finally open.stop()

    val authed = new GovernanceHttpServer(store, gov, products = Some(pb),
      auth = Some(BearerAuth.token("hunter2")))
    val p2 = authed.start()
    try {
      assert(get(s"http://127.0.0.1:$p2/ui").statusCode() == 401)
      assert(get(s"http://127.0.0.1:$p2/ui", Some("hunter2")).statusCode() == 200)
    } finally authed.stop()
  }

  test("draft edit workspace: form round-trip edit -> save -> approve through the browser routes") {
    val (store, gov, pb) = fixture() // 1.1.0-draft is already in the store
    val client = HttpClient.newHttpClient()
    val server = new GovernanceHttpServer(store, gov, products = Some(pb))
    val port = server.start()
    def get(path: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
    def postForm(path: String, fields: Map[String, String]): HttpResponse[String] = {
      val body = fields.map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }.mkString("&")
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    }
    try {
      // the review queue links to the edit workspace
      assert(get("/ui/drafts").body().contains("/ui/draft-edit?id=sales.orders"))
      // the form pre-fills the draft's ODCS JSON
      val form = get("/ui/draft-edit?id=sales.orders&version=1.1.0-draft")
      assert(form.statusCode() == 200 && form.body().contains("name=\"json\""))
      assert(form.body().contains("o_totalprice"))
      // save an edit (description changed; a smuggled active status is pinned back)
      val draft = store.get("sales.orders", "1.1.0-draft").get
      val edited = graft.contracts.ContractJson.toJson(
        draft.copy(description = Some("edited via the workspace"), status = Some("active")))
      val saved = postForm("/ui/draft-edit?id=sales.orders&version=1.1.0-draft",
        Map("json" -> edited))
      assert(saved.statusCode() == 303,
        s"expected post/redirect/get, got ${saved.statusCode()}: ${saved.body()}")
      val after = store.get("sales.orders", "1.1.0-draft").get
      assert(after.description.contains("edited via the workspace"))
      assert(after.status.contains("draft"), "an edit must not self-approve")
      // approve through the form route; redirect lands on the (now empty) queue
      val approved = postForm(
        "/ui/draft-review?id=sales.orders&version=1.1.0-draft&approve=true", Map.empty)
      assert(approved.statusCode() == 303)
      assert(store.get("sales.orders", "1.1.0-draft").get.status.contains("active"))
      // a reviewed revision no longer has an edit workspace
      assert(get("/ui/draft-edit?id=sales.orders&version=1.1.0-draft").statusCode() == 404)
      // malformed form JSON is a 400, not a 500
      assert(postForm("/ui/draft-edit?id=sales.orders&version=1.1.0-draft",
        Map("json" -> "{nope")).statusCode() == 400)
    } finally server.stop()
  }

  test("authoring forms: create -> draft -> edit -> approve -> resolve round trip") {
    val (store, gov, pb) = fixture()
    val ui = new WebUi(store, gov, Some(pb))

    // the forms render with their starter documents and are linked from
    // the listings
    assert(ui.contractsPage().contains("/ui/new-contract"))
    assert(ui.productsPage().get.contains("/ui/new-product"))
    assert(ui.newContractPage().contains("1.0.0"))
    assert(ui.newProductPage().get.contains("0.1.0"))

    // CREATE a brand-new contract from submitted ODCS JSON
    val odcs = graft.contracts.ContractJson.toJson(Contract(
      id = "mkt.leads", version = "1.0.0", status = Some("active"),
      schema = Seq(SchemaObjectDef("mkt.leads", Seq(
        FieldDef("lead_id", physicalType = Some("bigint"),
          required = true, unique = true),
        FieldDef("score", physicalType = Some("double")))))))
    val created = ui.createContract(odcs)
    assert(created.isRight, created)
    assert(store.get("mkt.leads", "1.0.0").nonEmpty)

    // validation semantics (the reference's editing=False gate): a
    // duplicate (id, version) is refused, bad semver is refused, broken
    // JSON is refused — each with a message for the form to re-render
    assert(ui.createContract(odcs).left.exists(_.contains("already has a version")))
    assert(ui.createContract(odcs.replace("\"1.0.0\"", "\"one.oh\""))
      .left.exists(_.contains("semantic version")))
    assert(ui.createContract("{nope").left.exists(_.contains("invalid contract JSON")))
    assert(store.listVersions("mkt.leads") == Seq("1.0.0"), "failed creates must not mint")

    // DRAFT: a violating observation payload against the new contract
    // auto-proposes a draft through governance
    val badEval = gov.evaluateAndRecord("lake.leads", "v1",
      store.get("mkt.leads", "1.0.0").get,
      Map("score" -> graft.quality.FieldSnapshot("double", "double", nullable = true)),
      Map("row_count" -> 10L)) // lead_id missing from the observed schema
    assert(badEval.draftVersions.nonEmpty)
    val draftV = badEval.draftVersions.head

    // EDIT through the workspace method, APPROVE through review
    val draft = store.get("mkt.leads", draftV).get
    gov.updateDraft("mkt.leads", draftV,
      draft.copy(description = Some("authored then amended")))
    assert(gov.reviewDraft("mkt.leads", draftV, approve = true)
      .status.contains("active"))

    // RESOLVE: the read-resolution policy now serves the approved edit
    val resolved = graft.io.GovernedIO.resolveContract(store, "mkt.leads", None)
    assert(resolved.version == draftV &&
      resolved.description.contains("authored then amended"),
      s"resolution must serve the approved authored contract, got ${resolved.version}")

    // product authoring: create, duplicate refusal, no-service degrade
    val odps = graft.products.DataProductJson.toJson(
      graft.products.DataProduct(id = "dp.leads", version = Some("0.1.0"),
        outputPorts = Seq(OutputPort("gold", "1.0.0", "mkt.leads"))))
    assert(ui.createProduct(odps).isRight)
    assert(pb.get("dp.leads", "0.1.0").nonEmpty)
    assert(ui.createProduct(odps).left.exists(_.contains("already has a version")))
    val noProducts = new WebUi(store, gov, None)
    assert(noProducts.newProductPage().isEmpty) // 404, like the reference's 503
    assert(noProducts.createProduct(odps).left.exists(_.contains("no data-product")))
  }

  test("edit-as-new-version: released contracts edit forward, never in place") {
    val (store, gov, pb) = fixture() // sales.orders 1.0.0 active + 1.1.0-draft
    val ui = new WebUi(store, gov, Some(pb))

    // the detail page routes released revisions to the edit form and
    // drafts to the workspace
    assert(ui.contractPage("sales.orders", Some("1.0.0")).get
      .contains("/ui/edit-contract?id=sales.orders&version=1.0.0"))
    assert(ui.contractPage("sales.orders", Some("1.1.0-draft")).get
      .contains("/ui/draft-edit?id=sales.orders"))

    // the form pre-fills the stored revision with the NEXT patch version
    val form = ui.editContractPage("sales.orders", "1.0.0").get
    assert(form.contains("1.0.1") && form.contains("o_orderkey"))
    assert(form.contains("Create new version"), "the edit form's action is labeled")
    assert(ui.editContractPage("nope", "1.0.0").isEmpty)
    // a draft base 404s here too — rendering a form every submit refuses
    // would be a dead end; drafts edit through the review workspace
    assert(ui.editContractPage("sales.orders", "1.1.0-draft").isEmpty)

    // a valid edit mints the new version; the base stays untouched
    val edited = graft.contracts.ContractJson.toJson(
      contract.copy(version = "1.0.1", description = Some("edited forward")))
    assert(ui.editContract("sales.orders", "1.0.0", edited).isRight)
    assert(store.get("sales.orders", "1.0.1").exists(
      _.description.contains("edited forward")))
    assert(store.get("sales.orders", "1.0.0").exists(
      _.description != Some("edited forward")), "the base revision is immutable")

    // the reference's editing=True gates: id pinned, version strictly
    // greater than the base, no overwrite of a stored version
    assert(ui.editContract("sales.orders", "1.0.0",
      edited.replace("sales.orders", "evil.id"))
      .left.exists(_.contains("cannot be changed")))
    assert(ui.editContract("sales.orders", "1.0.0",
      graft.contracts.ContractJson.toJson(contract.copy(version = "1.0.0")))
      .left.exists(_.contains("must be greater")))
    assert(ui.editContract("sales.orders", "1.0.0",
      graft.contracts.ContractJson.toJson(contract.copy(version = "0.9.0")))
      .left.exists(_.contains("must be greater")))
    assert(ui.editContract("sales.orders", "1.0.0", edited)
      .left.exists(_.contains("already stored")))

    // the base must EXIST, and a draft base is routed to its own
    // workflow (minting a released revision from an unapproved draft
    // would bypass review)
    assert(ui.editContract("nope", "1.0.0", edited)
      .left.exists(_.contains("unknown base revision")))
    assert(ui.editContract("sales.orders", "1.1.0-draft",
      graft.contracts.ContractJson.toJson(contract.copy(version = "1.2.0")))
      .left.exists(_.contains("draft workspace")))
    // a blank id cannot sneak through the edit path either (the shared
    // validation tail carries createContract's gate)
    assert(ui.editContract(" ", "1.0.0", edited) // base " " doesn't exist
      .left.exists(_.contains("unknown base revision")))

    // FULL semver order: promoting a pre-release base to its release
    // version is a legal edit (release > pre-release), and the release
    // number is not skipped
    store.put(contract.copy(version = "2.0.0-rc.1", status = Some("active")))
    assert(ui.editContract("sales.orders", "2.0.0-rc.1",
      graft.contracts.ContractJson.toJson(contract.copy(version = "2.0.0"))).isRight)
    assert(store.get("sales.orders", "2.0.0").nonEmpty)
  }

  test("authoring form routes over the facade: 303 on success, error re-render keeps the text") {
    val (store, gov, pb) = fixture()
    val client = HttpClient.newHttpClient()
    val server = new GovernanceHttpServer(store, gov, products = Some(pb))
    val port = server.start()
    def postForm(path: String, fields: Map[String, String]): HttpResponse[String] = {
      val body = fields.map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }.mkString("&")
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    }
    def get(path: String): HttpResponse[String] =
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .GET().build(), HttpResponse.BodyHandlers.ofString())
    try {
      assert(get("/ui/new-contract").statusCode() == 200)
      val odcs = graft.contracts.ContractJson.toJson(
        contract.copy(id = "ops.events", version = "1.0.0"))
      val ok = postForm("/ui/new-contract", Map("json" -> odcs))
      assert(ok.statusCode() == 303)
      assert(ok.headers().firstValue("Location").orElse("")
        .startsWith("/ui/contract?id=ops.events"))
      assert(store.get("ops.events", "1.0.0").nonEmpty)
      // failed validation re-renders the form WITH the submitted text
      val dup = postForm("/ui/new-contract", Map("json" -> odcs))
      assert(dup.statusCode() == 200)
      assert(dup.body().contains("already has a version"))
      assert(dup.body().contains("ops.events"), "the operator's text must survive")
      // edit-as-new-version over the wire: 303 to the minted revision
      val forward = postForm("/ui/edit-contract?id=ops.events&version=1.0.0",
        Map("json" -> odcs.replace("\"1.0.0\"", "\"1.0.1\"")))
      assert(forward.statusCode() == 303 &&
        store.get("ops.events", "1.0.1").nonEmpty)
      // an in-place overwrite attempt re-renders with the gate message
      val inPlace = postForm("/ui/edit-contract?id=ops.events&version=1.0.0",
        Map("json" -> odcs))
      assert(inPlace.statusCode() == 200 &&
        inPlace.body().contains("must be greater"))
      // product create over the wire
      val odps = graft.products.DataProductJson.toJson(
        graft.products.DataProduct(id = "dp.events", version = Some("0.1.0")))
      val pok = postForm("/ui/new-product", Map("json" -> odps))
      assert(pok.statusCode() == 303 && pb.get("dp.events", "0.1.0").nonEmpty)
    } finally server.stop()

    // with NO product service, the product form POST is a 404 (the
    // resource does not exist), matching the GET route — never a 200
    // with an error body a script would read as success
    val bare = new GovernanceHttpServer(store, gov, products = None)
    val p2 = bare.start()
    try {
      val r = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$p2/ui/new-product"))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString("json=%7B%7D")).build(),
        HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 404)
    } finally bare.stop()
  }

  test("setup wizard round trip: form -> review -> zip export of the reviewed files") {
    val (store, gov, pb) = fixture()
    val client = HttpClient.newHttpClient()
    val server = new GovernanceHttpServer(store, gov, products = Some(pb))
    val port = server.start()
    def postForm(path: String, fields: Map[String, String]): HttpResponse[String] = {
      val body = fields.map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }.mkString("&")
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    }
    try {
      val form = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/ui/setup"))
          .GET().build(), HttpResponse.BodyHandlers.ofString())
      assert(form.statusCode() == 200 && form.body().contains("pipeline runtime"))
      // review lists the generated files and carries the export FORM —
      // a POST of hidden fields, so the API token never rides a URL
      val fields = Map(
        "runtime" -> "streaming", "data_root" -> "/srv/graft",
        "token" -> "s3cr3t-tok",
        "module__contracts" -> "on", "module__data_quality" -> "on")
      val review = postForm("/ui/setup", fields)
      assert(review.statusCode() == 200)
      assert(review.body().contains("StreamMain.scala"), "streaming entrypoint listed")
      assert(review.body().contains("config.toml"))
      assert(review.body().contains("action=\"/ui/setup/export\""))
      assert(!review.body().contains("/ui/setup/export?"),
        "no GET export link — selections (incl. the token) must POST")
      assert(!review.body().contains("s3cr3t-tok") ||
        review.body().contains("type=\"password\""),
        "the token may round-trip only as a password-typed form field")
      assert(!review.body().contains("type=\"hidden\" name=\"token\""),
        "a hidden-typed token sits autofill/history-readable in the DOM")
      // the wizard's own token input is password-typed with autofill off
      assert(form.body().contains("type=\"password\" autocomplete=\"off\" name=\"token\""))
      // the export IS the reviewed selection, as a zip
      val exportFields = Map("runtime" -> "streaming",
        "data_root" -> "/srv/graft", "token" -> "s3cr3t-tok",
        "modules" -> "contracts,data_quality")
      val body = exportFields.map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }.mkString("&")
      val zip = client.send(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/ui/setup/export"))
          .header("Content-Type", "application/x-www-form-urlencoded")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofByteArray())
      assert(zip.statusCode() == 200)
      assert(zip.headers().firstValue("Content-Type").orElse("") == "application/zip")
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(zip.body()))
      var entries = Map.empty[String, String]
      var e = zin.getNextEntry
      while (e != null) {
        entries += e.getName -> new String(zin.readAllBytes(), "UTF-8")
        e = zin.getNextEntry
      }
      assert(entries.keySet.exists(_.endsWith("StreamMain.scala")))
      assert(entries.exists { case (n, c) =>
        n.endsWith("config.toml") && c.contains("/srv/graft") },
        "the service config must carry the chosen data root")
      assert(entries.keySet.exists(_.endsWith("ExampleMain.scala")),
        "ticked modules must export the example")
      assert(entries("pipeline_example/ExampleMain.scala").contains("contracts"))
      // the zip documents its own executable-bit gap: UNPACK.txt names
      // every launcher the JDK zip writer had to flatten to 644
      assert(entries.get("UNPACK.txt").exists(c =>
        c.contains("chmod +x") && c.contains(".sh")),
        s"UNPACK.txt must restore the executable bits, entries: ${entries.keySet}")
      assert(entries.exists { case (n, c) =>
        c.contains("s3cr3t-tok") && n.endsWith("config.toml") },
        "the token must reach the exported service config")
      // a bad runtime re-renders the form with the error, and the
      // export route answers 422, never a half-built zip
      val bad = postForm("/ui/setup", Map("runtime" -> "flink"))
      assert(bad.statusCode() == 200 &&
        bad.body().contains("unknown pipeline runtime"))
      val badExport = postForm("/ui/setup/export", Map("runtime" -> "flink"))
      assert(badExport.statusCode() == 422)
    } finally server.stop()
  }

  test("integration helper renders the stub with the chosen ids inline") {
    val (store, gov, pb) = fixture()
    val ui = new WebUi(store, gov, Some(pb))
    // picker alone: form options from the stores, no stub yet
    val picker = ui.integrationHelperPage()
    assert(picker.contains("sales.orders:1.0.0") && !picker.contains("<pre>"))
    val productVersion = pb.listVersions("dp.orders").head
    val rendered = ui.integrationHelperPage(Map(
      "contract" -> "sales.orders:1.0.0",
      "product" -> s"dp.orders:$productVersion",
      "integration" -> "spark",
      "module__contracts" -> "on", "module__products" -> "on"))
    assert(rendered.contains("val ContractId      = &quot;sales.orders&quot;"),
      "the chosen contract id must be INLINE in the stub")
    assert(rendered.contains("val ContractVersion = &quot;1.0.0&quot;"))
    assert(rendered.contains("val DataProductId   = &quot;dp.orders&quot;"))
    assert(rendered.contains("reviewContractVersions"),
      "ticked modules select the helper bodies")
    assert(!rendered.contains("runQualityChecks"),
      "unticked modules stay out")
    // unknown revision: loud, no stub
    val unknown = ui.integrationHelperPage(Map("contract" -> "sales.orders:9.9.9"))
    assert(unknown.contains("unknown contract revision") && !unknown.contains("<pre>"))
    // a deliberate all-unticked submission (hidden `picked` marker sent,
    // no module boxes) renders a helper-free stub — NOT the every-module
    // default the first visit shows
    val none = ui.integrationHelperPage(Map(
      "contract" -> "sales.orders:1.0.0", "picked" -> "1"))
    assert(none.contains("<pre>") && !none.contains("reviewContractVersions") &&
      !none.contains("runQualityChecks"),
      "unticking every module must not silently select all of them")
  }

  test("product edit-as-new-version: create -> edit -> review round trip with semver gates") {
    val (store, gov, pb) = fixture()
    val ui = new WebUi(store, gov, Some(pb))
    val base = graft.products.DataProduct(id = "dp.edit", version = Some("1.0.0"))
    assert(ui.createProduct(graft.products.DataProductJson.toJson(base)).isRight)
    // the form pre-fills the stored JSON with the next patch seeded
    val form = ui.editProductPage("dp.edit", "1.0.0").get
    assert(form.contains("1.0.1") && form.contains("Create new version"))
    assert(ui.editProductPage("dp.edit", "9.9.9").isEmpty, "unknown base 404s")
    // gates: id pinned, semver only, strictly forward, never overwrite
    def json(id: String, v: String) = graft.products.DataProductJson.toJson(
      graft.products.DataProduct(id = id, version = Some(v)))
    assert(ui.editProduct("dp.edit", "1.0.0", json("dp.other", "1.0.1"))
      .swap.exists(_.contains("cannot be changed")))
    assert(ui.editProduct("dp.edit", "1.0.0", json("dp.edit", "not-a-version"))
      .swap.exists(_.contains("not a semantic version")))
    assert(ui.editProduct("dp.edit", "1.0.0", json("dp.edit", "1.0.0"))
      .swap.exists(_.contains("must be greater")))
    val minted = ui.editProduct("dp.edit", "1.0.0", json("dp.edit", "1.1.0"))
    assert(minted.isRight && pb.get("dp.edit", "1.1.0").nonEmpty)
    assert(ui.editProduct("dp.edit", "1.0.0", json("dp.edit", "1.1.0"))
      .swap.exists(_.contains("already has a version")))
    // the detail page links every version's edit form (the review step)
    val detail = ui.productPage("dp.edit").get
    assert(detail.contains("/ui/edit-product?id=dp.edit&version=1.0.0"))
    assert(detail.contains("1.1.0"))
    // and over the wire: 303 to the product page, error re-render keeps text
    val client = HttpClient.newHttpClient()
    val server = new GovernanceHttpServer(store, gov, products = Some(pb))
    val port = server.start()
    def postForm(path: String, fields: Map[String, String]): HttpResponse[String] = {
      val body = fields.map { case (k, v) =>
        k + "=" + java.net.URLEncoder.encode(v, "UTF-8") }.mkString("&")
      client.send(HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port$path"))
        .header("Content-Type", "application/x-www-form-urlencoded")
        .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.ofString())
    }
    try {
      val ok = postForm("/ui/edit-product?id=dp.edit&version=1.1.0",
        Map("json" -> json("dp.edit", "1.2.0")))
      assert(ok.statusCode() == 303 &&
        ok.headers().firstValue("Location").orElse("") == "/ui/product?id=dp.edit")
      assert(pb.get("dp.edit", "1.2.0").nonEmpty)
      val gate = postForm("/ui/edit-product?id=dp.edit&version=1.1.0",
        Map("json" -> json("dp.edit", "1.0.5")))
      assert(gate.statusCode() == 200 && gate.body().contains("must be greater"))
    } finally server.stop()
  }
}
