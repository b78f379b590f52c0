package graft.service

import graft.{DemoContracts, SparkSpec}
import graft.contracts.FsContractStore
import graft.governance.GovernanceBackend
import graft.io.{ContractVersionLocator, GovernedIO}
import graft.products._
import graft.quality.FieldSnapshot

/** The remote service clients against a live facade: the data-product
  * client is a drop-in [[DataProductService]] (GovernedIO port IO runs
  * over the wire unchanged), the governance client ships observation
  * payloads and reads back recorded verdicts/history, and both carry
  * the bearer token. */
class HttpServiceClientsSpec extends SparkSpec {

  private def withServer[A](auth: Option[BearerAuth] = None)
                           (f: (String, FsContractStore, GovernanceBackend, DataProductBackend) => A): A = {
    val root = tmpDir("graft_rclients")
    val store = new FsContractStore(s"$root/contracts")
    val gov = new GovernanceBackend(s"$root/governance", Some(store))
    val pb = new DataProductBackend(s"$root/products")
    val server = new GovernanceHttpServer(store, gov, products = Some(pb), auth = auth)
    val port = server.start()
    try f(s"http://127.0.0.1:$port", store, gov, pb)
    finally server.stop()
  }

  test("data-product client round-trips the full lifecycle over the wire") {
    withServer() { (url, _, _, local) =>
      val remote = new HttpDataProductClient(url)

      assert(remote.latest("dp.orders").isEmpty)
      assert(remote.listDataProducts().total == 0)

      // registration runs on the SERVER: one authoritative draft sequence
      val r1 = remote.registerOutputPort("dp.orders",
        OutputPort("gold", "1.0.0", "sales.orders"),
        customProperties = Map("team" -> "data"))
      assert(r1.changed && r1.product.version.contains("0.1.0-draft"))
      // the server-side merge landed the extra property on the stored port
      assert(local.latest("dp.orders").get.findOutputPort("gold").get
        .customProperties("team") == "data")

      // the documented reference quirk survives the wire: an identical
      // BARE binding re-registered WITH properties re-drafts (comparison
      // uses the bare port; the stored one carries the merged props)
      val r2 = remote.registerOutputPort("dp.orders",
        OutputPort("gold", "1.0.0", "sales.orders"),
        customProperties = Map("team" -> "data"))
      assert(r2.changed && r2.product.version.contains("0.2.0-draft"))
      // ...and a truly identical payload (no props) is a no-op, exactly
      // like the local backend
      val r3 = remote.registerOutputPort("dp.orders",
        local.latest("dp.orders").get.findOutputPort("gold").get)
      assert(!r3.changed)

      val reviewed = remote.reviewDraft("dp.orders", "0.2.0-draft", approve = true)
      assert(reviewed.status == "active")
      assert(remote.latest("dp.orders").get.status == "active")
      assert(remote.listVersions("dp.orders") == Seq("0.1.0-draft", "0.2.0-draft"))
      assert(remote.resolveOutputContract("dp.orders", "gold")
        .contains(("sales.orders", "1.0.0")))
      assert(remote.listDataProducts().items == Seq("dp.orders"))

      // registerInputPort with provenance params
      val r4 = remote.registerInputPort("dp.consumer",
        InputPort("in", "1.0.0", "sales.orders"),
        sourceDataProduct = Some("dp.orders"), sourceOutputPort = Some("gold"))
      assert(r4.changed)
      assert(r4.product.findInputPort("in").get
        .customProperties("dc43.input.source_data_product") == "dp.orders")

      // direct put round-trip
      val doc = DataProduct(id = "dp.direct", version = Some("1.0.0"),
        status = "active", outputPorts = Seq(OutputPort("o", "2.0.0", "c.x")))
      remote.put(doc)
      assert(DataProductJson.toJson(remote.get("dp.direct", "1.0.0").get) ==
        DataProductJson.toJson(doc))
    }
  }

  test("GovernedIO port IO runs unchanged over the remote product client") {
    withServer() { (url, store, _, _) =>
      store.put(DemoContracts.lineitemAlign)
      val root = tmpDir("graft_rclients_io")
      val remote = new HttpDataProductClient(url)
      // products via the WIRE; no governance read-gate here — the raw
      // lineitem frame deliberately violates the slim contract's types
      // (the SkewSpec twin), and this test is about the product client
      val io = GovernedIO(store, ContractVersionLocator(spark, s"$root/lake"),
        Some(remote))
      val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")

      io.writePort(li, "dp.sales", "slim_out", "sales.lineitem_slim")
      assert(remote.resolveOutputContract("dp.sales", "slim_out")
        .contains(("sales.lineitem_slim", "0.3.0")))

      remote.registerInputPort("dp.consumer",
        InputPort("slim_in", "0.3.0", "sales.lineitem_slim"))
      val r = io.readPort(spark, "dp.consumer", "slim_in")
      assert(r.df.count() == li.count())
    }
  }

  test("governance client: observation evaluate, record, history, review") {
    withServer() { (url, store, _, _) =>
      val remote = new HttpGovernanceClient(url)
      val contract = DemoContracts.lineitemAlign
      store.put(contract)

      // expectation descriptors with SQL predicates
      val specs = remote.expectations(contract)
      assert(specs.nonEmpty && specs.exists(_.predicate.nonEmpty))

      // a clean observation payload evaluates ok and records nothing yet
      val okSchema = contract.properties.map(f =>
        f.name -> FieldSnapshot(f.odcsType, f.odcsType, nullable = !f.required)).toMap
      val verdict = remote.evaluate(contract, okSchema, Map("row_count" -> 10L))
      assert(verdict.ok, verdict.errors.mkString("; "))
      assert(remote.getStatus("ds.li", "v1").isEmpty)

      // evaluateAndRecord: verdict lands against (dataset, version).
      // ok=true can still record "warn" (expectations without shipped
      // metrics warn) — the point here is the ROUND TRIP, not the grade
      val eval = remote.evaluateAndRecord("ds.li", "v1", contract, okSchema,
        Map("row_count" -> 10L))
      assert(eval.ok && Set("ok", "warn").contains(eval.status.status))
      assert(remote.getStatus("ds.li", "v1").map(_.status).contains(eval.status.status))
      assert(remote.listDatasets() == Seq("ds.li"))
      assert(remote.statusMatrix().map(_.datasetId) == Seq("ds.li"))
      assert(remote.metricHistory("ds.li").exists(o =>
        o.key == "row_count" && o.valueNumeric.contains(10.0)))
      val recs = remote.datasetRecords(Some("ds.li"), None)
      assert(recs.size == 1 &&
        recs.head.status.map(_.status).contains(eval.status.status))

      // a violating payload blocks AND auto-drafts; review over the wire
      val badSchema = okSchema - contract.properties.head.name
      val bad = remote.evaluateAndRecord("ds.li", "v2", contract, badSchema,
        Map("row_count" -> 10L))
      assert(!bad.ok && bad.status.status == "block")
      assert(bad.draftVersions.nonEmpty)
      val draftV = bad.draftVersions.head
      assert(remote.listDraftVersions(contract.id).contains(draftV))
      assert(remote.reviewDraft(contract.id, draftV, approve = false)
        .status.contains("rejected"))

      // link round trip
      remote.linkDatasetContract("ds.li", contract.id, contract.version)
      assert(remote.linkedContract("ds.li").contains((contract.id, contract.version)))
    }
  }

  test("a facade without the products family fails LOUDLY, never no-ops") {
    // server with products = None: every /products route is a JDK-level
    // 404 — a mutation that swallowed it would be silent data loss, and
    // reviewDraft would parse the error body as a bogus product
    val root = tmpDir("graft_rclients_nop")
    val store = new FsContractStore(s"$root/contracts")
    val gov = new GovernanceBackend(s"$root/governance", Some(store))
    val server = new GovernanceHttpServer(store, gov)
    val port = server.start()
    try {
      val remote = new HttpDataProductClient(s"http://127.0.0.1:$port")
      intercept[java.io.IOException] {
        remote.put(DataProduct(id = "dp.x", version = Some("1.0.0")))
      }
      intercept[java.io.IOException] { remote.listVersions("dp.x") }
      intercept[java.io.IOException] { remote.listDataProducts() }
      intercept[java.io.IOException] { remote.reviewDraft("dp.x", "1.0.0", approve = true) }
    } finally server.stop()
  }

  test("observed-enum lists and boxed numerics survive the observation wire") {
    withServer() { (url, store, _, _) =>
      val remote = new HttpGovernanceClient(url)
      val contract = DemoContracts.lineitemAlign
      store.put(contract)
      val schema = contract.properties.map(f =>
        f.name -> FieldSnapshot(f.odcsType, f.odcsType, nullable = !f.required)).toMap
      // the value types graft's own metric producers emit: Seq[String]
      // observed-enum lists, java.math.BigDecimal from query rules
      val metrics: Map[String, Any] = Map(
        "row_count" -> 10L,
        "observed.enum_l_returnflag" -> Seq("Q", "Z"),
        "query.custom" -> new java.math.BigDecimal("1.25"))
      val eval = remote.evaluateAndRecord("ds.enum", "v1", contract, schema, metrics)
      assert(Set("ok", "warn", "block").contains(eval.status.status))
      assert(remote.getStatus("ds.enum", "v1").isDefined)
    }
  }

  test("a bare port body with a scalar 'port' extra attribute registers verbatim") {
    withServer() { (url, _, _, local) =>
      // a non-graft caller POSTs a BARE port whose unknown extra field is
      // named "port" — the wrapped-form discriminator requires an OBJECT
      // value, so this must register as a port, extra preserved
      val client = java.net.http.HttpClient.newHttpClient()
      val r = client.send(
        java.net.http.HttpRequest.newBuilder(
          java.net.URI.create(s"$url/products/register-input?id=dp.extra"))
          .header("Content-Type", "application/json")
          .POST(java.net.http.HttpRequest.BodyPublishers.ofString(
            """{"name":"gold","version":"1.0.0","contractId":"c.x","port":8080}"""))
          .build(),
        java.net.http.HttpResponse.BodyHandlers.ofString())
      assert(r.statusCode() == 200, r.body())
      val stored = local.latest("dp.extra").get.findInputPort("gold").get
      assert(stored.contractId == "c.x")
      assert(stored.extra.get("port").contains(org.json4s.JInt(8080)))
    }
  }

  test("clientsFromToml: the same pipeline code runs local and remote") {
    import ServiceBootstrap.ServiceClients
    // one pipeline, written against the traits only
    def pipeline(c: ServiceClients): String = {
      c.contracts.put(DemoContracts.lineitemAlign)
      val contract = DemoContracts.lineitemAlign
      val schema = contract.properties.map(f =>
        f.name -> FieldSnapshot(f.odcsType, f.odcsType, nullable = !f.required)).toMap
      val eval = c.governance.evaluateAndRecord("ds.p", "v1", contract, schema,
        Map("row_count" -> 5L))
      c.products.get.registerOutputPort("dp.p",
        OutputPort("gold", contract.version, contract.id))
      c.governance.linkDatasetContract("ds.p", contract.id, contract.version)
      s"${eval.status.status}|${c.governance.linkedContract("ds.p").get._1}|" +
        s"${c.products.get.resolveOutputContract("dp.p", "gold").get._1}"
    }

    val localRoot = tmpDir("graft_cboot_local")
    val local = ServiceBootstrap.clientsFromToml(
      s"""[contract_store]
         |root = "$localRoot/contracts"
         |[governance_store]
         |root = "$localRoot/governance"
         |[data_product]
         |root = "$localRoot/products"
         |""".stripMargin)
    val localOut = pipeline(local)

    val remoteOut = withServer(auth = Some(BearerAuth.token("tok"))) { (url, _, _, _) =>
      pipeline(ServiceBootstrap.clientsFromToml(
        s"""[remote]
           |base_url = "$url"
           |token = "tok"
           |""".stripMargin))
    }
    assert(localOut == remoteOut)

    // config hygiene: half-local half-remote, typo'd keys, missing url
    intercept[IllegalArgumentException] {
      ServiceBootstrap.clientsFromToml(
        "[remote]\nbase_url = \"http://x\"\n[contract_store]\nroot = \"/tmp/x\"\n")
    }
    intercept[IllegalArgumentException] {
      ServiceBootstrap.clientsFromToml("[remote]\nbase_urk = \"http://x\"\n")
    }
    intercept[IllegalArgumentException] {
      ServiceBootstrap.clientsFromToml("[remoat]\nbase_url = \"http://x\"\n")
    }
    val noUrl = intercept[IllegalArgumentException] {
      ServiceBootstrap.clientsFromToml("[remote]\ntoken = \"t\"\n")
    }
    assert(noUrl.getMessage.contains("base_url") &&
      !noUrl.getMessage.contains("filesystem"))
  }

  test("GovernedIO records through the remote governance client; link carries the dataset version") {
    withServer() { (url, store, localGov, _) =>
      store.put(DemoContracts.lineitemAlign)
      // capture what the SERVER-side link hooks receive
      val hooked = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
      localGov.addLinkHook((ds, dv, _, _) => hooked += ((ds, dv)))

      val root = tmpDir("graft_rgov_io")
      val remoteGov = new HttpGovernanceClient(url)
      val io = GovernedIO(new HttpContractStore(url),
        ContractVersionLocator(spark, s"$root/lake"), governance = Some(remoteGov))
      val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
      val aligned = graft.align.ApplyContract.align(li, DemoContracts.lineitemAlign)

      val res = io.write(aligned, "sales.lineitem_slim")
      assert(res.validation.ok)
      // the verdict was recorded over the wire and is readable back
      val ver = DemoContracts.lineitemAlign.version
      assert(remoteGov.getStatus("sales.lineitem_slim", ver)
        .map(_.status).contains("ok"))
      // the link hook on the SERVER saw the dataset version (wire pass-through)
      assert(hooked.contains(("sales.lineitem_slim", ver)))
    }
  }

  test("draft EDIT flow: propose -> edit over the wire -> approve -> resolution serves the edit") {
    withServer() { (url, store, _, _) =>
      val remote = new HttpGovernanceClient(url)
      val contract = DemoContracts.lineitemAlign
      store.put(contract)
      val okSchema = contract.properties.map(f =>
        f.name -> FieldSnapshot(f.odcsType, f.odcsType, nullable = !f.required)).toMap

      // PROPOSE: a violating payload auto-drafts on the server
      val bad = remote.evaluateAndRecord("ds.edit", "v1", contract,
        okSchema - contract.properties.head.name, Map("row_count" -> 10L))
      assert(bad.draftVersions.nonEmpty)
      val draftV = bad.draftVersions.head

      // EDIT over the wire: the reviewer rewrites the description AND
      // tries to smuggle a status flip, a version move, and an id move
      // in the body — the server pins all three (an edit can never
      // approve itself, mint a revision, or hop contracts)
      val draft = new HttpContractStore(url).get(contract.id, draftV).get
      val edited = draft.copy(id = "evil.id", version = "9.9.9",
        status = Some("active"), description = Some("edited by reviewer"))
      val stored = remote.updateDraft(contract.id, draftV, edited)
      assert(stored.id == contract.id && stored.version == draftV)
      assert(stored.status.contains("draft"))
      assert(stored.description.contains("edited by reviewer"))
      assert(store.get("evil.id", "9.9.9").isEmpty, "smuggled ids must not mint contracts")
      assert(remote.listDraftVersions(contract.id).contains(draftV)) // still in the queue

      // editing a non-draft revision fails loudly over the wire
      intercept[java.io.IOException] {
        remote.updateDraft(contract.id, contract.version, edited)
      }

      // APPROVE, then the read-resolution policy serves the EDITED text
      assert(remote.reviewDraft(contract.id, draftV, approve = true)
        .status.contains("active"))
      val io = GovernedIO(new HttpContractStore(url),
        ContractVersionLocator(spark, tmpDir("graft_editlake")),
        governance = Some(remote))
      val resolved = io.contractFor(contract.id)
      assert(resolved.version == draftV &&
        resolved.description.contains("edited by reviewer"),
        s"resolution must pick the approved edit, got ${resolved.version}")
    }
  }

  test("plan resolution routes: contract references and port bindings resolve like in-process") {
    withServer() { (url, store, gov, pb) =>
      val remote = new HttpGovernanceClient(url)
      val contract = DemoContracts.lineitemAlign
      store.put(contract)
      store.put(contract.copy(version = "9.0.0-draft", status = Some("draft")))

      // contract reference, no version: the SemVer-latest RELEASED
      // revision — the draft must not serve (the GovernedIO rule, run
      // server-side)
      val plan = remote.resolveReadPlan(contractId = Some(contract.id))
      assert(plan.contractId == contract.id &&
        plan.contractVersion == contract.version)
      assert(plan.contract.properties.nonEmpty) // the full ODCS travels
      assert(plan.datasetId == contract.id &&
        plan.datasetVersion == contract.version) // dataset falls back to the contract
      // dataset overrides pass through while the dataset is UNLINKED
      // (caller-asserted context, the first-run pipeline shape)
      val ds = remote.resolveWritePlan(contractId = Some(contract.id),
        dataset = Some("lake.lineitem"), datasetVersion = Some("2024-05"))
      assert(ds.datasetId == "lake.lineitem" && ds.datasetVersion == "2024-05")
      // ...but once the governance store records a link, a plan naming
      // that dataset under a DIFFERENT contract is a mis-binding: the
      // server must refuse rather than echo an authoritative-looking
      // plan with a dataset binding the store contradicts
      gov.linkDatasetContract("lake.lineitem", "other.contract", "1.0.0")
      intercept[java.io.IOException] {
        remote.resolveWritePlan(contractId = Some(contract.id),
          dataset = Some("lake.lineitem"))
      }
      // the link AGREEING with the resolved contract still passes
      gov.linkDatasetContract("lake.lineitem", contract.id, contract.version)
      val linked = remote.resolveWritePlan(contractId = Some(contract.id),
        dataset = Some("lake.lineitem"))
      assert(linked.datasetId == "lake.lineitem" &&
        linked.contractId == contract.id)
      // >= selector picks the highest satisfying non-draft version
      val sel = remote.resolveReadPlan(contractId = Some(contract.id),
        version = Some(">=0.0.1"))
      assert(sel.contractVersion == contract.version)
      // a product-port binding resolves through the bound output port
      pb.registerOutputPort("dp.lineitem",
        OutputPort("gold", contract.version, contract.id))
      val bound = remote.resolveReadPlan(product = Some("dp.lineitem"),
        port = Some("gold"))
      assert(bound.contractId == contract.id &&
        bound.contractVersion == contract.version)
      // unknown port fails loudly, 400 not a bogus plan
      intercept[java.io.IOException] {
        remote.resolveWritePlan(product = Some("dp.lineitem"), port = Some("nope"))
      }
      // missing both contractId and binding is a parameter error
      intercept[java.io.IOException] { remote.resolveReadPlan() }
    }
  }

  test("both clients carry the bearer token; anonymous calls fail loudly") {
    withServer(auth = Some(BearerAuth.token("tok"))) { (url, _, _, _) =>
      val products = new HttpDataProductClient(url, bearerToken = Some("tok"))
      assert(products.listDataProducts().total == 0)
      val gov = new HttpGovernanceClient(url, bearerToken = Some("tok"))
      assert(gov.listDatasets().isEmpty)

      intercept[java.io.IOException] {
        new HttpDataProductClient(url).listDataProducts()
      }
      intercept[java.io.IOException] {
        new HttpGovernanceClient(url).listDatasets()
      }
    }
  }
}
