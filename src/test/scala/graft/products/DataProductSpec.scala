package graft.products

import org.json4s._
import org.scalatest.funsuite.AnyFunSuite

class DataProductSpec extends AnyFunSuite {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_dp").toString

  test("model JSON round-trips the full ODPS surface") {
    val p = DataProduct(
      id = "dp.sales", status = "active", version = Some("1.2.0"),
      name = Some("Sales"),
      description = Some(JObject("en" -> JString("sales mart"),
        "purpose" -> JString("reporting"))),
      inputPorts = Seq(InputPort("orders_in", "1.0.0", "sales.orders",
        Map("dc43.input.source_data_product" -> "dp.upstream"),
        authoritativeDefinitions = Seq(JObject(
          "url" -> JString("https://example.com/def"), "type" -> JString("businessDefinition"))),
        extra = Map("x-custom" -> JString("passthrough")))),
      outputPorts = Seq(OutputPort("gold_orders", "2.0.0", "sales.orders_gold",
        description = Some("curated"), portType = Some("tables"),
        sbom = Seq(JObject("type" -> JString("library"), "name" -> JString("graft"))),
        inputContracts = Seq(JObject("contractId" -> JString("sales.orders"),
          "version" -> JString("1.0.0"))),
        customProperties = Map("tier" -> "gold"))),
      customProperties = Map("owner" -> "team-data"),
      tags = Seq("gold", "sales"),
      extra = Map("x-unknown" -> JObject("nested" -> JBool(true))))
    assert(DataProductJson.fromJson(DataProductJson.toJson(p)) == p)
  }

  test("unknown fields written by a newer ODPS revision survive a round-trip") {
    val doc = """{"apiVersion":"1.0.0","id":"dp.z","status":"draft",
      "supportChannels":[{"channel":"slack"}],
      "outputPorts":[{"name":"o","version":"1.0.0","contractId":"c",
        "futureField":{"a":1}}]}"""
    val p = DataProductJson.fromJson(doc)
    assert(p.extra.contains("supportChannels"))
    assert(p.outputPorts.head.extra.contains("futureField"))
    val again = DataProductJson.fromJson(DataProductJson.toJson(p))
    assert(again == p)
  }

  test("apiVersion gate: mismatch rejected, blank defaults, legacy v-prefix normalised") {
    intercept[IllegalArgumentException](
      DataProductJson.fromJson("""{"apiVersion":"2.0.0","id":"dp.a","status":"draft"}"""))
    assert(DataProductJson.fromJson("""{"id":"dp.a","status":"draft"}""")
      .apiVersion == DataProduct.OdpsRequired)
    // graft's own pre-1.0 files wrote v1.0.0
    assert(DataProductJson.fromJson("""{"apiVersion":"v1.0.0","id":"dp.a"}""")
      .apiVersion == "1.0.0")
  }

  test("port registration evolves -draft revisions with minor bumps; idempotent re-registration") {
    val be = new DataProductBackend(tmp())
    val r1 = be.registerInputPort("dp.x", InputPort("in", "1.0.0", "c.in"))
    assert(r1.changed && r1.product.version.contains("0.1.0-draft") && r1.product.status == "draft")
    // identical payload: no change, no new version
    val r2 = be.registerInputPort("dp.x", InputPort("in", "1.0.0", "c.in"))
    assert(!r2.changed)
    assert(be.listVersions("dp.x") == Seq("0.1.0-draft"))
    // new output port bumps again (pre-release tag stripped before the bump)
    val r3 = be.registerOutputPort("dp.x", OutputPort("out", "1.0.0", "c.out"))
    assert(r3.changed && r3.product.version.contains("0.2.0-draft"))
    // rebinding an existing port to a new contract version bumps and replaces
    val r4 = be.registerInputPort("dp.x", InputPort("in", "2.0.0", "c.in"))
    assert(r4.changed && r4.product.version.contains("0.3.0-draft"))
    assert(r4.product.inputPorts == Seq(InputPort("in", "2.0.0", "c.in")))
  }

  test("ensure-port compares the FULL payload, not just the contract binding") {
    val base = DataProduct(id = "dp.e",
      outputPorts = Seq(OutputPort("out", "1.0.0", "c.out", description = Some("v1"))))
    // same binding, changed description → replacement
    val (p2, changed) = base.ensureOutputPort(
      OutputPort("out", "1.0.0", "c.out", description = Some("v2")))
    assert(changed && p2.findOutputPort("out").get.description.contains("v2"))
    // byte-identical payload → no-op
    assert(!p2.ensureOutputPort(
      OutputPort("out", "1.0.0", "c.out", description = Some("v2")))._2)
    // replacement preserves port ORDER (reference rebuilds the list in place)
    val multi = DataProduct(id = "dp.o", inputPorts = Seq(
      InputPort("a", "1.0.0", "c.a"), InputPort("b", "1.0.0", "c.b")))
    val (m2, _) = multi.ensureInputPort(InputPort("a", "2.0.0", "c.a"))
    assert(m2.inputPorts.map(_.name) == Seq("a", "b"))
  }

  test("draft versions bump from the latest revision; review transitions status") {
    val be = new DataProductBackend(tmp())
    val r1 = be.registerOutputPort("dp.r", OutputPort("out", "1.0.0", "c.out"))
    assert(r1.product.version.contains("0.1.0-draft"))
    // an occupied (e.g. rejected) higher draft becomes the bump base
    be.put(r1.product.copy(version = Some("0.2.0-draft"), status = "rejected"))
    val r2 = be.registerOutputPort("dp.r", OutputPort("out", "2.0.0", "c.out"))
    assert(r2.product.version.contains("0.3.0-draft"))
    // approve the draft: status flips, version stays; only drafts review
    val ok = be.reviewDraft("dp.r", "0.3.0-draft", approve = true)
    assert(ok.status == "active")
    intercept[IllegalArgumentException](
      be.reviewDraft("dp.r", "0.3.0-draft", approve = true))
    // the next registration bumps from the reviewed revision's core
    val r3 = be.registerOutputPort("dp.r", OutputPort("out", "3.0.0", "c.out"))
    assert(r3.product.version.contains("0.4.0-draft") && r3.product.status == "draft")
  }

  test("nextDraftVersion: bump seeds, pre-release stripping, collision counter") {
    val be = new DataProductBackend(tmp())
    // no current version: bump level decides the seed (reference defaults)
    assert(be.nextDraftVersion(None, Nil, "minor") == "0.1.0-draft")
    assert(be.nextDraftVersion(None, Nil, "major") == "1.0.0-draft")
    assert(be.nextDraftVersion(None, Nil, "patch") == "0.0.1-draft")
    // pre-release tag stripped before bumping
    assert(be.nextDraftVersion(Some("1.2.0-draft"), Nil, "minor") == "1.3.0-draft")
    // occupied candidates fall through to the .N counter
    assert(be.nextDraftVersion(Some("1.0.0"), Seq("1.1.0-draft"), "minor")
      == "1.1.0-draft.2")
    assert(be.nextDraftVersion(Some("1.0.0"),
      Seq("1.1.0-draft", "1.1.0-draft.2"), "minor") == "1.1.0-draft.3")
    // an unparseable current version falls back to the seed
    assert(be.nextDraftVersion(Some("not-semver"), Nil, "minor") == "0.1.0-draft")
  }

  test("input registration merges provenance; changed properties re-draft and update") {
    val be = new DataProductBackend(tmp())
    val r1 = be.registerInputPort("dp.p", InputPort("in", "1.0.0", "c.in"),
      customProperties = Map("tier" -> "silver"),
      sourceDataProduct = Some("dp.upstream"), sourceOutputPort = Some("gold"))
    assert(r1.product.findInputPort("in").get.customProperties == Map(
      "tier" -> "silver",
      "dc43.input.source_data_product" -> "dp.upstream",
      "dc43.input.source_output_port" -> "gold"))
    // reference quirk (ensure compares the BARE port, `_shared.py:83-86`):
    // the stored port carries merged properties the bare one lacks, so a
    // re-register with properties is CHANGED — the port is replaced and
    // the newly passed properties win
    val r2 = be.registerInputPort("dp.p", InputPort("in", "1.0.0", "c.in"),
      customProperties = Map("tier" -> "gold"))
    assert(r2.changed)
    assert(be.latest("dp.p").get.findInputPort("in").get
      .customProperties == Map("tier" -> "gold"))
    assert(be.listVersions("dp.p").size == 2)
    // a bare port matching a bare stored port stays a no-op
    val be2 = new DataProductBackend(tmp())
    be2.registerInputPort("dp.q", InputPort("in", "1.0.0", "c.in"))
    assert(!be2.registerInputPort("dp.q", InputPort("in", "1.0.0", "c.in")).changed)
  }

  test("listDataProducts pages over sorted authoritative ids") {
    val be = new DataProductBackend(tmp())
    Seq("dp.c", "dp.a", "dp.b").foreach(id =>
      be.registerOutputPort(id, OutputPort("out", "1.0.0", "c.out")))
    assert(be.listDataProductIds() == Seq("dp.a", "dp.b", "dp.c"))
    val page = be.listDataProducts(limit = Some(2), offset = 1)
    assert(page == ProductListing(Seq("dp.b", "dp.c"), 3, Some(2), 1))
    // clamping: negative offset → 0, negative limit → empty page
    assert(be.listDataProducts(limit = Some(-1)).items.isEmpty)
    assert(be.listDataProducts(offset = -5).items.size == 3)
    assert(be.listDataProducts(offset = 99).items.isEmpty)
  }

  test("resolveOutputContract returns the bound contract of the latest version") {
    val be = new DataProductBackend(tmp())
    be.registerOutputPort("dp.y", OutputPort("gold", "1.4.0", "c.gold"))
    assert(be.resolveOutputContract("dp.y", "gold").contains(("c.gold", "1.4.0")))
    assert(be.resolveOutputContract("dp.y", "nope").isEmpty)
    assert(be.resolveOutputContract("dp.missing", "gold").isEmpty)
  }
}
