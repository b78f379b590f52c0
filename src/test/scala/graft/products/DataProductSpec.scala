package graft.products

import org.scalatest.funsuite.AnyFunSuite

class DataProductSpec extends AnyFunSuite {

  private def tmp() = java.nio.file.Files.createTempDirectory("graft_dp").toString

  test("model JSON round-trips with ports and custom properties") {
    val p = DataProduct(
      id = "dp.sales", status = "active", version = Some("1.2.0"),
      name = Some("Sales"),
      inputPorts = Seq(InputPort("orders_in", "1.0.0", "sales.orders",
        Map("dc43.input.source_data_product" -> "dp.upstream"))),
      outputPorts = Seq(OutputPort("gold_orders", "2.0.0", "sales.orders_gold",
        Some("curated"), Map("tier" -> "gold"))),
      customProperties = Map("owner" -> "team-data"))
    assert(DataProductJson.fromJson(DataProductJson.toJson(p)) == p)
  }

  test("port registration evolves -draft revisions with minor bumps; idempotent re-registration") {
    val be = new DataProductBackend(tmp())
    val r1 = be.registerInputPort("dp.x", InputPort("in", "1.0.0", "c.in"))
    assert(r1.changed && r1.product.version.contains("0.1.0-draft") && r1.product.status == "draft")
    // identical binding: no change, no new version
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

  test("input registration merges provenance and custom properties only when changed") {
    val be = new DataProductBackend(tmp())
    val r1 = be.registerInputPort("dp.p", InputPort("in", "1.0.0", "c.in"),
      customProperties = Map("tier" -> "silver"),
      sourceDataProduct = Some("dp.upstream"), sourceOutputPort = Some("gold"))
    assert(r1.product.findInputPort("in").get.customProperties == Map(
      "tier" -> "silver",
      "dc43.input.source_data_product" -> "dp.upstream",
      "dc43.input.source_output_port" -> "gold"))
    // unchanged binding: properties are NOT merged, no revision written
    val r2 = be.registerInputPort("dp.p", InputPort("in", "1.0.0", "c.in"),
      customProperties = Map("tier" -> "gold"))
    assert(!r2.changed)
    assert(be.latest("dp.p").get.findInputPort("in").get
      .customProperties("tier") == "silver")
    assert(be.listVersions("dp.p").size == 1)
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
