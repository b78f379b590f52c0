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

  test("port registration evolves drafts with minor bumps; idempotent re-registration") {
    val be = new DataProductBackend(tmp())
    val r1 = be.registerInputPort("dp.x", InputPort("in", "1.0.0", "c.in"))
    assert(r1.changed && r1.product.version.contains("0.1.0") && r1.product.status == "draft")
    // identical binding: no change, no new version
    val r2 = be.registerInputPort("dp.x", InputPort("in", "1.0.0", "c.in"))
    assert(!r2.changed)
    assert(be.listVersions("dp.x") == Seq("0.1.0"))
    // new output port bumps again
    val r3 = be.registerOutputPort("dp.x", OutputPort("out", "1.0.0", "c.out"))
    assert(r3.changed && r3.product.version.contains("0.2.0"))
    // rebinding an existing port to a new contract version bumps and replaces
    val r4 = be.registerInputPort("dp.x", InputPort("in", "2.0.0", "c.in"))
    assert(r4.changed && r4.product.version.contains("0.3.0"))
    assert(r4.product.inputPorts == Seq(InputPort("in", "2.0.0", "c.in")))
  }

  test("resolveOutputContract returns the bound contract of the latest version") {
    val be = new DataProductBackend(tmp())
    be.registerOutputPort("dp.y", OutputPort("gold", "1.4.0", "c.gold"))
    assert(be.resolveOutputContract("dp.y", "gold").contains(("c.gold", "1.4.0")))
    assert(be.resolveOutputContract("dp.y", "nope").isEmpty)
    assert(be.resolveOutputContract("dp.missing", "gold").isEmpty)
  }
}
