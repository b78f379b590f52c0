package graft.contracts

import graft.DemoContracts
import org.scalatest.funsuite.AnyFunSuite

class SemVerSpec extends AnyFunSuite {
  test("parse round-trips including pre-release suffix") {
    assert(SemVer.parse("1.2.3").toString == "1.2.3")
    assert(SemVer.parse("1.2.3-draft").toString == "1.2.3-draft")
    assert(SemVer.tryParse("not-a-version").isEmpty)
  }

  test("ordering: release sorts above pre-release of the same triple") {
    assert(SemVer.parse("1.2.3") > SemVer.parse("1.2.3-draft"))
    assert(SemVer.parse("1.2.3-a") < SemVer.parse("1.2.3-b"))
    assert(SemVer.parse("1.10.0") > SemVer.parse("1.9.9"))
    assert(SemVer.parse("2.0.0-draft") > SemVer.parse("1.9.9"))
  }

  test("bump resets lower components") {
    assert(SemVer.parse("1.2.3").bump("major") == SemVer(2, 0, 0))
    assert(SemVer.parse("1.2.3").bump("minor") == SemVer(1, 3, 0))
    assert(SemVer.parse("1.2.3").bump("patch") == SemVer(1, 2, 4))
  }
}

class OdcsTypesSpec extends AnyFunSuite {
  test("canonicalises aliases and parameterised decimals") {
    assert(OdcsTypes.canonical("LONG") == "bigint")
    assert(OdcsTypes.canonical("Integer") == "int")
    assert(OdcsTypes.canonical("decimal(10,2)") == "decimal")
    assert(OdcsTypes.canonical("bool") == "boolean")
  }

  test("widening whitelist is lossless-only (no bigint->int)") {
    assert(OdcsTypes.losslesslyWidensTo("int", "bigint"))
    assert(OdcsTypes.losslesslyWidensTo("float", "double"))
    assert(!OdcsTypes.losslesslyWidensTo("bigint", "int"))
    assert(!OdcsTypes.losslesslyWidensTo("double", "float"))
    assert(!OdcsTypes.losslesslyWidensTo("string", "int"))
  }
}

class ContractJsonSpec extends AnyFunSuite {
  test("demo contracts survive a JSON round-trip exactly") {
    for (c <- Seq(DemoContracts.lineitem, DemoContracts.orders,
                  DemoContracts.lineitemAlign, DemoContracts.lineitemWithQuery)) {
      assert(ContractJson.fromJson(ContractJson.toJson(c)) == c, s"round-trip of ${c.id}")
    }
  }

  test("customProperties and nested items round-trip") {
    val c = Contract(
      id = "t", version = "0.1.0",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("arr", Some("array"), items = Some(FieldDef("elem", Some("double")))),
        FieldDef("obj", Some("object"), fields = Seq(FieldDef("x", Some("int"), required = true)))))),
      customProperties = Map("team" -> "data", "tier" -> "gold"))
    assert(ContractJson.fromJson(ContractJson.toJson(c)) == c)
  }
}

class FsContractStoreSpec extends AnyFunSuite {
  test("put/get/list/latest with semver ordering and pre-release drafts") {
    val dir = java.nio.file.Files.createTempDirectory("graft_store").toString
    val store = new FsContractStore(dir)
    val base = DemoContracts.orders
    store.put(base.copy(version = "1.0.0"))
    store.put(base.copy(version = "1.2.0"))
    store.put(base.copy(version = "1.10.0"))
    store.put(base.copy(version = "1.10.1-draft"))
    assert(store.listContractIds() == Seq("sales.orders"))
    assert(store.listVersions("sales.orders").size == 4)
    // 1.10.0 (release) beats 1.10.1-draft? No: 1.10.1-draft > 1.10.0 numerically.
    assert(store.latest("sales.orders").map(_.version).contains("1.10.1-draft"))
    assert(store.get("sales.orders", "1.2.0").map(_.version).contains("1.2.0"))
    assert(store.get("sales.orders", "9.9.9").isEmpty)
    assert(store.get("nope", "1.0.0").isEmpty)
  }
}
