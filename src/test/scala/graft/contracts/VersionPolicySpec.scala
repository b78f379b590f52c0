package graft.contracts

import graft.{DemoContracts, SparkSpec}

class VersionPolicySpec extends SparkSpec {

  private def storeWith(versions: String*): ContractStore = {
    val store = new SparkTableContractStore(spark, tmpDir("graft_vp") + "/contracts")
    versions.foreach(v => store.put(DemoContracts.orders.copy(version = v)))
    store
  }

  test("resolve: latest when unset, exact for bare and == specs") {
    val store = storeWith("1.0.0", "1.2.0", "1.10.0")
    assert(VersionPolicy.resolve(store, "sales.orders").version == "1.10.0")
    assert(VersionPolicy.resolve(store, "sales.orders", Some("1.2.0")).version == "1.2.0")
    assert(VersionPolicy.resolve(store, "sales.orders", Some("==1.0.0")).version == "1.0.0")
    intercept[IllegalArgumentException](
      VersionPolicy.resolve(store, "sales.orders", Some("==9.9.9")))
    intercept[IllegalArgumentException](
      VersionPolicy.resolve(store, "sales.nope"))
  }

  test("resolve >=: highest satisfying version, numeric not lexicographic") {
    val store = storeWith("1.0.0", "1.2.0", "1.10.0", "0.9.0")
    // lexicographic comparison would pick 1.2.0 over 1.10.0
    assert(VersionPolicy.resolve(store, "sales.orders", Some(">=1.1.0")).version == "1.10.0")
    assert(VersionPolicy.resolve(store, "sales.orders", Some(">=1.10.0")).version == "1.10.0")
    intercept[IllegalArgumentException](
      VersionPolicy.resolve(store, "sales.orders", Some(">=2.0.0")))
  }

  test("resolve >= skips non-semver entries; unparseable bound is an error") {
    val store = storeWith("1.0.0", "draft-x")
    assert(VersionPolicy.resolve(store, "sales.orders", Some(">=0.5.0")).version == "1.0.0")
    // reference `_select_version` raises on an unparseable minimum
    intercept[IllegalArgumentException](
      VersionPolicy.resolve(store, "sales.orders", Some(">=draft-x")))
  }

  test("pre-releases order below their release, consistent with store.latest") {
    val store = storeWith("1.2.0-rc1", "1.2.0", "1.1.0")
    // SemVer ordering: 1.2.0-rc1 < 1.2.0, so >= picks the release and a
    // pre-release does not satisfy a release bound
    assert(VersionPolicy.resolve(store, "sales.orders", Some(">=1.1.0")).version == "1.2.0")
    assert(!VersionPolicy.satisfies("1.2.0-rc1", ">=1.2.0"))
    assert(VersionPolicy.satisfies("1.2.0-rc1", ">=1.1.0"))
    // unpinned latest agrees
    assert(VersionPolicy.resolve(store, "sales.orders").version == "1.2.0")
    // dotted numeric pre-release identifiers order numerically
    // (semver §11.4); undotted alphanumerics are lexical per spec —
    // strict spec ordering keeps the comparator transitive
    assert(VersionPolicy.satisfies("1.2.0-rc.10", ">=1.2.0-rc.2"))
    assert(!VersionPolicy.satisfies("1.2.0-rc.2", ">=1.2.0-rc.10"))
    assert(SemVer.parse("1.2.0-rc10") < SemVer.parse("1.2.0-rc2")) // lexical, per spec
    assert(SemVer.parse("1.2.0-rc.10") > SemVer.parse("1.2.0-rc.2"))
    assert(SemVer.parse("1.2.0-alpha") < SemVer.parse("1.2.0-alpha.1"))
    // overflow-safe numeric identifiers (timestamp-style snapshot tags)
    assert(SemVer.parse("1.0.0-20260812093000123456789") >
           SemVer.parse("1.0.0-20260812093000123456788"))
  }

  test("check honours ==, >= and bare specs") {
    VersionPolicy.check(None, "1.0.0")
    VersionPolicy.check(Some("==1.0.0"), "1.0.0")
    VersionPolicy.check(Some(">=1.0.0"), "1.10.0")
    VersionPolicy.check(Some("1.0.0"), "1.0.0")
    intercept[IllegalArgumentException](VersionPolicy.check(Some(">=1.2.0"), "1.0.0"))
    intercept[IllegalArgumentException](VersionPolicy.check(Some("==1.2.0"), "1.0.1"))
  }

  test("store format plumbing works for non-parquet sources (json)") {
    val store = new SparkTableContractStore(spark, tmpDir("graft_vpj") + "/contracts", "json")
    store.put(DemoContracts.orders.copy(version = "1.0.0"))
    store.put(DemoContracts.orders.copy(version = "1.1.0"))
    assert(store.listVersions("sales.orders") == Seq("1.0.0", "1.1.0"))
    assert(store.get("sales.orders", "1.1.0").map(_.version).contains("1.1.0"))
  }

  test("readResolved pins the governed read to the store-resolved contract") {
    import spark.implicits._
    val dir = tmpDir("graft_readres")
    Seq((1L, 10L), (2L, 20L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$dir/data")
    val slim = graft.DemoContracts.orders.copy(schema =
      graft.DemoContracts.orders.schema.map(o => o.copy(properties =
        o.properties.filter(f => Set("o_orderkey", "o_custkey").contains(f.name)))))
    val store = new SparkTableContractStore(spark, s"$dir/contracts")
    store.put(slim.copy(version = "1.0.0"))
    store.put(slim.copy(version = "1.4.0"))
    val res = graft.io.ContractIO.readResolved(spark, s"$dir/data", store,
      "sales.orders", Some(">=1.1.0"))
    assert(res.df.columns.toSeq == Seq("o_orderkey", "o_custkey"))
    assert(res.df.count() == 2)
    intercept[IllegalArgumentException] {
      graft.io.ContractIO.readResolved(spark, s"$dir/data", store, "sales.orders", Some(">=2.0.0"))
    }
  }

  test("DeltaContractStore is constructible without delta jars; empty reads are graceful") {
    val store = new DeltaContractStore(spark, tmpDir("graft_delta") + "/contracts")
    assert(store.get("x", "1.0.0").isEmpty)
    assert(store.listVersions("x").isEmpty)
    assert(store.listContractIds().isEmpty)
  }
}
