package graft.ops

import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def left = (Seq.fill(100)(1L) ++ Seq(2L, 3L)).zipWithIndex
    .map { case (k, i) => (k, i) }.toDF("k", "lv")
  private def right = Seq((1L, "a"), (2L, "b"), (4L, "d")).toDF("k", "rv")

  test("saltedJoin matches the plain join exactly") {
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv").collect().toSet
    val salted = Skew.saltedJoin(left, right, Seq("k"), salts = 4)
      .select("k", "lv", "rv").collect().toSet
    assert(salted == plain)
    assert(salted.size == 101) // 100 hot matches + 1
  }

  test("hotKeys finds only the heavy key; hotColdJoin matches plain join") {
    val hot = Skew.hotKeys(left, Seq("k"), threshold = 50).collect()
    assert(hot.map(_.getLong(0)).toSeq == Seq(1L))
    val plain = left.join(right, Seq("k")).select("k", "lv", "rv").collect().toSet
    val hc = Skew.hotColdJoin(left, right, Seq("k"), hotThreshold = 50)
      .select("k", "lv", "rv").collect().toSet
    assert(hc == plain)
  }

  test("hotColdJoin falls back to salting when the hot key has high right-side multiplicity") {
    // key 1 is hot on BOTH sides: 100 left rows x 50 right rows — the
    // rightHot broadcast the two-path plan assumes dimension-shaped is
    // exactly what must not happen here
    val fatRight = ((1 to 50).map(i => (1L, s"r$i")) ++ Seq((2L, "b"), (4L, "d")))
      .toDF("k", "rv")
    def multiset(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("k", "lv", "rv").count().collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getString(2), r.getLong(3))).toSet
    val plain = multiset(left.join(fatRight, Seq("k")))
    val guarded = Skew.hotColdJoin(left, fatRight, Seq("k"),
      hotThreshold = 50, broadcastMaxRows = 10)
    assert(multiset(guarded) == plain)
    assert(plain.size == 5001) // 100 x 50 hot pairs + 1 cold match
    // generous bound keeps the two-path plan; output identical either way
    val twoPath = Skew.hotColdJoin(left, fatRight, Seq("k"), hotThreshold = 50)
    assert(multiset(twoPath) == plain)
  }
}

class GovernedIOSpec extends SparkSpec {
  import graft.DemoContracts
  import graft.contracts.FsContractStore
  import graft.io._

  test("dataset-id round trip: store + version locator + governed read/write") {
    val root = tmpDir("graft_gov")
    val store = new FsContractStore(s"$root/contracts")
    store.put(DemoContracts.lineitemAlign)
    val gov = GovernedIO(store, ContractVersionLocator(spark, s"$root/lake"))
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val w = gov.write(li, "sales.lineitem_slim")
    assert(w.writtenPaths.head.endsWith("/sales.lineitem_slim/0.3.0"))
    val r = gov.read(spark, "sales.lineitem_slim")
    assert(r.df.columns.toSeq == DemoContracts.lineitemAlign.properties.map(_.name))
    assert(r.df.count() == li.count())
    assert(r.validation.ok)
    intercept[IllegalArgumentException](gov.read(spark, "no.such.dataset"))

    // a bare pinned version that is missing must FAIL, not silently fall
    // back to another version's schema
    intercept[IllegalArgumentException](gov.contractFor("sales.lineitem_slim", Some("9.9.9")))
    // >= pins skip drafts: an unreviewed auto-draft must not serve
    store.put(DemoContracts.lineitemAlign.copy(version = "9.0.0", status = Some("draft")))
    assert(gov.contractFor("sales.lineitem_slim", Some(">=0.1.0")).version == "0.3.0")
    store.put(DemoContracts.lineitemAlign.copy(version = "9.1.0", status = Some("active")))
    assert(gov.contractFor("sales.lineitem_slim", Some(">=0.1.0")).version == "9.1.0")
  }
}

class GovernedPortsSpec extends SparkSpec {
  import graft.DemoContracts
  import graft.contracts.FsContractStore
  import graft.io._
  import graft.products._

  test("data-product ports: write registers the output binding, read follows the input binding") {
    val root = tmpDir("graft_ports")
    val store = new FsContractStore(s"$root/contracts")
    store.put(DemoContracts.lineitemAlign)
    val backend = new DataProductBackend(s"$root/products")
    val gov = GovernedIO(store, ContractVersionLocator(spark, s"$root/lake"), Some(backend))
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")

    gov.writePort(li, "dp.sales", "slim_out", "sales.lineitem_slim")
    assert(backend.resolveOutputContract("dp.sales", "slim_out")
      .contains(("sales.lineitem_slim", "0.3.0")))

    // bind a consumer product's input port to the same contract and read through it
    backend.registerInputPort("dp.consumer", InputPort("slim_in", "0.3.0", "sales.lineitem_slim"))
    val r = gov.readPort(spark, "dp.consumer", "slim_in")
    assert(r.df.count() == li.count())
    intercept[IllegalArgumentException](gov.readPort(spark, "dp.consumer", "nope"))

    // input bindings may pin with a version SPEC (reference
    // `_check_data_product_version`): >= resolves the best satisfying
    // stored version through VersionPolicy
    backend.registerInputPort("dp.consumer2", InputPort("slim_in", ">=0.2.0", "sales.lineitem_slim"))
    assert(gov.readPort(spark, "dp.consumer2", "slim_in").df.count() == li.count())
    backend.registerInputPort("dp.consumer3", InputPort("slim_in", ">=9.0.0", "sales.lineitem_slim"))
    intercept[IllegalArgumentException](gov.readPort(spark, "dp.consumer3", "slim_in"))
  }

  test("register→draft→publish lifecycle through writePort") {
    val root = tmpDir("graft_ports_lifecycle")
    val store = new FsContractStore(s"$root/contracts")
    store.put(DemoContracts.lineitemAlign) // sales.lineitem_slim 0.3.0
    val backend = new DataProductBackend(s"$root/products")
    val gov = GovernedIO(store, ContractVersionLocator(spark, s"$root/lake"), Some(backend))
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")

    // 1. governed write registers the output binding → a NEW draft revision
    gov.writePort(li, "dp.lc", "gold_out", "sales.lineitem_slim")
    val draft = backend.latest("dp.lc").get
    assert(draft.status == "draft" && draft.version.contains("0.1.0-draft"))

    // 2. under an enforcing active-only policy the product is unreadable
    //    until the draft is reviewed
    backend.registerInputPort("dp.lc", InputPort("in", "0.3.0", "sales.lineitem_slim"))
    val draft2 = backend.latest("dp.lc").get // input registration re-drafted
    assert(draft2.version.contains("0.2.0-draft"))
    intercept[IllegalStateException](
      gov.readPort(spark, "dp.lc", "in", enforce = true))

    // 3. publish: approve the draft → active; the enforcing read now serves
    backend.reviewDraft("dp.lc", draft2.version.get, approve = true)
    assert(gov.readPort(spark, "dp.lc", "in", enforce = true).df.count() == li.count())

    // 4. re-registering the same output binding on the published revision
    //    is a no-op (no new draft), a changed binding re-enters review
    val same = backend.registerOutputPort("dp.lc",
      OutputPort("gold_out", "0.3.0", "sales.lineitem_slim"))
    assert(!same.changed)
    assert(backend.latest("dp.lc").get.status == "active")
  }

  test("readPort honours product-side status/version policies (accept/reject matrix)") {
    val root = tmpDir("graft_ports_policy")
    val store = new FsContractStore(s"$root/contracts")
    store.put(DemoContracts.lineitemAlign) // sales.lineitem_slim 0.3.0, active
    val backend = new DataProductBackend(s"$root/products")
    val gov = GovernedIO(store, ContractVersionLocator(spark, s"$root/lake"), Some(backend))
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    gov.write(li, "sales.lineitem_slim")

    // two product revisions: the released one binds "in", the newer draft
    // renames the port — which revision serves decides which ports exist
    backend.put(DataProduct("dp.c", status = "active", version = Some("1.0.0"),
      inputPorts = Seq(InputPort("in", "0.3.0", "sales.lineitem_slim"))))
    backend.put(DataProduct("dp.c", status = "draft", version = Some("1.1.0"),
      inputPorts = Seq(InputPort("renamed_in", "0.3.0", "sales.lineitem_slim"))))

    // enforcing read skips the draft revision: 1.0.0's port serves
    assert(gov.readPort(spark, "dp.c", "in", enforce = true).df.count() == li.count())
    // warn-only read resolves the newest (draft) revision, which lacks "in"
    intercept[IllegalArgumentException](gov.readPort(spark, "dp.c", "in"))
    assert(gov.readPort(spark, "dp.c", "renamed_in").df.count() == li.count())
    // explicit product-version pins select the binding set
    assert(gov.readPort(spark, "dp.c", "in",
      productVersion = Some("==1.0.0")).df.count() == li.count())
    // pinning the draft while enforcing rejects on status before any IO
    intercept[IllegalStateException](gov.readPort(spark, "dp.c", "renamed_in",
      enforce = true, productVersion = Some("1.1.0")))
    // a policy admitting drafts lets the same pin through
    assert(gov.readPort(spark, "dp.c", "renamed_in", enforce = true,
      productVersion = Some("1.1.0"),
      productStatusPolicy = graft.products.ProductStatusPolicy(Seq("active", "draft")))
      .df.count() == li.count())
    // unknown product: nothing resolvable
    intercept[IllegalArgumentException](gov.readPort(spark, "dp.missing", "in"))
  }
}
