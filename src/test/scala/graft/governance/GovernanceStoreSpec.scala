package graft.governance

import graft.{DemoContracts, SparkSpec}

/** One behavior battery run against every [[GovernanceStore]] binding —
  * filesystem, Derby JDBC, Spark-table — so the backend's semantics are
  * pinned store-independently (the reference runs the same governance
  * suite over its local/sql/delta stores). */
class GovernanceStoreSpec extends SparkSpec {

  private def battery(name: String, mkStore: () => GovernanceStore): Unit = {

    test(s"$name: status upsert, exact per-id reads, deterministic listing") {
      val s = mkStore()
      assert(s.getStatus("d1", "v1").isEmpty)
      assert(s.listStatuses().isEmpty)
      s.putStatus("d1", "v1", """{"a":1}""")
      s.putStatus("d1", "v2", """{"a":2}""")
      s.putStatus("d2", "v1", """{"a":3}""")
      // re-record supersedes (the backend overwrites a re-validated version)
      s.putStatus("d1", "v1", """{"a":9}""")
      assert(s.getStatus("d1", "v1").contains("""{"a":9}"""))
      assert(s.listStatuses().sorted ==
        Seq("""{"a":2}""", """{"a":3}""", """{"a":9}""").sorted)
      // per-id reads may over-return but never under-return
      assert(Set("""{"a":9}""", """{"a":2}""").subsetOf(s.statusesFor("d1").toSet))
    }

    test(s"$name: link upsert and id discovery") {
      val s = mkStore()
      assert(s.getLink("d1").isEmpty)
      s.putLink("d1", "c1", "1.0.0")
      s.putLink("d1", "c1", "2.0.0") // relink supersedes
      s.putLink("d2", "c2", "1.0.0")
      assert(s.getLink("d1").contains(("c1", "2.0.0")))
      assert(s.linkedDatasetIds().sorted == Seq("d1", "d2"))
    }

    test(s"$name: activity appends replay in order") {
      val s = mkStore()
      assert(s.activityLines("d1").isEmpty)
      (1 to 5).foreach(i => s.appendActivity("d1", s"""{"datasetId":"d1","n":$i}"""))
      s.appendActivity("d2", """{"datasetId":"d2","n":1}""")
      assert(s.activityLines("d1").map(l => l.filter(_.isDigit).takeRight(1)) ==
        Seq("1", "2", "3", "4", "5"))
      assert(s.allActivityLines().size == 6)
    }

    test(s"$name: backend lifecycle end-to-end over this store") {
      val gov = new GovernanceBackend(mkStore())
      val c = DemoContracts.lineitemAlign
      val okRes = graft.quality.ValidationResult(ok = true, Nil, Nil,
        Map("row_count" -> 42L, "observed.enum_tag" -> Seq("x", "y")), Map.empty)
      val badRes = graft.quality.ValidationResult(ok = false,
        Seq("column x broke"), Seq("column y iffy"), Map("row_count" -> 7L), Map.empty)

      assert(gov.recordValidation("sales.d", "v1", c, okRes,
        proposeDraftOnFeedback = false).status == "ok")
      assert(gov.recordValidation("sales.d", "v2", c, badRes,
        proposeDraftOnFeedback = false).status == "block")
      val got = gov.getStatus("sales.d", "v2").get
      assert(got.errors == Seq("column x broke") && got.warnings == Seq("column y iffy"))

      gov.linkDatasetContract("sales.d", c.id, c.version)
      assert(gov.linkedContract("sales.d").contains((c.id, c.version)))

      gov.recordActivity("pipe1", "write", "sales.d", "v1", c)
      gov.recordActivity("pipe2", "read", "sales.d", "v1", c)
      val acts = gov.pipelineActivity("sales.d")
      assert(acts.map(_._1.pipeline) == Seq("pipe1", "pipe2"))
      assert(acts.forall(_._2.exists(_.status == "ok")))

      assert(gov.listDatasets() == Seq("sales.d"))
      assert(gov.statusMatrix().map(_.status).sorted == Seq("block", "ok"))
      val hist = gov.metricHistory("sales.d")
      assert(hist.filter(_.key == "row_count").flatMap(_.valueNumeric).toSet ==
        Set(42.0, 7.0))
      // non-numeric metric payload survives as text (dq_metrics shape)
      assert(hist.exists(o => o.key == "observed.enum_tag" && o.valueNumeric.isEmpty))

      val recs = gov.datasetRecords(Some("sales.d"))
      assert(recs.map(_.datasetVersion).sorted == Seq("v1", "v2"))
      assert(recs.find(_.datasetVersion == "v1").get.activity.size == 2)
    }
  }

  battery("fs", () => new FsGovernanceStore(tmpDir("graft_govstore_fs")))
  battery("jdbc-derby", () => {
    val dir = tmpDir("graft_govstore_db")
    new JdbcGovernanceStore(s"jdbc:derby:$dir/gov;create=true")
  })
  battery("spark-table", () =>
    new SparkTableGovernanceStore(spark, tmpDir("graft_govstore_st")))

  test("jdbc store keys raw ids exactly — no sanitised-filename collisions") {
    val dir = tmpDir("graft_govstore_db2")
    val s = new JdbcGovernanceStore(s"jdbc:derby:$dir/gov;create=true")
    // "a/b" and "a:b" collide under filename sanitisation; SQL keys don't
    s.putStatus("a/b", "v1", """{"id":"a/b"}""")
    s.putStatus("a:b", "v1", """{"id":"a:b"}""")
    assert(s.getStatus("a/b", "v1").contains("""{"id":"a/b"}"""))
    assert(s.getStatus("a:b", "v1").contains("""{"id":"a:b"}"""))
    assert(s.statusesFor("a/b") == Seq("""{"id":"a/b"}"""))
    s.putLink("a/b", "c1", "1.0.0")
    s.putLink("a:b", "c2", "1.0.0")
    assert(s.getLink("a/b").contains(("c1", "1.0.0")))
    assert(s.getLink("a:b").contains(("c2", "1.0.0")))
    assert(s.linkedDatasetIds().sorted == Seq("a/b", "a:b").sorted)
  }

  test("delta binding resolves through the datasource registry") {
    // constructing is free (pure runtime binding); using it without the
    // delta jars fails at load, which is the documented contract
    val s = new DeltaGovernanceStore(spark, tmpDir("graft_govstore_delta"))
    intercept[Exception] { s.putStatus("d", "v", "{}") }
  }
}
