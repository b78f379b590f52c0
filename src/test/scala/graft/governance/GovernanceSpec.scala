package graft.governance

import graft.{DemoContracts, SparkSpec, T}
import graft.contracts.FsContractStore
import graft.io._

class GovernanceSpec extends SparkSpec {

  test("recordValidation persists status records and proposes drafts on feedback") {
    val root = tmpDir("graft_govb")
    val store = new FsContractStore(s"$root/contracts")
    val gov = new GovernanceBackend(s"$root/governance", Some(store))
    val li = T.load(spark, "/root/testdata/sf0.001", "lineitem")

    // violated contract -> block + auto-draft into the contract store
    val bad = graft.quality.Evaluator.validate(li, DemoContracts.lineitem)
    val st = gov.recordValidation("sales.lineitem", "v1", DemoContracts.lineitem, bad)
    assert(st.status == "block")
    val fetched = gov.getStatus("sales.lineitem", "v1").get
    assert(fetched.status == "block" && fetched.errors.nonEmpty)
    assert(fetched.metrics("row_count") == 6000.0)
    val draft = store.latest("sales.lineitem").get
    assert(draft.status.contains("draft"))
    assert(draft.customProperties("dataset_id") == "sales.lineitem")

    // clean validation (of the aligned frame) -> ok, no draft proposed
    val aligned = graft.align.ApplyContract.align(li, DemoContracts.lineitemAlign)
    val ok = graft.quality.Evaluator.validate(aligned, DemoContracts.lineitemAlign)
    assert(gov.recordValidation("sales.lineitem_slim", "v1",
      DemoContracts.lineitemAlign, ok).status == "ok")
    assert(store.listVersions("sales.lineitem_slim").isEmpty)

    gov.linkDatasetContract("sales.lineitem", "sales.lineitem", "1.2.0")
    assert(gov.linkedContract("sales.lineitem").contains(("sales.lineitem", "1.2.0")))
    assert(gov.statusMatrix().map(_.status).sorted == Seq("block", "ok"))
  }

  test("metric history keeps every metric as text with numeric hints (dq_metrics shape)") {
    val root = tmpDir("graft_govmh")
    val gov = new GovernanceBackend(s"$root/governance")
    val c = DemoContracts.lineitemAlign
    import spark.implicits._
    // a validation whose metrics mix numbers with a non-numeric payload
    // (the observed.enum_* lists numeric-only storage would drop)
    val vr = graft.quality.ValidationResult(ok = true, Nil, Nil,
      Map("row_count" -> 42L, "violations.enum_tag" -> 2L,
        "observed.enum_tag" -> Seq("x", "y")),
      Map.empty)
    gov.recordValidation("d1", "v1", c, vr, proposeDraftOnFeedback = false)
    val vr2 = vr.copy(metrics = Map("row_count" -> 43L))
    gov.recordValidation("d1", "v2", c, vr2, proposeDraftOnFeedback = false)
    gov.recordValidation("other", "v1", c, vr2, proposeDraftOnFeedback = false)

    val hist = gov.metricHistory("d1")
    assert(hist.map(_.datasetVersion).distinct == Seq("v1", "v2"))
    val v1 = hist.filter(_.datasetVersion == "v1").map(o => o.key -> o).toMap
    assert(v1("row_count").valueNumeric.contains(42.0))
    assert(v1("observed.enum_tag").valueText.nonEmpty) // kept, text-only
    assert(v1("observed.enum_tag").valueNumeric.isEmpty)
    assert(hist.forall(_.datasetId == "d1")) // other datasets excluded
    // numeric-looking strings coerce like the reference's normaliser
    assert(GovernanceBackend.normaliseMetricValue(" 7.5 ") == (" 7.5 ", Some(7.5)))
    assert(GovernanceBackend.normaliseMetricValue("abc") == ("abc", None))
  }

  test("observed enum values flow end-to-end into the auto-proposed draft") {
    val root = tmpDir("graft_govenum")
    val store = new FsContractStore(s"$root/contracts")
    val gov = new GovernanceBackend(s"$root/governance", Some(store))
    import spark.implicits._
    val df = Seq(("a", 1), ("c", 2), ("d", 3)).toDF("tag", "n")
    val c = graft.contracts.Contract(id = "t.enumflow", version = "1.0.0",
      schema = Seq(graft.contracts.SchemaObjectDef("t", Seq(
        graft.contracts.FieldDef("tag", Some("string"),
          quality = Seq(graft.contracts.QualityRule(rule = Some("enum"),
            values = Seq("a", "b")))),
        graft.contracts.FieldDef("n", Some("int"))))))
    val vr = graft.quality.Evaluator.validate(df, c, observeEnums = true)
    gov.recordValidation("ds.enumflow", "v1", c, vr)
    // the auto-proposed draft carries the EXTENDED enum, not a dropped one
    val draft = store.latest("t.enumflow").get
    val tag = draft.properties.find(_.name == "tag").get
    assert(tag.quality.head.values == Seq("a", "b", "c", "d"))
    // and the observation payload is recoverable from the metric history
    val obs = gov.metricHistory("ds.enumflow")
      .find(_.key == "observed.enum_tag").get
    assert(obs.valueText == """["c","d"]""")
  }

  test("pipeline activity log joins runs to their validation statuses") {
    val root = tmpDir("graft_govact")
    val gov = new GovernanceBackend(s"$root/governance")
    val li = T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val bad = graft.quality.Evaluator.validate(li, DemoContracts.lineitem)
    gov.recordValidation("sales.lineitem", "v1", DemoContracts.lineitem, bad)

    gov.recordActivity("nightly-etl", "write", "sales.lineitem", "v1", DemoContracts.lineitem)
    gov.recordActivity("ml-train", "read", "sales.lineitem", "v1", DemoContracts.lineitem)
    gov.recordActivity("nightly-etl", "write", "sales.lineitem", "v2", DemoContracts.lineitem)

    val all = gov.pipelineActivity("sales.lineitem")
    assert(all.map(_._1.pipeline) == Seq("nightly-etl", "ml-train", "nightly-etl"))
    // v1 runs resolve the recorded block status; v2 has none yet
    val v1 = gov.pipelineActivity("sales.lineitem", Some("v1"))
    assert(v1.size == 2 && v1.forall(_._2.exists(_.status == "block")))
    val v2 = gov.pipelineActivity("sales.lineitem", Some("v2"))
    assert(v2.size == 1 && v2.head._2.isEmpty)
    assert(gov.pipelineActivity("unknown").isEmpty)

    // a torn/corrupt line (cross-process append interleaving) must be
    // skipped, not poison the whole log
    val logFile = java.nio.file.Paths.get(s"$root/governance/activity/sales.lineitem.jsonl")
    java.nio.file.Files.writeString(logFile, "{\"pipel",
      java.nio.file.StandardOpenOption.APPEND)
    assert(gov.pipelineActivity("sales.lineitem").size == 3)
  }

  test("dataset records merge activity with verdicts into newest-first version chains") {
    val root = tmpDir("graft_govchain")
    val gov = new GovernanceBackend(s"$root/governance")
    val li = T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val bad = graft.quality.Evaluator.validate(li, DemoContracts.lineitem)

    gov.recordValidation("sales.lineitem", "v1", DemoContracts.lineitem, bad)
    gov.recordActivity("etl", "write", "sales.lineitem", "v1", DemoContracts.lineitem,
      context = Map("run_id" -> "r-1"))
    gov.recordActivity("train", "read", "sales.lineitem", "v1", DemoContracts.lineitem)
    Thread.sleep(5) // recordedAt orders the chain
    gov.recordActivity("etl", "write", "sales.lineitem", "v2", DemoContracts.lineitem)
    gov.recordActivity("etl", "write", "other.events", "e1", DemoContracts.orders)
    gov.linkDatasetContract("linked.only", "sales.lineitem", "1.0.0")

    // every id with any record is enumerable (raw ids, not filenames)
    assert(gov.listDatasets() == Seq("linked.only", "other.events", "sales.lineitem"))

    // the chain: one record per (version, contract) combo, newest first,
    // activity attached, verdict joined where recorded
    val chain = gov.datasetRecords(Some("sales.lineitem"))
    assert(chain.map(_.datasetVersion) == Seq("v2", "v1"))
    val v1 = chain.find(_.datasetVersion == "v1").get
    assert(v1.activity.map(_.pipeline) == Seq("etl", "train"))
    assert(v1.activity.head.context == Map("run_id" -> "r-1"))
    assert(v1.status.exists(_.status == "block"))
    assert(chain.head.status.isEmpty) // v2: touched but never validated
    // version filter narrows the chain; unknown ids are empty
    assert(gov.datasetRecords(Some("sales.lineitem"), Some("v1")).size == 1)
    assert(gov.datasetRecords(Some("nope")).isEmpty)
    // the unfiltered view covers every dataset
    assert(gov.datasetRecords().map(_.datasetId).distinct.sorted ==
      Seq("other.events", "sales.lineitem"))
  }

  test("draft lifecycle: proposed drafts are listed, review promotes or rejects") {
    val root = tmpDir("graft_govdraft")
    val store = new FsContractStore(s"$root/contracts")
    val gov = new GovernanceBackend(s"$root/governance", Some(store))
    val li = T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val bad = graft.quality.Evaluator.validate(li, DemoContracts.lineitem)
    gov.recordValidation("sales.lineitem", "v1", DemoContracts.lineitem, bad)

    val drafts = gov.listDrafts("sales.lineitem")
    assert(drafts.nonEmpty && drafts.forall(_.status.contains("draft")))
    val dv = drafts.head.version

    val approved = gov.reviewDraft("sales.lineitem", dv, approve = true)
    assert(approved.status.contains("active"))
    assert(store.get("sales.lineitem", dv).exists(_.status.contains("active")))
    assert(gov.listDrafts("sales.lineitem").isEmpty) // no longer a draft
    // a reviewed contract cannot be re-reviewed
    intercept[IllegalArgumentException](gov.reviewDraft("sales.lineitem", dv, approve = false))
    intercept[IllegalArgumentException](gov.reviewDraft("sales.lineitem", "9.9.9", approve = true))
  }

  test("governed IO records verdicts on write and blocks reads of blocked versions") {
    val root = tmpDir("graft_govio")
    val store = new FsContractStore(s"$root/contracts")
    store.put(DemoContracts.lineitem)
    store.put(DemoContracts.lineitemAlign)
    val backend = new GovernanceBackend(s"$root/governance", Some(store))
    val io = GovernedIO(store, ContractVersionLocator(spark, s"$root/lake"),
      governance = Some(backend))
    val li = T.load(spark, "/root/testdata/sf0.001", "lineitem")

    // violated write records "block"; the read gate then refuses the version
    io.write(li, "sales.lineitem")
    assert(backend.getStatus("sales.lineitem", "1.2.0").exists(_.status == "block"))
    assert(backend.linkedContract("sales.lineitem").contains(("sales.lineitem", "1.2.0")))
    intercept[IllegalStateException] { io.read(spark, "sales.lineitem") }

    // clean write (conforming frame) records "ok" and reads pass
    io.write(graft.align.ApplyContract.align(li, DemoContracts.lineitemAlign),
      "sales.lineitem_slim")
    assert(backend.getStatus("sales.lineitem_slim", "0.3.0").exists(_.status == "ok"))
    assert(io.read(spark, "sales.lineitem_slim").df.count() == li.count())
  }

  test("colliding sanitised link filenames keep every dataset's link") {
    val root = tmpDir("graft_govlink")
    val gov = new GovernanceBackend(s"$root/governance")
    // "a/b" and "a:b" both sanitise to the file "a_b.txt"
    gov.linkDatasetContract("a/b", "contract.slash", "1.0.0")
    gov.linkDatasetContract("a:b", "contract.colon", "2.0.0")
    assert(gov.linkedContract("a/b").contains(("contract.slash", "1.0.0")))
    assert(gov.linkedContract("a:b").contains(("contract.colon", "2.0.0")))
    assert(gov.listDatasets() == Seq("a/b", "a:b"))
    // re-linking one id replaces ITS record only
    gov.linkDatasetContract("a/b", "contract.slash", "1.1.0")
    assert(gov.linkedContract("a/b").contains(("contract.slash", "1.1.0")))
    assert(gov.linkedContract("a:b").contains(("contract.colon", "2.0.0")))
    assert(gov.listDatasets() == Seq("a/b", "a:b"))

    // legacy 2-line format stays readable (link line + raw id line)
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$root/governance/links/old_style.txt"),
      "contract.old:0.9.0\nold/style")
    assert(gov.linkedContract("old/style").contains(("contract.old", "0.9.0")))
    assert(gov.listDatasets().contains("old/style"))
  }

  test("drafts with the same deterministic version but different payloads take .N slots") {
    val root = tmpDir("graft_govdup")
    val store = new FsContractStore(s"$root/contracts")
    val gov = new GovernanceBackend(s"$root/governance", Some(store))
    def outcome(rows: Double) = graft.quality.ValidationResult(
      ok = false, errors = Seq("l_quantity: gt violated"), warnings = Nil,
      metrics = Map("row_count" -> rows), schema = Map.empty)

    // same (dataset id, version, context) twice with DIFFERENT outcomes:
    // the second draft must not overwrite the first (possibly under review)
    gov.recordValidation("sales.lineitem", "v1", DemoContracts.lineitem, outcome(100.0))
    gov.recordValidation("sales.lineitem", "v1", DemoContracts.lineitem, outcome(200.0))
    val versions = store.listVersions("sales.lineitem")
    assert(versions.size == 2)
    assert(versions.exists(_.endsWith(".2")))

    // a byte-identical retry converges on the stored draft — no third copy
    gov.recordValidation("sales.lineitem", "v1", DemoContracts.lineitem, outcome(200.0))
    assert(store.listVersions("sales.lineitem").size == 2)
  }
}
