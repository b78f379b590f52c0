package graft.draft

import graft.SparkSpec
import graft.contracts._

class DrafterSpec extends SparkSpec {
  import spark.implicits._

  test("fromDataFrame drafts typed properties from the observed schema") {
    val df = Seq((1L, "x", 2.5)).toDF("id", "name", "score")
    val draft = Drafter.fromDataFrame(df, "t.draft")
    assert(draft.id == "t.draft")
    assert(draft.status.contains("draft"))
    assert(draft.version == "0.1.1-draft")
    val props = draft.properties.map(f => f.name -> f.odcsType).toMap
    assert(props == Map("id" -> "bigint", "name" -> "string", "score" -> "double"))
    // primitives are non-nullable in the source schema -> required; string is nullable
    assert(draft.properties.filter(_.name != "name").forall(_.required))
    assert(!draft.properties.find(_.name == "name").get.required)
  }

  test("base contract: version patch-bumps, declared quality rules survive") {
    val base = Contract(id = "t.base", version = "2.3.4",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("id", Some("int"), required = true,
          quality = Seq(QualityRule(mustBeGreaterThan = Some(BigDecimal(0)))))))))
    val df = Seq((5L, "new")).toDF("id", "extra")
    val draft = Drafter.fromDataFrame(df, "t.base", baseContract = Some(base))
    assert(draft.version == "2.3.5-draft")
    val id = draft.properties.find(_.name == "id").get
    assert(id.physicalType.contains("bigint")) // refreshed from observation
    assert(id.quality.nonEmpty)                // declared rule kept
    assert(draft.properties.exists(_.name == "extra"))
  }

  test("draft context switches the version suffix and lands in customProperties") {
    val df = Seq(1).toDF("a")
    val draft = Drafter.fromDataFrame(df, "t.ctx", draftContext = Map("reason" -> "drift"))
    assert(draft.version.endsWith("-ctx-draft"))
    assert(draft.customProperties("reason") == "drift")
  }
}

class ProfilerDraftSpec extends graft.SparkSpec {
  import spark.implicits._
  import graft.quality.{Evaluator, Profiler}

  test("profiler: one-pass nulls/distincts/ranges") {
    val df = Seq[(java.lang.Long, java.lang.Double, String)](
      (1L, 10.0, "a"), (2L, -5.0, "b"), (null, 20.0, "a")
    ).toDF("id", "v", "tag")
    val p = Profiler.profile(df).map(c => c.name -> c).toMap
    assert(p("id").nullCount == 1 && p("id").min.contains(1.0) && p("id").max.contains(2.0))
    assert(p("v").min.contains(-5.0) && p("v").max.contains(20.0))
    assert(p("tag").nullCount == 0 && p("tag").min.isEmpty)
    assert(p("tag").approxDistinct >= 2)
  }

  test("stats-draft proposes range rules the data itself satisfies") {
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val draft = graft.draft.Drafter.fromDataFrameWithStats(li, "sales.lineitem_profiled")
    val qty = draft.properties.find(_.name == "l_quantity").get
    assert(qty.quality.exists(_.mustBeGreaterOrEqualTo.isDefined))
    assert(qty.quality.exists(_.mustBeLessOrEqualTo.isDefined))
    // the drafted contract validates clean against the very data it profiled
    val res = Evaluator.validate(li, draft)
    assert(res.ok, res.errors.mkString("; "))
  }
}

class DraftRelaxationSpec extends graft.SparkSpec {
  import graft.quality.Evaluator
  import graft.contracts._

  test("required is NOT relaxed for parquet columns with zero observed nulls") {
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem") // all columns nullable-by-schema
    val res = Evaluator.validate(li, graft.DemoContracts.lineitem)
    assert(!res.ok) // threshold violations force a draft
    val draft = Drafter.fromValidation(res, graft.DemoContracts.lineitem).get
    // data has no nulls: every required flag survives despite nullable schema
    val requiredBefore = graft.DemoContracts.lineitem.properties.filter(_.required).map(_.name)
    val requiredAfter = draft.properties.filter(_.required).map(_.name)
    assert(requiredAfter == requiredBefore)
    assert(!draft.customProperties("draft_change_log").contains("relaxed required"))
  }

  test("profiler handles an empty frame without NPE") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Double)].toDF("id", "v")
    val p = graft.quality.Profiler.profile(empty)
    assert(p.forall(c => c.nullCount == 0 && c.min.isEmpty))
  }
}
