package graft.draft

import graft.SparkSpec
import graft.contracts._
import graft.quality.Evaluator

class DraftFromValidationSpec extends SparkSpec {
  import spark.implicits._

  test("clean validation drafts nothing") {
    val df = Seq((1L, 10.0)).toDF("id", "v")
    val c = Contract(id = "t.ok", version = "1.0.0",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("id", Some("bigint"), required = true),
        FieldDef("v", Some("double"))))))
    val res = Evaluator.validate(df, c)
    assert(res.ok)
    assert(Drafter.fromValidation(res, c).isEmpty)
  }

  test("violated rules are dropped, observed types/nullability win, version minor-bumps") {
    // contract says int + gt 100, data is double with small values and nulls
    val df = Seq[(java.lang.Long, java.lang.Double)]((1L, 5.0), (2L, null)).toDF("id", "v")
    val c = Contract(id = "t.fb", version = "1.2.3",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("id", Some("int"), required = true),
        FieldDef("v", Some("double"), required = true,
          quality = Seq(
            QualityRule(mustBeGreaterThan = Some(BigDecimal(100))),
            QualityRule(mustBeLessOrEqualTo = Some(BigDecimal(1000000)))))))))
    val res = Evaluator.validate(df, c)
    assert(!res.ok) // type mismatch + null in required + gt violations
    val draft = Drafter.fromValidation(res, c).get
    assert(draft.version == "1.3.0-draft")
    assert(draft.status.contains("draft"))
    val id = draft.properties.find(_.name == "id").get
    assert(id.physicalType.contains("bigint")) // observed type replaces declared
    val v = draft.properties.find(_.name == "v").get
    assert(!v.required)                         // relaxed: runtime saw nulls
    assert(v.quality.size == 1)                 // violated gt dropped, clean le kept
    assert(v.quality.head.mustBeLessOrEqualTo.isDefined)
    assert(draft.customProperties("base_contract") == "t.fb:1.2.3")
    assert(draft.customProperties("draft_change_log").contains("dropped violated rule gt_v"))
  }

  test("violated enums extend with observed values when the metrics carry them") {
    val df = Seq(("a", 1), ("c", 2), ("b", 3), ("d", 4)).toDF("tag", "n")
    val c = Contract(id = "t.en", version = "1.0.0",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("tag", Some("string"),
          quality = Seq(QualityRule(rule = Some("enum"), values = Seq("a", "b")))),
        FieldDef("n", Some("int"))))))
    val res = Evaluator.validate(df, c, observeEnums = true)
    assert(!res.ok)
    val draft = Drafter.fromValidation(res, c).get
    val tag = draft.properties.find(_.name == "tag").get
    // reference `_enum_extension`: base values first, additions appended (sorted)
    assert(tag.quality.head.values == Seq("a", "b", "c", "d"))
    assert(draft.customProperties("draft_change_log").contains("extended enum"))

    // without observations the violated enum is KEPT unchanged, never dropped
    val resBlind = Evaluator.validate(df, c)
    val draftBlind = Drafter.fromValidation(resBlind, c).get
    val tagBlind = draftBlind.properties.find(_.name == "tag").get
    assert(tagBlind.quality.head.values == Seq("a", "b"))
    assert(draftBlind.customProperties("draft_change_log")
      .contains("kept violated enum"))
  }
}
