package graft.draft

import graft.SparkSpec
import graft.contracts._

class SuggestSpec extends SparkSpec {
  import spark.implicits._

  private def frame = Seq(
    (1L, Some("a"), 10.0, Some("x1")),
    (2L, Some("b"), 20.0, Some("x2")),
    (3L, Some("a"), 30.0, None),
    (4L, Some("b"), 40.0, Some("x4"))
  ).toDF("id", "cat", "v", "freeform")

  test("suggests required/unique/enum/range with exact verification") {
    val ss = Suggest.rules(frame, enumMaxDistinct = 3)
    val byColKind = ss.map(s => (s.column, s.kind)).toSet
    assert(byColKind.contains(("id", "required")))
    assert(byColKind.contains(("id", "unique")))
    assert(byColKind.contains(("cat", "required")))
    assert(byColKind.contains(("cat", "enum")))
    // freeform has a null: neither required nor unique
    assert(!byColKind.contains(("freeform", "required")))
    assert(!byColKind.contains(("freeform", "unique")))
    // cat is not unique (2 distinct over 4 rows)
    assert(!byColKind.contains(("cat", "unique")))
    val enumRule = ss.find(s => s.column == "cat" && s.kind == "enum").get.rule.get
    assert(enumRule.values == Seq("a", "b"))
    val range = ss.find(s => s.column == "v" && s.kind == "range").get.rule.get
    // observed [10, 40], margin 0.1 of span 30 => [7, 43]
    assert(range.mustBeGreaterOrEqualTo.contains(BigDecimal(7.0)))
    assert(range.mustBeLessOrEqualTo.contains(BigDecimal(43.0)))
  }

  test("enrich patches matching fields only and never duplicates rules") {
    val contract = Contract("c", "1.0.0", schema = Seq(SchemaObjectDef("t", Seq(
      FieldDef("id", Some("bigint")),
      FieldDef("cat", Some("string")),
      FieldDef("not_observed", Some("string"))))))
    val ss = Suggest.rules(frame, enumMaxDistinct = 3)
    val enriched = Suggest.enrich(contract, ss)
    val fields = enriched.properties.map(f => f.name -> f).toMap
    assert(fields("id").required && fields("id").unique)
    assert(fields("cat").required && !fields("cat").unique)
    assert(fields("cat").quality.exists(_.rule.contains("enum")))
    assert(fields("not_observed").quality.isEmpty)
    // idempotent: enriching twice adds nothing new
    val twice = Suggest.enrich(enriched, ss)
    assert(twice == enriched)
  }
}
