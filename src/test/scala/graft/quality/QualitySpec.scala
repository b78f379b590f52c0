package graft.quality

import graft.{DemoContracts, SparkSpec}
import graft.contracts._

class MetricsSpec extends SparkSpec {
  import spark.implicits._

  private val contract = Contract(
    id = "t.m", version = "1.0.0",
    schema = Seq(SchemaObjectDef("t", Seq(
      FieldDef("id", Some("bigint"), required = true, unique = true),
      FieldDef("v", Some("double"),
        quality = Seq(QualityRule(mustBeGreaterThan = Some(BigDecimal(0))))),
      FieldDef("tag", Some("string"),
        quality = Seq(QualityRule(rule = Some("enum"), values = Seq("a", "b"))))))))

  private def df = Seq[(java.lang.Long, java.lang.Double, String)](
    (1L, 1.0, "a"), (2L, -1.0, "b"), (2L, null, "c"),
    (null, 0.0, null), (null, 2.0, "a")
  ).toDF("id", "v", "tag")

  test("one-pass metrics: null-aware counts match hand-computed values") {
    val m = Metrics.compute(df, Expectations.fromContract(contract))
    assert(m("row_count") == 5L)
    assert(m("violations.not_null_id") == 2L)       // two null ids
    // 5 rows - 3 distinct non-null (1,2) -> unique delta: total(5) - distinct(2) - null-present(1) = 2
    assert(m("violations.unique_id") == 2L)
    assert(m("violations.gt_v") == 2L)              // -1.0 and 0.0; null v not a violation
    assert(m("violations.enum_tag") == 1L)          // "c"; null tag not a violation
  }

  test("specs on columns absent from the frame count every row") {
    val c2 = contract.copy(schema = contract.schema.map(o =>
      o.copy(properties = o.properties :+ FieldDef("missing", Some("string"), required = true))))
    val m = Metrics.compute(df, Expectations.fromContract(c2))
    assert(m("violations.not_null_missing") == 5L)
  }

  test("computeWithObservations collects sorted, capped out-of-set enum values") {
    val m = Metrics.computeWithObservations(df, Expectations.fromContract(contract))
    assert(m("violations.enum_tag") == 1L)
    assert(m("observed.enum_tag") == Seq("c")) // null tag is not an observation
    // counts still Longs alongside the observation payloads
    assert(m("row_count") == 5L)

    val wide = Seq(("z", 1), ("y", 2), ("x", 3), ("a", 4)).toDF("tag", "n")
    val mw = Metrics.computeWithObservations(wide, Expectations.fromContract(contract),
      observedCap = 2)
    assert(mw("observed.enum_tag") == Seq("x", "y")) // sorted, then capped

    val clean = Seq(("a", 1), ("b", 2)).toDF("tag", "n")
    val mc = Metrics.computeWithObservations(clean, Expectations.fromContract(contract))
    assert(!mc.contains("observed.enum_tag")) // no violations -> no key
  }

  test("computeWithQueries rewrites the canonical alias to a unique view") {
    val c3 = contract.copy(schema = contract.schema.map(o => o.copy(quality = Seq(
      QualityRule(rule = Some("query"), name = Some("neg_count"),
        query = Some(s"SELECT count(*) FROM ${Metrics.QueryViewAlias} WHERE v < 0"))))))
    val m = Metrics.computeWithQueries(df, Expectations.fromContract(c3), spark)
    assert(m("neg_count").asInstanceOf[Number].longValue == 1L)
    assert(m("row_count") == 5L)
    assert(spark.catalog.listTables().collect().isEmpty) // unique view dropped
  }
}

class EvaluatorSpec extends SparkSpec {
  import spark.implicits._

  test("missing required column and type mismatch are errors; widening is accepted") {
    val df = Seq((1, 1.5f)).toDF("a", "b") // a: int, b: float
    val c = Contract(id = "t.e", version = "1.0.0",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("a", Some("bigint"), required = true),  // int -> bigint widening: ok
        FieldDef("b", Some("int"), required = true),     // float vs int: mismatch
        FieldDef("c", Some("string"), required = true),  // missing: error
        FieldDef("d", Some("string"))))))                // missing optional: warning
    val res = Evaluator.validate(df, c)
    assert(!res.ok)
    assert(res.errors.exists(_.contains("type mismatch for b")))
    assert(res.errors.exists(_.contains("missing required column: c")))
    assert(!res.errors.exists(_.contains("type mismatch for a")))
    assert(res.warnings.exists(_.contains("missing optional column: d")))
  }

  test("expectation severities route violations to errors or warnings") {
    val df = Seq(1.0, -2.0).toDF("v")
    val c = Contract(id = "t.s", version = "1.0.0",
      schema = Seq(SchemaObjectDef("t", Seq(
        FieldDef("v", Some("double"),
          quality = Seq(QualityRule(mustBeGreaterThan = Some(BigDecimal(0)))))))))
    val asError = Evaluator.validate(df, c)
    assert(!asError.ok && asError.errors.exists(_.contains("not greater than")))
    val asWarning = Evaluator.validate(df, c,
      expectationSeverity = Evaluator.WarningSeverity)
    assert(asWarning.ok && asWarning.warnings.exists(_.contains("not greater than")))
  }

  test("validate on the demo broken contract reports all three defects") {
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val res = Evaluator.validate(li, DemoContracts.lineitemBroken)
    assert(!res.ok)
    assert(res.errors.exists(_.contains("missing required column: l_shipmode")))
    assert(res.errors.exists(_.contains("type mismatch for l_quantity")))
    assert(res.warnings.exists(_.contains("missing optional column: l_comment")))
  }
}

class ExpectationsSpec extends SparkSpec {
  test("fromContract derives the full spec set in field order, first key wins") {
    val specs = Expectations.fromContract(DemoContracts.lineitem)
    val keys = specs.map(_.key)
    assert(keys.distinct == keys)
    assert(keys.take(4) == Seq("not_null_l_orderkey", "not_null_l_partkey",
      "not_null_l_suppkey", "not_null_l_linenumber"))
    assert(keys.contains("gt_l_quantity") && keys.contains("le_l_quantity"))
    assert(keys.contains("enum_l_returnflag") && keys.contains("regex_l_linestatus"))
    assert(specs.size == 15)
  }

  test("sqlPredicate emits ANSI-ish predicates with escaping") {
    val enum_ = ExpectationSpec("e", "enum", Some("c"), values = Seq("a'b", "x"))
    assert(Expectations.sqlPredicate(enum_).contains("`c` IN ('a\\'b', 'x')"))
    val ge = ExpectationSpec("g", "ge", Some("c"), threshold = Some(BigDecimal("0.5")))
    assert(Expectations.sqlPredicate(ge).contains("`c` >= 0.5"))
  }
}

class TimestampNtzSpec extends SparkSpec {
  test("parquet timestamp_ntz satisfies a 'timestamp' contract declaration") {
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    assert(li.schema("l_shipdate").dataType ==
      org.apache.spark.sql.types.TimestampNTZType) // the Spark 4 read shape
    val res = Evaluator.validate(li, graft.DemoContracts.lineitem)
    assert(!res.errors.exists(_.contains("type mismatch")),
      res.errors.mkString("; ")) // threshold violations only, no type noise
  }
}
