package graft.strategies

import graft.SparkSpec
import graft.quality.{ExpectationSpec, Expectations, ValidationResult}
import org.apache.spark.sql.functions._

class StrategiesSpec extends SparkSpec {
  import spark.implicits._

  // no not_null spec on v: a null v makes `v > 0` (and the composite) NULL,
  // exercising the three-valued neither-subset path
  private val specs = Seq(
    ExpectationSpec("gt_v", "gt", Some("v"), threshold = Some(BigDecimal(0))),
    ExpectationSpec("enum_tag", "enum", Some("tag"), values = Seq("a", "b")))

  private def df = Seq[(Integer, java.lang.Double, String)](
    (1, 5.0, "a"), (2, -1.0, "a"), (3, null, "b"), (4, 2.0, "zzz")
  ).toDF("id", "v", "tag")

  private val violated = ValidationResult(ok = false,
    errors = Seq("x"), warnings = Nil,
    metrics = Map("violations.gt_v" -> 1L), schema = Map.empty)
  private val clean = ValidationResult(ok = true, Nil, Nil, Map("violations.gt_v" -> 0L), Map.empty)

  test("split: valid/reject are three-valued complements, null rows in neither") {
    val plan = SplitStrategy().plan(df, specs, violated)
    assert(plan.primary.isEmpty && plan.additional.size == 2)
    val valid = plan.additional.find(_.pathSuffix.contains("valid")).get.df
    val reject = plan.additional.find(_.pathSuffix.contains("reject")).get.df
    assert(valid.select("id").as[Int].collect().toSet == Set(1))
    assert(reject.select("id").as[Int].collect().toSet == Set(2, 4))
    // row 3 (null v -> null predicate) lands nowhere, like the reference
  }

  test("split passes through untouched when validation is clean") {
    val plan = SplitStrategy().plan(df, specs, clean)
    assert(plan.primary.nonEmpty && plan.additional.isEmpty)
  }

  test("flag: per-row failed expectation keys, null for clean rows") {
    val plan = FlagStrategy().plan(df, specs, violated)
    val out = plan.primary.get.df.orderBy("id")
      .select(col("id"), col("_corrupted_data")).as[(Int, Option[Seq[String]])].collect()
    assert(out(0)._2.isEmpty)                     // clean row
    assert(out(1)._2.contains(Seq("gt_v")))
    assert(out(2)._2.isEmpty)                     // NULL predicate yields no flag
    assert(out(3)._2.contains(Seq("enum_tag")))
  }

  test("strict: fails on violations, passes through when clean") {
    assert(StrictStrategy().plan(df, specs, violated).failWith.nonEmpty)
    assert(StrictStrategy().plan(df, specs, clean).failWith.isEmpty)
    val warned = clean.copy(warnings = Seq("w"))
    assert(StrictStrategy(failOnWarnings = true).plan(df, specs, warned).failWith.nonEmpty)
    assert(StrictStrategy().plan(df, specs, warned).failWith.isEmpty)
  }

  test("passAll over the real lineitem contract matches filter counts") {
    val li = graft.T.load(spark, "/root/testdata/sf0.001", "lineitem")
    val s = Expectations.fromContract(graft.DemoContracts.lineitem)
    val pass = Strategies.passAll(s)
    val nValid = li.filter(pass).count()
    val nReject = li.filter(!pass).count()
    assert(nValid + nReject == li.count()) // no nulls in this table
    assert(nValid > 0 && nReject > 0)
  }
}
