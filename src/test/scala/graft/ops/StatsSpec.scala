package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class StatsSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L),
    ("b", 10L), ("b", 20L),
    ("c", 7L)
  ).toDF("g", "v")

  test("groupedQuantiles interpolates exactly on quarter fractions") {
    val out = Stats.groupedQuantiles(df, Seq("g"), "v", Seq(0.25, 0.5, 0.75))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5), r.getDouble(6))).toMap
    // a = [1,2,3,4]: p25 = 1.75, p50 = 2.5, p75 = 3.25
    assert(out("a") == ((4L, 1L, 4L, 1.75, 2.5, 3.25)))
    // b = [10,20]: p25 = 12.5, p50 = 15, p75 = 17.5
    assert(out("b") == ((2L, 10L, 20L, 12.5, 15.0, 17.5)))
    // singleton: every quantile is the value
    assert(out("c") == ((1L, 7L, 7L, 7.0, 7.0, 7.0)))
  }

  test("null values are ignored; all-null group yields zero count") {
    val withNulls = Seq(("a", Some(1L)), ("a", None), ("z", None))
      .toDF("g", "v")
    val out = Stats.groupedQuantiles(withNulls, Seq("g"), "v", Seq(0.5))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map("a" -> 1L, "z" -> 0L))
  }

  test("approx path matches exact on small groups and shares the schema") {
    val exact = Stats.groupedQuantiles(df, Seq("g"), "v", Seq(0.5))
    val approx = Stats.groupedQuantilesApprox(df, Seq("g"), "v", Seq(0.5))
    assert(exact.schema.map(f => (f.name, f.dataType)) ==
      approx.schema.map(f => (f.name, f.dataType)))
    // approx_percentile is exact when the group fits one digest node; it
    // returns an actual element (no interpolation), so compare medians of
    // odd-sized groups only
    val e = exact.filter($"g" === "c").select("p50").as[Double].head()
    val a = approx.filter($"g" === "c").select("p50").as[Double].head()
    assert(e == a)
  }

  test("fraction column naming handles non-integer percents") {
    val out = Stats.groupedQuantiles(df, Seq("g"), "v", Seq(0.5, 0.999))
    assert(out.columns.toSeq == Seq("g", "n", "min_v", "max_v", "p50", "p99_9"))
  }

  test("psiByGroup: matching distributions score ~0, a shifted group scores high") {
    import spark.implicits._
    // a and b mirror the corpus mix; c lives in bins the others never hit
    val rows: Seq[(String, Option[Long])] =
      (1L to 50L).map(i => ("a", Some((i % 5) * 10L))) ++
      (1L to 50L).map(i => ("b", Some((i % 5) * 10L))) ++
      (1L to 50L).map(i => ("c", Some(1000L + (i % 5) * 10L))) :+
      (("a", None)) // null dropped
    val df2 = rows.toDF("src", "v")
    val out = Stats.psiByGroup(df2, "v", "src", binWidth = 10)
      .as[(String, Double)].collect().toMap
    assert(out.keySet == Set("a", "b", "c"))
    // a and b share c-free bins: their shares differ from the corpus only
    // by c's mass — equal PSIs, both far below c's
    assert(out("a") == out("b"))
    assert(out("c") > out("a") && out("c") > 0.25,
      s"shifted group must breach the action threshold: $out")
    // the eps substitution keeps zero-bin groups finite
    assert(!out.values.exists(_.isInfinite))
  }
}
