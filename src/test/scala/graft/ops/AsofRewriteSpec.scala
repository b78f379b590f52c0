package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private def trades = Seq(
    (1L, ts("2024-01-01 10:00:05"), 100.0),
    (1L, ts("2024-01-01 10:00:30"), 101.0),
    (2L, ts("2024-01-01 10:00:10"), 200.0),
    (3L, ts("2024-01-01 10:00:10"), 300.0) // key with no quotes at all
  ).toDF("key", "trade_ts", "trade_px")

  private def quotes = Seq(
    (1L, ts("2024-01-01 10:00:00"), 99.5),
    (1L, ts("2024-01-01 10:00:30"), 100.5), // exactly at trade time: visible
    (2L, ts("2024-01-01 10:00:20"), 199.5)  // after the only trade: not visible
  ).toDF("key", "quote_ts", "px")

  test("backward as-of join picks the latest right row at-or-before each left row") {
    val out = AsofJoin.asofBackward(trades, quotes, Seq("key"), "trade_ts", "quote_ts")
      .orderBy("key", "trade_ts").collect()
    assert(out(0).getAs[Double]("asof_px") == 99.5)
    assert(out(1).getAs[Double]("asof_px") == 100.5) // equal-timestamp quote visible
    assert(out(2).isNullAt(out(2).fieldIndex("asof_px"))) // quote is in the future
    assert(out(3).isNullAt(out(3).fieldIndex("asof_px"))) // no quotes for key
    assert(out(0).getAs[Timestamp]("asof_time") == ts("2024-01-01 10:00:00"))
  }

  test("forward as-of join picks the earliest right row at-or-after each left row") {
    val out = AsofJoin.asofForward(trades, quotes, Seq("key"), "trade_ts", "quote_ts")
      .orderBy("key", "trade_ts").collect()
    // trade 10:00:05 → next quote 10:00:30; trade 10:00:30 → the equal-ts quote
    assert(out(0).getAs[Double]("asof_px") == 100.5)
    assert(out(0).getAs[Timestamp]("asof_time") == ts("2024-01-01 10:00:30"))
    assert(out(1).getAs[Double]("asof_px") == 100.5) // equal timestamp visible
    assert(out(2).getAs[Double]("asof_px") == 199.5) // 10:00:10 → quote at :20
    assert(out(3).isNullAt(out(3).fieldIndex("asof_px"))) // no quotes for key
    // forward tolerance bounds rightTime - leftTime
    val tight = AsofJoin.asofForward(trades, quotes, Seq("key"), "trade_ts", "quote_ts",
      tolerance = Some(5L)).orderBy("key", "trade_ts").collect()
    assert(tight(0).isNullAt(tight(0).fieldIndex("asof_px"))) // 25s ahead > 5s
    assert(tight(1).getAs[Double]("asof_px") == 100.5)        // 0s ahead
  }

  test("tolerance nulls out stale matches") {
    val out = AsofJoin.asofBackward(trades, quotes, Seq("key"), "trade_ts", "quote_ts",
      tolerance = Some(3L)).orderBy("key", "trade_ts").collect()
    assert(out(0).isNullAt(out(0).fieldIndex("asof_px"))) // 5s old > 3s tolerance
    assert(out(1).getAs[Double]("asof_px") == 100.5)      // 0s old
  }
}

class RewriteDotFoldSpec extends SparkSpec {
  import spark.implicits._

  test("optimizer rewrites the zip_with/aggregate fold into graft_dot") {
    // range source: not constant-foldable, so the optimized plan is observable
    val df = spark.range(1, 4).select(
      transform(sequence(lit(1), lit(3)), i => i.cast("double") * col("id")).as("a"),
      transform(sequence(lit(1), lit(3)), i => i.cast("double")).as("b"))
    val folded = df.select(VectorOps.dotFold(col("a"), col("b")).as("d"))
    val optimized = folded.queryExecution.optimizedPlan
    val rewritten = optimized.expressions.exists(_.exists(_.isInstanceOf[graft.functions.DotProduct]))
    assert(rewritten, optimized.toString)
    // id=1: [1,2,3]·[1,2,3] = 14
    assert(folded.orderBy("d").collect().head.getDouble(0) == 14.0)
  }

  test("rewrite does not fire for nullable-element arrays") {
    val df = Seq((Seq(Option(1.0), None), Seq(Option(1.0), Option(2.0)))).toDF("a", "b")
    val folded = df.select(VectorOps.dotFold(col("a"), col("b")).as("d"))
    val rewritten = folded.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[graft.functions.DotProduct]))
    assert(!rewritten)
  }
}

class AsofNullPayloadSpec extends SparkSpec {
  import spark.implicits._
  import java.sql.Timestamp
  private def ts(s: String) = Timestamp.valueOf(s)

  test("newer right row with null fields does not resurrect older values (atomic carry)") {
    val trades = Seq((1L, ts("2024-01-01 10:00:35"), 1.0)).toDF("key", "trade_ts", "qty")
    val quotes = Seq[(Long, Timestamp, java.lang.Double, java.lang.Long)](
      (1L, ts("2024-01-01 10:00:00"), 99.5, 10L),
      (1L, ts("2024-01-01 10:00:30"), null, 20L) // latest quote has null px
    ).toDF("key", "quote_ts", "px", "sz")
    val out = AsofJoin.asofBackward(trades, quotes, Seq("key"), "trade_ts", "quote_ts").collect()(0)
    assert(out.isNullAt(out.fieldIndex("asof_px"))) // NOT 99.5 from the stale row
    assert(out.getAs[Long]("asof_sz") == 20L)
    assert(out.getAs[Timestamp]("asof_time") == ts("2024-01-01 10:00:30"))
  }
}

class SimhashRecallSpec extends SparkSpec {
  import spark.implicits._

  test("banded candidate generation loses no pairs vs exhaustive 1-bit banding") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
      (3L, "alpha beta gamma delta epsilon zeta eta theta mu lambda"),
      (4L, "one two three four five six seven eight nine ten"),
      (5L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    def pairsAt(h: Int) = NearDup.simhashPairs(docs, maxHamming = h)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("hamming")).toMap
    val exhaustive = pairsAt(63) // 64 one-bit bands: misses nothing below 64
    for (h <- Seq(4, 8, 16)) {
      val banded = pairsAt(h)
      val expected = exhaustive.filter(_._2 <= h)
      assert(banded == expected, s"maxHamming=$h: $banded vs $expected")
    }
  }
}
