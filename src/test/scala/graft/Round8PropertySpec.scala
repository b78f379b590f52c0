package graft

import graft.contracts._
import org.scalacheck.Gen

/** Property-style invariants for the round-8 surfaces, sampled with the
  * deterministic [[ContractGen.sample]] harness. */
class Round8PropertySpec extends SparkSpec {
  import spark.implicits._

  private val genRows: Gen[List[(String, Double)]] = Gen.nonEmptyListOf(for {
    g <- Gen.oneOf("a", "b", "c")
    v <- Gen.chooseNum(-1000.0, 1000.0)
  } yield (g, math.round(v * 100) / 100.0)).map(_.take(40))

  test("winsorize invariants: totality, bounded output, interior identity") {
    for (rows <- ContractGen.sample(genRows, 5, seed = 101L)) {
      val df = rows.zipWithIndex.map { case ((g, v), i) => (g, i.toLong, v) }
        .toDF("g", "id", "v")
      val out = graft.ops.Stats.winsorize(df, "g", "v", Seq("id")).collect()
      assert(out.length == rows.size, "every non-null row survives")
      out.groupBy(_.getString(1)).foreach { case (_, rs) =>
        val clipped = rs.map(_.getDouble(3))
        val flagged = rs.filter(_.getBoolean(4))
        // clipped range is never wider than the raw range
        assert(clipped.max <= rs.map(_.getDouble(2)).max + 1e-9)
        assert(clipped.min >= rs.map(_.getDouble(2)).min - 1e-9)
        // unflagged rows pass through bit-identically
        rs.filterNot(_.getBoolean(4)).foreach(r =>
          assert(r.getDouble(2) == r.getDouble(3)))
        // flagged rows moved
        flagged.foreach(r => assert(r.getDouble(2) != r.getDouble(3)))
      }
    }
  }

  test("scd2 invariants: contiguous versions, one current row per key, chained validity") {
    val genEvents: Gen[List[(Long, String, Int)]] = Gen.nonEmptyListOf(for {
      k <- Gen.chooseNum(1L, 4L)
      s <- Gen.oneOf("A", "B", "C")
      d <- Gen.chooseNum(1, 27)
    } yield (k, s, d)).map(_.take(30))
    for ((rows, i) <- ContractGen.sample(genEvents, 5, seed = 202L).zipWithIndex) {
      val df = rows.zipWithIndex.map { case ((k, s, d), tie) =>
        (k, s, java.sql.Timestamp.valueOf(f"2024-01-$d%02d 00:00:00"), tie.toLong)
      }.toDF("k", "status", "at", "tie")
      val h = graft.analytics.Analytics.scd2(df, "k", "status", "at", "tie")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getTimestamp(2),
          Option(r.getTimestamp(3)), r.getLong(4), r.getBoolean(5)))
      h.groupBy(_._1).foreach { case (k, vsArr) =>
        val vs = vsArr.toSeq
        val sorted = vs.sortBy(_._5)
        assert(sorted.map(_._5).toSeq == (1L to vs.size).toSeq,
          s"sample $i key $k: versions must be contiguous")
        assert(vs.count(_._6) == 1, s"sample $i key $k: exactly one current")
        assert(sorted.last._6 && sorted.last._4.isEmpty)
        // validity chains: each valid_to is the next valid_from
        sorted.sliding(2).foreach {
          case Seq(a, b) => assert(a._4.contains(b._3),
            s"sample $i key $k: broken chain")
          case _ =>
        }
        // consecutive versions never share a status (else no new version)
        sorted.sliding(2).foreach {
          case Seq(a, b) => assert(a._2 != b._2)
          case _ =>
        }
      }
    }
  }

  test("ewma invariant: every running average stays inside its prefix envelope") {
    val genSeries: Gen[List[Double]] = Gen.nonEmptyListOf(
      Gen.chooseNum(-500.0, 500.0).map(v => math.round(v * 100) / 100.0)).map(_.take(25))
    for (series <- ContractGen.sample(genSeries, 5, seed = 303L)) {
      val df = series.zipWithIndex.map { case (v, i) =>
        (i.toLong, java.sql.Timestamp.valueOf(f"2024-01-01 10:${i / 60}%02d:${i % 60}%02d"),
          1L, "view", v)
      }.toDF("event_id", "ts", "user_id", "event_type", "value")
      val out = graft.analytics.Analytics.ewma(df)
        .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
      series.indices.foreach { i =>
        val prefix = series.take(i + 1).map(v => math.round(v * 1e6))
        val e = out(i.toLong)
        assert(e >= prefix.min && e <= prefix.max,
          s"ewma at $i left the prefix envelope: $e not in [${prefix.min}, ${prefix.max}]")
      }
    }
  }

  test("Compat invariants: self-diff empty, bump monotone under widening") {
    for (c <- ContractGen.sample(ContractGen.genContract, 10, seed = 404L)) {
      val d = Compat.diff(c, c)
      assert(d.isEmpty, s"self-diff must be empty: $d")
      assert(Compat.recommendedBump(d) == "patch")
      assert(Compat.isCompatible(c, c))
      // dropping every requirement is never breaking
      val loosened = c.copy(schema = c.schema.map(o => o.copy(
        properties = o.properties.map(_.copy(required = false, unique = false)))))
      assert(Compat.isCompatible(c, loosened),
        "loosening requiredness/uniqueness must stay compatible")
    }
  }
}
