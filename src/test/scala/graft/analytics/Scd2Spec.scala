package graft.analytics

import graft.SparkSpec
import org.apache.spark.sql.functions._

class Scd2Spec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("scd2: consecutive equal runs collapse; versions and validity chain") {
    val orders = Seq(
      // key 1: O O F O — runs O[1..2], F[3], O[4]
      (1L, "O", ts("2024-01-01 00:00:00"), 10L),
      (1L, "O", ts("2024-01-02 00:00:00"), 11L),
      (1L, "F", ts("2024-01-03 00:00:00"), 12L),
      (1L, "O", ts("2024-01-04 00:00:00"), 13L),
      // key 2: single row — one current version
      (2L, "P", ts("2024-02-01 00:00:00"), 20L)
    ).toDF("k", "status", "at", "tie")
    val out = Analytics.scd2(orders, "k", "status", "at", "tie")
      .orderBy("k", "version").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("O", "F", "O"))
    assert(k1.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L))
    // each version's valid_to is the next version's valid_from
    assert(k1(0).getTimestamp(3) == k1(1).getTimestamp(2))
    assert(k1(1).getTimestamp(3) == k1(2).getTimestamp(2))
    // only the last version is current (null valid_to)
    assert(k1.map(_.getBoolean(5)).toSeq == Seq(false, false, true))
    val k2 = out.filter(_.getLong(0) == 2L)
    assert(k2.length == 1 && k2.head.getBoolean(5) && k2.head.isNullAt(3))
  }

  test("scd2: same-timestamp updates resolve by the tie column; null attr is a value") {
    val orders = Seq(
      // equal timestamps: tie order decides the run sequence A -> B
      (1L, Some("A"), ts("2024-01-01 00:00:00"), 1L),
      (1L, Some("B"), ts("2024-01-01 00:00:00"), 2L),
      // null attribute opens its own run and closes on the next change
      (3L, None, ts("2024-01-01 00:00:00"), 1L),
      (3L, None, ts("2024-01-02 00:00:00"), 2L),
      (3L, Some("X"), ts("2024-01-03 00:00:00"), 3L)
    ).toDF("k", "status", "at", "tie")
    val out = Analytics.scd2(orders, "k", "status", "at", "tie")
      .orderBy("k", "version").collect()
    val k1 = out.filter(_.getLong(0) == 1L)
    assert(k1.map(_.getString(1)).toSeq == Seq("A", "B"))
    val k3 = out.filter(_.getLong(0) == 3L)
    assert(k3.length == 2)
    assert(k3(0).isNullAt(1) && k3(1).getString(1) == "X")
    // the two consecutive nulls are ONE run (null-safe equality)
    assert(k3(0).getTimestamp(2) == ts("2024-01-01 00:00:00"))
  }

  test("cubeSummary: gid bitmask distinguishes rolled-up from genuine groups") {
    val li = Seq(
      ("A", "F", 1.0, 10.0), ("A", "O", 2.0, 20.0), ("B", "F", 3.0, 30.0)
    ).toDF("l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice")
    val out = Analytics.cubeSummary(li).collect()
      .map(r => (Option(r.getString(0)), Option(r.getString(1)), r.getLong(2)) ->
        (r.getLong(3), r.getDouble(4))).toMap
    // 4 grouping sets over 2 cols: (a,b) gid=0, (a) gid=1, (b) gid=2, () gid=3
    assert(out((Some("A"), Some("F"), 0L)) == ((1L, 1.0)))
    assert(out((Some("A"), None, 1L)) == ((2L, 3.0)))
    assert(out((None, Some("F"), 2L)) == ((2L, 4.0)))
    assert(out((None, None, 3L)) == ((3L, 6.0)))
    assert(out.size == 8)
  }
}
