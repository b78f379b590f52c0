package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TopKSpec extends SparkSpec {
  import spark.implicits._

  test("topKPerKey matches the row_number window formulation exactly") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val scored = VectorOps.prepared(e).crossJoin(
        broadcast(VectorOps.prepared(e).filter(col("vec_id") < 5)
          .select(col("vec_id").as("probe_id"), col("v").as("pv"), col("nrm").as("pn"))))
      .filter(col("vec_id") =!= col("probe_id"))
      .withColumn("cosine", round(VectorOps.dot(col("pv"), col("v")) / (col("pn") * col("nrm")), 6))
      .select("probe_id", "vec_id", "cosine")
    val viaWindow = VectorOps.annBrute(e, nProbes = 5, topK = 3)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    val viaAgg = TopK.topKPerKey(scored, "probe_id", "vec_id", "cosine", 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSet
    assert(viaAgg == viaWindow)
  }

  test("bounded buffer keeps deterministic order under merge") {
    val df = Seq(
      (1L, 10L, 0.5), (1L, 11L, 0.9), (1L, 12L, 0.9), (1L, 13L, 0.1),
      (2L, 20L, 0.3)
    ).toDF("k", "id", "s")
    val out = TopK.topKPerKey(df, "k", "id", "s", 2)
      .orderBy("k", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // ties on 0.9 break on smaller id
    assert(out == Seq((1L, 11L, 1L), (1L, 12L, 2L), (2L, 20L, 1L)))
  }

  test("NaN and null scores are excluded deterministically") {
    // a NaN entering the bounded buffer would sort inconsistently (its
    // position would depend on partition arrival order) — it must be
    // filtered, not ranked first the way a row_number window would
    val df = Seq(
      (1L, 10L, Double.NaN), (1L, 11L, 0.9), (1L, 12L, 0.5), (1L, 13L, Double.NaN),
      (2L, 20L, Double.NaN)
    ).toDF("k", "id", "s")
    val out = TopK.topKPerKey(df, "k", "id", "s", 2)
      .orderBy("k", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, 11L, 1L), (1L, 12L, 2L))) // key 2: all-NaN -> absent
    val withNull = Seq((1L, 10L, Some(0.7)), (1L, 11L, None)).toDF("k", "id", "s")
    assert(TopK.topKPerKey(withNull, "k", "id", "s", 2).count() == 1)
  }

  test("topKPerKeyStr ranks string ids with score-desc, id-asc tiebreaks") {
    val df = Seq(
      (1L, "beta", 0.9), (1L, "alpha", 0.9), (1L, "gamma", 0.5), (1L, "delta", 0.1),
      (2L, "only", 0.3), (3L, "nan", Double.NaN)
    ).toDF("k", "id", "s")
    val out = TopK.topKPerKeyStr(df, "k", "id", "s", 2)
      .orderBy("k", "rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((1L, "alpha", 1L), (1L, "beta", 2L), (2L, "only", 1L)))
    // null ids are dropped (no deterministic tiebreak possible)
    val withNullId = Seq((1L, Some("a"), 0.5), (1L, None, 0.9)).toDF("k", "id", "s")
    assert(TopK.topKPerKeyStr(withNullId, "k", "id", "s", 2).count() == 1)
  }
}
