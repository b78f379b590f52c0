package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Cross-cluster recall harness for SemDeDup blocking: measures the
  * boundary-pair blind spot of single-probe cluster assignment and pins
  * that [[VectorOps.semanticPairsMultiProbe]] recovers it — exactly once,
  * path-equivalently, and degenerating to the single-probe operator at
  * probes = 1. */
class SemanticMultiProbeSpec extends SparkSpec {
  import spark.implicits._

  // centroid seeds are the lowest vec_ids: 0 → x-axis, 1 → y-axis.
  // 2/3 sit inside cluster 0 (same-argmax near-dup pair); 5/6 straddle
  // the 45° boundary — cosine 0.994 between them, but argmax assigns 5
  // to cluster 0 and 6 to cluster 1, the classic SemDeDup miss.
  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(0.0f, 1.0f, 0.0f), 0),
    (2L, Array(1.0f, 0.05f, 0.0f), 0),
    (3L, Array(1.0f, 0.06f, 0.0f), 0),
    (5L, Array(1.0f, 0.9f, 0.0f), 0),
    (6L, Array(0.9f, 1.0f, 0.0f), 0)
  ).toDF("vec_id", "embedding", "label")

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_a", "vec_b").as[(Long, Long)].collect().toSet

  private def rows(df: DataFrame): Set[(Long, Long, Long, Double)] =
    df.select("vec_a", "vec_b", "cid", "cosine")
      .as[(Long, Long, Long, Double)].collect().toSet

  test("probes=1 degenerates to semanticPairs exactly") {
    val single = rows(VectorOps.semanticPairs(emb, threshold = 0.9, nCentroids = 2))
    val mp1 = rows(VectorOps.semanticPairsMultiProbe(emb, threshold = 0.9,
      nCentroids = 2, probes = 1))
    assert(mp1 == single)
  }

  test("probes=2 recovers the boundary pair single-probe misses, exactly once") {
    val single = pairSet(VectorOps.semanticPairs(emb, threshold = 0.9, nCentroids = 2))
    assert(single.contains((2L, 3L)) && !single.contains((5L, 6L)),
      "fixture must make (5,6) a cross-cluster pair")
    val mp = VectorOps.semanticPairsMultiProbe(emb, threshold = 0.9,
      nCentroids = 2, probes = 2)
    val mpPairs = pairSet(mp)
    assert(single.subsetOf(mpPairs), "multi-probe must not lose same-cluster pairs")
    assert(mpPairs.contains((5L, 6L)), "boundary pair must be recovered")
    // exactly-once: both members probe both clusters, yet the pair is
    // emitted only in the canonical (minimum shared) block
    val all = mp.select("vec_a", "vec_b").as[(Long, Long)].collect()
    assert(all.length == all.distinct.length, "no duplicate pair emissions")
  }

  test("adaptive probing replicates only ambiguous vectors, keeping boundary recall") {
    // margin 0.1: the boundary pair's argmax gap (~0.074) is inside the
    // margin so both members still probe both clusters; interior vectors
    // (gap ~0.95) collapse to single-probe — same output, less replication
    val full = rows(VectorOps.semanticPairsMultiProbe(emb, threshold = 0.9,
      nCentroids = 2, probes = 2))
    val adaptive = rows(VectorOps.semanticPairsMultiProbe(emb, threshold = 0.9,
      nCentroids = 2, probes = 2, probeMargin = 0.1))
    assert(adaptive == full)
    // margin 0 degenerates to single-probe (no exact cosine ties here)
    val zero = rows(VectorOps.semanticPairsMultiProbe(emb, threshold = 0.9,
      nCentroids = 2, probes = 2, probeMargin = 0.0))
    val single = rows(VectorOps.semanticPairs(emb, threshold = 0.9, nCentroids = 2))
    assert(zero == single)
    // join path agrees under adaptive margins too
    val joinPath = rows(VectorOps.semanticPairsMultiProbe(emb, threshold = 0.9,
      nCentroids = 2, probes = 2, probeMargin = 0.1, literalMax = 0))
    assert(joinPath == adaptive)
  }

  test("literal and broadcast-join assignment paths agree (multi-probe cutover)") {
    val lit = rows(VectorOps.semanticPairsMultiProbe(emb, threshold = 0.9,
      nCentroids = 2, probes = 2))
    val join = rows(VectorOps.semanticPairsMultiProbe(emb, threshold = 0.9,
      nCentroids = 2, probes = 2, literalMax = 0))
    assert(join == lit)
  }

  test("recall harness: boundary recall strictly improves with probes on a clustered corpus") {
    // 4 deterministic direction clusters with within-cluster jitter, plus
    // explicit boundary pairs between adjacent directions. Ground truth =
    // single-cluster blocking (every pair lands in one block → exact).
    val dirs = Seq(
      Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f),
      Array(0.0f, 0.0f, 1.0f), Array(0.7f, -0.7f, 0.14f))
    val members = (0 until 40).map { i =>
      val d = dirs(i % 4)
      val j = 0.01f * (i / 4)   // deterministic jitter, stays near its direction
      (i.toLong, Array(d(0) + j, d(1) + j * 0.5f, d(2)), 0)
    }
    // boundary rows: between dirs 0 and 1, mirrored — near-dups of each
    // other, argmax-split across the two clusters
    val boundary = Seq(
      (100L, Array(1.0f, 0.93f, 0.0f), 0), (101L, Array(0.93f, 1.0f, 0.0f), 0),
      (102L, Array(1.0f, 0.97f, 0.0f), 0), (103L, Array(0.97f, 1.0f, 0.0f), 0))
    val corpus = (members ++ boundary).toDF("vec_id", "embedding", "label")
    val truth = pairSet(VectorOps.semanticPairsMultiProbe(corpus, threshold = 0.9,
      nCentroids = 1, probes = 1, targetBlock = 16))
    assert(truth.nonEmpty)
    def recall(found: Set[(Long, Long)]): Double =
      found.intersect(truth).size.toDouble / truth.size
    val r1 = recall(pairSet(VectorOps.semanticPairs(corpus, threshold = 0.9,
      nCentroids = 4, targetBlock = 16)))
    val r2 = recall(pairSet(VectorOps.semanticPairsMultiProbe(corpus, threshold = 0.9,
      nCentroids = 4, probes = 2, targetBlock = 16)))
    assert(r1 < 1.0, s"fixture must have cross-cluster pairs (r1=$r1)")
    assert(r2 > r1, s"probes=2 must strictly improve boundary recall ($r2 vs $r1)")
    assert(r2 == 1.0, s"both boundary members probe the same two clusters → full recall, got $r2")
    // precision is exact on both paths (verification is the true cosine)
    assert(pairSet(VectorOps.semanticPairsMultiProbe(corpus, threshold = 0.9,
      nCentroids = 4, probes = 2, targetBlock = 16)).subsetOf(truth))
  }
}
