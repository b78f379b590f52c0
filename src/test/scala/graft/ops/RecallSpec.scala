package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

/** Recall harnesses guarding the approximate candidate-generation paths
  * against banding/hash-family changes: MinHash-LSH vs the exact n-gram
  * ground truth, and random-hyperplane LSH vs the exact cosine pairs.
  * Also pins the triangle-grid pair join to the plain label join. */
class RecallSpec extends SparkSpec {

  private def pairSet(df: DataFrame, a: String, b: String): Set[(Long, Long)] =
    df.select(a, b).collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  private def docs01 = graft.T.load(spark, "/root/testdata/sf0.1", "documents")

  test("minhash LSH recall >= 0.85 vs exact n-gram pairs at sf0.1 (both hash modes)") {
    val truth = pairSet(NearDup.ngramPairs(docs01), "doc_a", "doc_b")
    assert(truth.nonEmpty, "ground-truth pair set must not be empty")
    for (mode <- Seq(HashMode.Default, HashMode.Portable)) {
      val found = pairSet(NearDup.minhashPairs(docs01, mode = mode), "doc_a", "doc_b")
      val recall = (found & truth).size.toDouble / truth.size
      assert(recall >= 0.85, s"$mode recall $recall < 0.85 (truth=${truth.size}, found=${found.size})")
      // minhash pairs are exact-verified, so precision is 1.0 by construction
      assert(found.subsetOf(truth), s"$mode emitted pairs below the Jaccard threshold")
    }
  }

  test("embeddingPairs triangle grid is output-identical to the plain label join") {
    val e = graft.T.load(spark, "/root/testdata/sf0.01", "embeddings")
    val plain = VectorOps.embeddingPairs(e).collect().toSet // g = 1 everywhere
    val grid = VectorOps.embeddingPairs(e, targetBlock = 8).collect().toSet // forces g >= 7
    assert(plain.nonEmpty)
    assert(grid == plain)
  }

  test("embeddingPairsLsh recall >= 0.9 vs exact pairs at the low-threshold setting") {
    val e = graft.T.load(spark, "/root/testdata/sf0.01", "embeddings")
    val truth = pairSet(VectorOps.embeddingPairs(e, threshold = 0.35), "vec_a", "vec_b")
    assert(truth.nonEmpty)
    // low-threshold regime: 2-bit bands, 15 of them — P[miss true pair] ~ 8e-4
    val found = pairSet(
      VectorOps.embeddingPairsLsh(e, threshold = 0.35, nBits = 30, bandBits = 2),
      "vec_a", "vec_b")
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall < 0.9 (truth=${truth.size}, found=${found.size})")
    assert(found.subsetOf(truth), "LSH emitted pairs below the cosine threshold")
  }
}
