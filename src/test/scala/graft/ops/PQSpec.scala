package graft.ops

import graft.SparkSpec

class PQSpec extends SparkSpec {

  private def e = graft.T.load(spark, "/root/testdata/sf0.01", "embeddings")

  test("codebooks are deterministic and correctly shaped") {
    val b1 = PQ.train(e, m = 8, k = 16, iterations = 1)
    val b2 = PQ.train(e, m = 8, k = 16, iterations = 1)
    assert(b1.length == 8 && b1.forall(_.length == 16) && b1.forall(_.forall(_.length == 8)))
    assert(b1.flatten.flatten.toSeq == b2.flatten.flatten.toSeq)
  }

  test("encoding assigns every vector a full code array in range") {
    val books = PQ.train(e, iterations = 0)
    val codes = PQ.encode(e, books).collect()
    assert(codes.length == e.count())
    codes.foreach { r =>
      val cs = r.getSeq[Int](3)
      assert(cs.length == 8 && cs.forall(c => c >= 0 && c < 16))
    }
  }

  test("annPq with exact re-rank recalls most brute-force neighbours") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val truth = pairs(VectorOps.annBrute(e))
    val found = pairs(PQ.annPq(e))
    val recall = (found & truth).size.toDouble / truth.size
    assert(recall >= 0.5, s"PQ recall@5 $recall < 0.5 (truth=${truth.size})")
    // survivors are exactly ranked: cosine must be the true cosine
    val brute = VectorOps.annBrute(e).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(3)).toMap
    PQ.annPq(e).collect().foreach { r =>
      val key = (r.getLong(0), r.getLong(1))
      brute.get(key).foreach(c => assert(c == r.getDouble(3),
        s"re-ranked cosine for $key diverged"))
    }
  }

  test("annIvfPq prunes to probed clusters and still recalls IVF's neighbours") {
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    // compare against annIvf at the SAME coarse pruning (nProbeClusters=2):
    // the additional loss should come only from PQ quantization, which the
    // exact re-rank largely recovers
    val ivf = pairs(VectorOps.annIvf(e, nProbeClusters = 4))
    val ivfpq = pairs(PQ.annIvfPq(e, nProbeClusters = 4, rerank = 8))
    val recall = (ivfpq & ivf).size.toDouble / ivf.size
    assert(recall >= 0.5, s"IVFPQ recall vs IVF $recall < 0.5")
    // empty corpus is graceful
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(PQ.annIvfPq(empty).count() == 0)
  }

  test("static least() encoding is bit-identical to the sorted-array spelling") {
    import org.apache.spark.sql.functions.{array, col, lit}
    val emb = e
    val books = PQ.train(emb, m = 8, k = 16, iterations = 1)
    val prep = VectorOps.prepared(emb)
    val nBlocks = books.length
    val dsub = books.head.head.length
    val booksLit = array(books.map(blk =>
      array(blk.map(c => array(c.map(lit): _*)): _*)): _*)
    val both = prep.select(col("vec_id"),
      PQ.encodeExpr(booksLit, nBlocks, dsub).as("sorted"),
      PQ.encodeExprStatic(books).as("static"))
    assert(both.filter(col("sorted") =!= col("static")).count() == 0)
  }

  test("semanticPairsPq with full margin equals the raw-vector operator exactly") {
    import spark.implicits._
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cid", "cosine")
        .as[(Long, Long, Long, Double)].collect().toSet
    // margin 2.0 disables the approx prefilter entirely: the exact-verify
    // tail then decides membership alone, so the output must equal
    // semanticPairs bit-for-bit (same assignment, same exact cosine)
    val exact = rows(VectorOps.semanticPairs(e, threshold = 0.4))
    val full = rows(PQ.semanticPairsPq(e, threshold = 0.4, margin = 2.0,
      iterations = 1))
    assert(full == exact)
    // a real margin keeps a subset (quantization may prune), never junk
    val pruned = rows(PQ.semanticPairsPq(e, threshold = 0.4, margin = 0.2,
      iterations = 1))
    assert(pruned.subsetOf(exact))
    assert(pruned.nonEmpty, "0.2 margin should retain the near-dup pairs")
    // empty corpus is total
    val emptyEmb = Seq.empty[(Long, Array[Float], Int)]
      .toDF("vec_id", "embedding", "label")
    assert(PQ.semanticPairsPq(emptyEmb).count() == 0)
  }

  test("larger rerank pools improve (or keep) recall") {
    def recallAt(rr: Int): Double = {
      val truth = VectorOps.annBrute(e).select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val found = PQ.annPq(e, rerank = rr).select("probe_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (found & truth).size.toDouble / truth.size
    }
    val r2 = recallAt(2)
    val r8 = recallAt(8)
    assert(r8 >= r2, s"recall must not degrade with a larger pool: rr2=$r2 rr8=$r8")
  }
}
