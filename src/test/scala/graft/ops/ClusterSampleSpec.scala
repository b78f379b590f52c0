package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSampleSpec extends SparkSpec {
  import spark.implicits._

  test("clusterSample bounds every cluster at cap with lowest-id survivors") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val cap = 3
    val out = VectorOps.clusterSample(e, nCentroids = 4, cap = cap)
      .as[(Long, Long)].collect()
    val byCid = out.groupBy(_._2)
    assert(byCid.nonEmpty && byCid.forall(_._2.length <= cap))
    // survivors are each cluster's lowest ids: re-running with a huge cap
    // recovers the full assignment, whose per-cluster minima must agree
    val full = VectorOps.clusterSample(e, nCentroids = 4, cap = 1 << 20)
      .as[(Long, Long)].collect()
    assert(full.length == e.count())
    val expect = full.groupBy(_._2).view.mapValues(
      _.map(_._1).sorted.take(cap).toSet).toMap
    assert(byCid.view.mapValues(_.map(_._1).toSet).toMap == expect)
  }

  test("empty corpus yields an empty selection, not a failure") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    assert(VectorOps.clusterSample(e.filter(col("vec_id") < 0)).count() == 0)
  }
}

class EpochOrderSpec extends SparkSpec {
  import spark.implicits._

  private def docs = (1L to 200L).map(i => (i, s"doc $i")).toDF("doc_id", "text")

  test("epochOrder is a reproducible permutation; epochs differ") {
    val e1 = Curate.epochOrder(docs, epoch = 1, nShards = 4)
      .as[(Long, Int, Long)].collect()
    // every doc exactly once; positions within a shard are 1..n dense
    assert(e1.map(_._1).toSet == (1L to 200L).toSet && e1.length == 200)
    e1.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1L to rows.length).toSeq)
    }
    // pure function of (epoch, id): re-run identical
    val e1b = Curate.epochOrder(docs, epoch = 1, nShards = 4)
      .as[(Long, Int, Long)].collect()
    assert(e1.sortBy(_._1).toSeq == e1b.sortBy(_._1).toSeq)
    // a different epoch reshuffles (some doc moves shard or position)
    val e2 = Curate.epochOrder(docs, epoch = 2, nShards = 4)
      .as[(Long, Int, Long)].collect()
    assert(e1.sortBy(_._1).toSeq != e2.sortBy(_._1).toSeq)
  }
}
