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
