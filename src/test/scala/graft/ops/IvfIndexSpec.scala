package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfIndexSpec extends SparkSpec {
  import spark.implicits._

  private def probesOf(e: org.apache.spark.sql.DataFrame, n: Int) =
    VectorOps.prepared(e).filter(col("vec_id") < n)
      .select(col("vec_id").as("probe_id"), col("v"), col("nrm"))

  test("indexed search returns exactly what the logical annIvf computes") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("graft_ivfidx")
    IvfIndex.build(e, dir, nCentroids = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "rank", "cosine")
        .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val logical = rows(VectorOps.annIvf(e, nCentroids = 16, nProbes = 8,
      nProbeClusters = 3, topK = 4))
    val indexed = rows(IvfIndex.search(spark, dir, probesOf(e, 8),
      nProbeClusters = 3, topK = 4))
    assert(indexed == logical)
  }

  test("indexed searchRadius equals the logical annIvfRadius on the pruned layout") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("graft_ivfidx_radius")
    IvfIndex.build(e, dir, nCentroids = 16)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "cosine")
        .as[(Long, Long, Double)].collect().sorted.toSeq
    val logical = rows(VectorOps.annIvfRadius(e, threshold = 0.3,
      nCentroids = 16, nProbes = 8, nProbeClusters = 3))
    val indexed = rows(IvfIndex.searchRadius(spark, dir, probesOf(e, 8),
      threshold = 0.3, nProbeClusters = 3))
    assert(indexed == logical)
    assert(logical.nonEmpty, "radius 0.3 should catch neighbors on this corpus")
    // radius results are exactly the above-threshold slice of the pruned
    // candidate set: every annIvf hit above the threshold appears
    val topAbove = VectorOps.annIvf(e, nCentroids = 16, nProbes = 8,
      nProbeClusters = 3, topK = 4)
      .filter(col("cosine") >= 0.3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val radiusPairs = logical.map(t => (t._1, t._2)).toSet
    assert(topAbove.subsetOf(radiusPairs))
  }

  test("indexed semanticPairs equals the logical operator, incl. sub-sharded layouts") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    def pairs(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_a", "vec_b", "cosine")
        .as[(Long, Long, Double)].collect().sorted.toSeq
    val logical = pairs(VectorOps.semanticPairs(e, threshold = 0.4, nCentroids = 8))
    assert(logical.nonEmpty, "threshold 0.4 must fire on this corpus")
    val dir = tmpDir("graft_ivfidx_sem")
    IvfIndex.build(e, dir, nCentroids = 8)
    assert(pairs(IvfIndex.semanticPairs(spark, dir, threshold = 0.4)) == logical)
    // sub-sharded leaves must not hide within-cluster pairs
    val dir2 = tmpDir("graft_ivfidx_sem_sub")
    IvfIndex.build(e, dir2, nCentroids = 8, maxRowsPerPartition = 8)
    assert(pairs(IvfIndex.semanticPairs(spark, dir2, threshold = 0.4)) == logical)
  }

  test("spread-seeded build matches the logical spread-seeded annIvf and balances clusters") {
    // clustered corpus: 90% of vectors share one direction (+tiny id-keyed
    // jitter so directions are distinct), 10% are spread — lowest-id seeds
    // all land inside the hot region, spread seeds must not
    val n = 400
    val base = spark.range(n).select(col("id").as("vec_id"), lit(0L).as("label"),
      when(pmod(col("id"), lit(10)) < 9,
        transform(sequence(lit(1), lit(8)),
          i => (lit(1.0) + col("id") * lit(1e-4) * i).cast("float")))
        .otherwise(transform(sequence(lit(1), lit(8)),
          i => (when(pmod(col("id"), lit(8)) === pmod(i, lit(8)), 100.0)
            .otherwise(lit(1.0)) + col("id") * lit(1e-4)).cast("float")))
        .as("embedding"))
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "rank", "cosine")
        .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val dir = tmpDir("graft_ivfidx_spread")
    IvfIndex.build(base, dir, nCentroids = 8, spreadSeed = true)
    val logical = rows(VectorOps.annIvf(base, nCentroids = 8, nProbes = 5,
      nProbeClusters = 2, topK = 3, spreadSeed = true))
    val indexed = rows(IvfIndex.search(spark, dir, probesOf(base, 5),
      nProbeClusters = 2, topK = 3))
    assert(indexed == logical)
    // balance: the hot cluster's share of the corpus must drop vs lowest-id
    // seeding (where seeds 0..7 are all hot-region members)
    def maxShare(seeds: org.apache.spark.sql.DataFrame): Double = {
      val e = VectorOps.prepared(base)
      val cLit = VectorOps.centroidLiteralOf(
        seeds.select(col("cid"), col("cv"), col("cn")).collect()).get
      val sizes = e.withColumn("cid",
        element_at(VectorOps.nearestClusterArray(cLit, 1), 1).getField("cid"))
        .groupBy("cid").count().select(max("count")).head().getLong(0)
      sizes.toDouble / n
    }
    val e = VectorOps.prepared(base)
    val lowShare = maxShare(VectorOps.seedLowestIds(e, 8))
    val spreadShare = maxShare(VectorOps.seedCentroidsSpread(e, 8))
    assert(spreadShare < lowShare,
      s"spread seeding did not improve balance: $spreadShare vs $lowShare")
    // spread picks distinct directions: 8 distinct centroid ids
    assert(VectorOps.seedCentroidsSpread(e, 8).select("cid").distinct().count() == 8)
  }

  test("spread seeding survives a zero-norm vector at the lowest vec_id") {
    // vec_id 0 is all-zero: cosine against it is NaN for every vector, so
    // an unguarded first pick would poison every max-cosine round and
    // collapse the seed set to one centroid
    val base = spark.range(40).select(col("id").as("vec_id"), lit(0L).as("label"),
      when(col("id") === 0, transform(sequence(lit(1), lit(4)), _ => lit(0.0f)))
        .otherwise(transform(sequence(lit(1), lit(4)),
          i => (when(pmod(col("id"), lit(4)) === pmod(i, lit(4)), 10.0)
            .otherwise(lit(1.0)) + col("id") * lit(1e-3)).cast("float")))
        .as("embedding"))
    val seeds = VectorOps.seedCentroidsSpread(VectorOps.prepared(base), 4)
    assert(seeds.select("cid").distinct().count() == 4)
    // the zero-norm vector itself is never a seed
    assert(seeds.filter(col("cid") === 0).count() == 0)
  }

  test("the data read prunes to probed cluster partitions (PartitionFilters, not row filters)") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("graft_ivfidx_prune")
    IvfIndex.build(e, dir, nCentroids = 16)
    val out = IvfIndex.search(spark, dir, probesOf(e, 2), nProbeClusters = 2, topK = 3)
    // pre-AQE physical plan: AdaptiveSparkPlanExec hides the scan from
    // executedPlan.collect until execution
    val plan = out.queryExecution.sparkPlan.toString
    // the cid IN (...) predicate must land in the scan's PartitionFilters
    assert(plan.contains("PartitionFilters") &&
      plan.split("PartitionFilters").exists(s => s.take(200).contains("cid")),
      s"expected cid partition filter in:\n${plan.take(2000)}")
    // and only the probed partition directories are actually read
    val scans = out.queryExecution.sparkPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }
    assert(scans.nonEmpty)
    val probed = scans.head.relation.location.listFiles(
      scans.head.partitionFilters, scans.head.dataFilters).size
    val total = spark.read.parquet(s"$dir/data").select("cid").distinct().count()
    assert(probed <= 4 && probed < total,
      s"probed $probed of $total partitions — pruning did not engage")
  }

  test("sub-sharded build bounds leaf partitions under cluster skew, search unchanged") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val plain = tmpDir("graft_ivfidx_plain")
    val sharded = tmpDir("graft_ivfidx_sub")
    // 2 centroids over the whole corpus -> deliberately fat clusters
    IvfIndex.build(e, plain, nCentroids = 2)
    IvfIndex.build(e, sharded, nCentroids = 2, maxRowsPerPartition = 20)
    def rows(dir: String) =
      IvfIndex.search(spark, dir, probesOf(e, 5), nProbeClusters = 1, topK = 3)
        .select("probe_id", "neighbor_id", "rank", "cosine")
        .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(rows(sharded) == rows(plain))
    // id-residue sharding is statistical: leaves hold ~bound rows (the
    // contract is "no giant partitions", not exact equality) — assert a
    // 2x envelope and that sharding actually engaged
    val leaves = spark.read.parquet(s"$sharded/data").groupBy("cid", "sub").count()
    val leafMax = leaves.agg(max("count")).head().getLong(0)
    assert(leafMax <= 40, s"leaf partition holds $leafMax rows")
    assert(leaves.count() > 2, "expected multiple sub-shards per fat cluster")
    assert(spark.read.parquet(s"$sharded/data").count() == e.count())
  }

  test("build + search round-trips Lloyd-refined centroids and empty probes") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val dir = tmpDir("graft_ivfidx_lloyd")
    IvfIndex.build(e, dir, nCentroids = 8, kmeansIters = 1)
    val logical = VectorOps.annIvf(e, nCentroids = 8, nProbes = 5,
      nProbeClusters = 2, topK = 3, kmeansIters = 1)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val indexed = IvfIndex.search(spark, dir, probesOf(e, 5),
      nProbeClusters = 2, topK = 3)
      .select("probe_id", "neighbor_id", "rank", "cosine")
      .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    assert(indexed == logical)
    assert(IvfIndex.search(spark, dir, probesOf(e, 0)).count() == 0)
  }

  test("append grows the index in place; search equals the logical operator on the full corpus") {
    val all = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    // arrivals carry HIGHER vec_ids than the corpus, so the full-corpus
    // logical annIvf seeds the same lowest-id centroids the build froze
    val corpus = all.filter(col("vec_id") < 400)
    val arrivals = all.filter(col("vec_id") >= 400)
    val dir = tmpDir("ivf_append")
    IvfIndex.build(corpus, dir, nCentroids = 16)
    IvfIndex.append(spark, dir, arrivals)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("probe_id", "neighbor_id", "rank", "cosine")
        .as[(Long, Long, Long, Double)].collect().sorted.toSeq
    val logical = rows(VectorOps.annIvf(all, nCentroids = 16, nProbes = 8,
      nProbeClusters = 3, topK = 4))
    val indexed = rows(IvfIndex.search(spark, dir, probesOf(all, 8),
      nProbeClusters = 3, topK = 4))
    assert(indexed == logical)
    // sub-sharded layouts refuse append instead of corrupting the layout
    val dir2 = tmpDir("ivf_append_sub")
    IvfIndex.build(corpus, dir2, nCentroids = 16, maxRowsPerPartition = 50)
    assertThrows[IllegalArgumentException] {
      IvfIndex.append(spark, dir2, arrivals)
    }
  }

  test("probePairs dedups arrivals against the corpus; exact within clusters") {
    val all = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = all.filter(col("vec_id") % 2 === 0)
    val arrivals = all.filter(col("vec_id") % 2 === 1)
    def brute(t: Double) = {
      val a = VectorOps.prepared(arrivals)
        .select(col("vec_id").as("av"), col("v").as("va"), col("nrm").as("na"))
      val c = VectorOps.prepared(corpus)
        .select(col("vec_id").as("cv_"), col("v").as("vc"), col("nrm").as("nc"))
      a.crossJoin(c)
        .withColumn("cosine", round(
          VectorOps.dot(col("va"), col("vc")) / (col("na") * col("nc")), 6))
        .filter(col("cosine") >= t)
        .select(least(col("av"), col("cv_")).as("vec_a"),
          greatest(col("av"), col("cv_")).as("vec_b"), col("cosine"))
        .as[(Long, Long, Double)].collect().toSet
    }
    // one cluster: the indexed probe IS the exact arrivals x corpus dedup
    val dir1 = tmpDir("ivf_probe_k1")
    IvfIndex.build(corpus, dir1, nCentroids = 1)
    val p1 = IvfIndex.probePairs(spark, dir1, arrivals, threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSet
    val exact = brute(0.35)
    assert(exact.nonEmpty, "fixture must contain cross near-dups")
    assert(p1 == exact)
    // k > 1: a subset of exact, and never an in-arrivals or in-corpus pair
    val dir16 = tmpDir("ivf_probe_k16")
    IvfIndex.build(corpus, dir16, nCentroids = 16)
    val p16 = IvfIndex.probePairs(spark, dir16, arrivals, threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSet
    assert(p16.subsetOf(exact))
    assert(p16.forall(p => (p._1 % 2 == 0) != (p._2 % 2 == 0)))
  }

  test("probePairs runs on a stream (stateless assignment + stream-static join)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val all = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val corpus = all.filter(col("vec_id") % 2 === 0)
    val arrivals = all.filter(col("vec_id") % 2 === 1)
    val dir = tmpDir("ivf_probe_stream")
    IvfIndex.build(corpus, dir, nCentroids = 4)
    val batch = IvfIndex.probePairs(spark, dir, arrivals, threshold = 0.35)
      .as[(Long, Long, Double)].collect().toSet
    val mem = MemoryStream[(Long, Seq[Float], Int)](spark)
    val q = IvfIndex.probePairs(spark, dir,
      mem.toDF().toDF("vec_id", "embedding", "label"), threshold = 0.35)
      .writeStream.format("memory").queryName("ivf_probe_out")
      .outputMode("append").start()
    try {
      arrivals.select(col("vec_id"), col("embedding"), col("label"))
        .as[(Long, Seq[Float], Int)].collect().foreach(mem.addData(_))
      q.processAllAvailable()
      val streamed = spark.table("ivf_probe_out")
        .as[(Long, Long, Double)].collect().toSet
      assert(streamed == batch)
      assert(batch.nonEmpty)
    } finally q.stop()
  }
}
