package graft.ops

import graft.SparkSpec
import graft.governance.GovernanceBackend
import org.apache.spark.sql.functions._

/** Governed artifact provenance: every build-once/probe-many family
  * member stamps who built it, the governance activity log records the
  * corpus→artifact link, and the snapshot-backed staleness check flips
  * when the corpus moves. */
class ArtifactProvenanceSpec extends SparkSpec {
  import spark.implicits._

  private def corpus = Seq(
    (1L, "alpha beta gamma delta epsilon words flow here", "src0"),
    (2L, "zeta eta theta iota kappa more words here too", "src1"),
    (3L, "lambda mu nu xi omicron yet more words arrive", "src0"),
    (4L, "pi rho sigma tau upsilon final words of corpus", "src1")
  ).toDF("doc_id", "text", "source")

  test("stamp/read round trip + governance activity per build across the family") {
    val gov = new GovernanceBackend(tmpDir("graft_prov_gov"))
    val root = tmpDir("graft_prov")
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")

    // one real build per family member, each stamped with its own kind —
    // the stamp is layout-agnostic, so the battery proves it rides along
    // every artifact shape actually in the repo
    val builds: Seq[(String, String => Unit)] = Seq(
      "minhash" -> (d => MinhashIndex.build(corpus, d)),
      "ivf" -> (d => IvfIndex.build(e, d, nCentroids = 8)),
      "lm" -> (d => LmIndex.build(corpus, d, minCount = 1)),
      "bm25" -> (d => BmIndex.build(corpus, d)),
      "kmv" -> (d => SketchIndex.buildKmv(corpus, "source", "text", d)),
      "bpe" -> (d => BpeIndex.build(corpus, d, nMerges = 4)),
      // the persisted Hamming index is a banded parquet frame rather
      // than an object with a build method — the stamp is
      // directory-shaped, so it rides along identically
      "hamming" -> { d =>
        import org.apache.spark.sql.functions._
        NearDup.hammingIndex(
          corpus.select(col("doc_id"), xxhash64(col("text")).as("h")),
          maxHamming = 3, hashCol = "h")
          .write.mode("overwrite").parquet(s"$d/data")
      })
    builds.foreach { case (kind, build) =>
      val dir = s"$root/$kind"
      build(dir)
      assert(ArtifactProvenance.read(spark, dir).isEmpty,
        s"$kind: pre-stamp artifacts read None, never a throw")
      ArtifactProvenance.stamp(spark, dir, kind,
        datasetId = "corpus.docs", datasetVersion = "2026-08-15",
        governance = Some(gov))
      val p = ArtifactProvenance.read(spark, dir).get
      assert(p.artifactKind == kind && p.datasetId == "corpus.docs" &&
        p.datasetVersion == "2026-08-15" && p.operation == "build" &&
        p.builtAt > 0)
    }
    // the audit view: the corpus' activity log lists every artifact
    // built from it, with the kind in the contract slot and the dir in
    // context
    val acts = gov.pipelineActivity("corpus.docs", Some("2026-08-15"))
      .map(_._1).filter(_.pipeline == ArtifactProvenance.ActivityPipeline)
    assert(acts.size == builds.size,
      s"one governance event per build, got ${acts.size}")
    assert(acts.map(_.operation).toSet ==
      builds.map { case (k, _) => s"build:$k" }.toSet)
    assert(acts.forall(a => a.contractId.startsWith("graft.artifact.") &&
      a.context.get("artifactDir").exists(_.startsWith(root))))

    // a merge stamps its own operation onto the grown copy
    val merged = s"$root/minhash_v2"
    MinhashIndex.merge(spark, s"$root/minhash",
      Seq((9L, "fresh arrival text with words")).toDF("doc_id", "text"), merged)
    ArtifactProvenance.stamp(spark, merged, "minhash",
      "corpus.docs", "2026-08-16", operation = "merge", governance = Some(gov))
    assert(ArtifactProvenance.read(spark, merged).get.operation == "merge")
    assert(gov.pipelineActivity("corpus.docs", Some("2026-08-16"))
      .map(_._1).exists(_.operation == "merge:minhash"))

    // blank stamps are refused loudly (a blank stamp IS the gap)
    intercept[IllegalArgumentException] {
      ArtifactProvenance.stamp(spark, s"$root/minhash", "", "corpus.docs", "v1")
    }

    // a corrupt/partially-written stamp degrades to None (a kill between
    // create and close must not poison every later load with a parse
    // exception) — and a re-stamp repairs it
    val corruptDir = s"$root/minhash"
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$corruptDir/provenance.json"), "{trunc".getBytes)
    assert(ArtifactProvenance.read(spark, corruptDir).isEmpty)
    ArtifactProvenance.stamp(spark, corruptDir, "minhash", "corpus.docs", "2026-08-15")
    assert(ArtifactProvenance.read(spark, corruptDir).nonEmpty)
  }

  test("snapshot staleness: fresh corpus passes, any drift counts and guards loudly") {
    val dir = tmpDir("graft_prov_snap")
    MinhashIndex.build(corpus, dir)
    ArtifactProvenance.stampWithSnapshot(spark, dir, "minhash",
      "corpus.docs", "2026-08-15", corpus)

    // unchanged corpus: zero drift, the guard passes
    assert(ArtifactProvenance.staleCount(spark, dir, corpus) == 0L)
    ArtifactProvenance.requireFresh(spark, dir, corpus)

    // one edit + one add + one remove = 3 changed documents, same
    // accounting as Curate.snapshotDiff
    val moved = corpus.filter(col("doc_id") =!= 4L) // doc 4 removed
      .withColumn("text",
        when(col("doc_id") === 1L, lit("alpha beta EDITED")) // doc 1 changed
          .otherwise(col("text")))
      .unionByName(Seq((5L, "brand new arrival", "src0"))
        .toDF("doc_id", "text", "source")) // doc 5 added
    assert(ArtifactProvenance.staleCount(spark, dir, moved) == 3L)
    val e = intercept[IllegalArgumentException] {
      ArtifactProvenance.requireFresh(spark, dir, moved)
    }
    assert(e.getMessage.contains("stale artifact") &&
      e.getMessage.contains("minhash built from corpus.docs:2026-08-15"))
    // a tolerance admits bounded drift (the daily-rebuild window)
    ArtifactProvenance.requireFresh(spark, dir, moved, maxChanged = 3)

    // a snapshot-less stamp cannot silently read as fresh
    val bare = tmpDir("graft_prov_bare")
    MinhashIndex.build(corpus, bare)
    ArtifactProvenance.stamp(spark, bare, "minhash", "corpus.docs", "v1")
    val e2 = intercept[IllegalArgumentException] {
      ArtifactProvenance.staleCount(spark, bare, corpus)
    }
    assert(e2.getMessage.contains("no provenance snapshot"))

    // a rejected stampWithSnapshot validates BEFORE the corpus pass: no
    // orphaned snapshot is left for staleCount to read as stamped
    val rejected = tmpDir("graft_prov_reject")
    intercept[IllegalArgumentException] {
      ArtifactProvenance.stampWithSnapshot(spark, rejected, "", "corpus.docs",
        "v1", corpus)
    }
    intercept[IllegalArgumentException] {
      ArtifactProvenance.staleCount(spark, rejected, corpus) // still unstamped
    }
  }

  test("every builder stamps through its provenance parameter: one event per build/merge/append") {
    val gov = new GovernanceBackend(tmpDir("graft_provwire_gov"))
    val root = tmpDir("graft_provwire")
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    def tgt(snapshot: Option[org.apache.spark.sql.DataFrame] = None) =
      Some(ArtifactProvenance.Target("corpus.docs", "v1", Some(gov), snapshot))

    // the full build-once/probe-many family, each through its own opt-in
    // save-path hook — no caller-side stamp calls anywhere below
    MinhashIndex.build(corpus, s"$root/minhash", provenance = tgt(Some(corpus)))
    IvfIndex.build(e, s"$root/ivf", nCentroids = 8,
      provenance = tgt(Some(ArtifactProvenance.embeddingSnapshot(e))))
    LmIndex.build(corpus, s"$root/lm", minCount = 1, provenance = tgt())
    BmIndex.build(corpus, s"$root/bm", provenance = tgt())
    SketchIndex.buildKmv(corpus, "source", "text", s"$root/kmv", provenance = tgt())
    SketchIndex.buildQuantile(corpus, "source", "doc_id", "doc_id",
      s"$root/qs", provenance = tgt())
    SketchIndex.buildCm(corpus, "source", s"$root/cm", provenance = tgt())
    BpeIndex.build(corpus, s"$root/bpe", nMerges = 4, provenance = tgt())
    NearDup.hammingSave(
      NearDup.hammingIndex(
        corpus.select(col("doc_id"), xxhash64(col("text")).as("h")),
        maxHamming = 3, hashCol = "h"),
      s"$root/hamming", provenance = tgt(Some(corpus)))

    val kinds = Map("minhash" -> "minhash-index", "ivf" -> "ivf-index",
      "lm" -> "lm-index", "bm" -> "bm-index", "kmv" -> "sketch-kmv",
      "qs" -> "sketch-quantile", "cm" -> "sketch-cm", "bpe" -> "bpe-index",
      "hamming" -> "hamming-index")
    kinds.foreach { case (d, kind) =>
      val p = ArtifactProvenance.read(spark, s"$root/$d")
      assert(p.exists(x => x.artifactKind == kind && x.operation == "build" &&
        x.datasetId == "corpus.docs"), s"$d: $p")
    }
    val builds = gov.pipelineActivity("corpus.docs", Some("v1"))
      .map(_._1).filter(a =>
        a.pipeline == ArtifactProvenance.ActivityPipeline &&
          a.operation.startsWith("build:"))
    assert(builds.map(_.operation).toSet == kinds.values.map("build:" + _).toSet,
      s"one build event per artifact, got ${builds.map(_.operation)}")

    // incremental entry points stamp their own operation
    val fresh = Seq((9L, "fresh arrival words here", "src0"))
      .toDF("doc_id", "text", "source")
    MinhashIndex.merge(spark, s"$root/minhash", fresh, s"$root/minhash_v2",
      provenance = Some(ArtifactProvenance.Target("corpus.docs", "v2", Some(gov))))
    SketchIndex.appendKmv(spark, s"$root/kmv", fresh, "source", "text",
      s"$root/kmv_v2",
      provenance = Some(ArtifactProvenance.Target("corpus.docs", "v2", Some(gov))))
    assert(ArtifactProvenance.read(spark, s"$root/minhash_v2").get.operation == "merge")
    assert(ArtifactProvenance.read(spark, s"$root/kmv_v2").get.operation == "append")
    val v2ops = gov.pipelineActivity("corpus.docs", Some("v2")).map(_._1.operation).toSet
    assert(v2ops == Set("merge:minhash-index", "append:sketch-kmv"))
  }

  test("a provenance-less rebuild CLEARS the previous stamp — no orphaned snapshot to trust") {
    val dir = tmpDir("graft_prov_clear")
    val v1 = corpus
    MinhashIndex.build(v1, dir, provenance = Some(
      ArtifactProvenance.Target("c.docs", "v1", snapshot = Some(v1))))
    assert(ArtifactProvenance.read(spark, dir).nonEmpty)

    // the corpus moves and someone rebuilds WITHOUT provenance: the v1
    // stamp/snapshot must not survive to vouch for data it no longer
    // describes — a probe with freshAgainst=v1 would otherwise PASS the
    // zero-tolerance guard against an index built from v2
    val v2 = corpus.withColumn("text",
      when(col("doc_id") === 1L, lit("rewritten v2")).otherwise(col("text")))
    MinhashIndex.build(v2, dir)
    assert(ArtifactProvenance.read(spark, dir).isEmpty,
      "the stale stamp must be cleared by the unstamped rebuild")
    intercept[IllegalArgumentException] {
      // no snapshot on disk -> staleCount is loud, not silently fresh
      ArtifactProvenance.staleCount(spark, dir, v1)
    }
    // clearStamp is idempotent
    ArtifactProvenance.clearStamp(spark, dir)
  }

  test("freshAgainst on probe entry points: fresh passes, an edited corpus fails loudly") {
    val root = tmpDir("graft_provfresh")
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val tgtDocs = Some(ArtifactProvenance.Target("c.docs", "v1",
      snapshot = Some(corpus)))

    MinhashIndex.build(corpus, s"$root/minhash", provenance = tgtDocs)
    LmIndex.build(corpus, s"$root/lm", minCount = 1, provenance = tgtDocs)
    IvfIndex.build(e, s"$root/ivf", nCentroids = 8,
      provenance = Some(ArtifactProvenance.Target("c.emb", "v1",
        snapshot = Some(ArtifactProvenance.embeddingSnapshot(e)))))
    NearDup.hammingSave(
      NearDup.hammingIndex(
        corpus.select(col("doc_id"), xxhash64(col("text")).as("h")),
        maxHamming = 3, hashCol = "h"),
      s"$root/hamming", provenance = tgtDocs)

    val arrivals = Seq((7L, "alpha beta gamma delta epsilon words flow here"))
      .toDF("doc_id", "text")
    // fresh: the guarded probes run and return
    assert(MinhashIndex.probe(spark, s"$root/minhash", arrivals,
      freshAgainst = Some(corpus)).count() >= 0)
    assert(LmIndex.score(spark, s"$root/lm", arrivals,
      freshAgainst = Some(corpus)).count() == 1)
    val probes = VectorOps.prepared(e.limit(2))
      .select(col("vec_id").as("probe_id"), col("v"), col("nrm"))
    assert(IvfIndex.search(spark, s"$root/ivf", probes,
      freshAgainst = Some(ArtifactProvenance.embeddingSnapshot(e))).count() > 0)
    assert(NearDup.hammingLoad(spark, s"$root/hamming",
      freshAgainst = Some(corpus)).count() > 0)

    // the corpus moves: every guarded probe fails loudly
    val edited = corpus.withColumn("text",
      when(col("doc_id") === 2L, lit("rewritten")).otherwise(col("text")))
    def stale(body: => Any): Unit = {
      val ex = intercept[IllegalArgumentException](body)
      assert(ex.getMessage.contains("stale artifact"), ex.getMessage)
    }
    stale(MinhashIndex.probe(spark, s"$root/minhash", arrivals,
      freshAgainst = Some(edited)))
    stale(MinhashIndex.probeVerified(spark, s"$root/minhash", arrivals, corpus,
      freshAgainst = Some(edited)))
    stale(LmIndex.score(spark, s"$root/lm", arrivals, freshAgainst = Some(edited)))
    stale(NearDup.hammingLoad(spark, s"$root/hamming", freshAgainst = Some(edited)))
    val eMoved = ArtifactProvenance.embeddingSnapshot(e)
      .withColumn("text", when(col("doc_id") === col("doc_id") * 0 + 1L,
        lit("moved")).otherwise(col("text")))
    stale(IvfIndex.search(spark, s"$root/ivf", probes, freshAgainst = Some(eMoved)))
    stale(IvfIndex.searchRadius(spark, s"$root/ivf", probes,
      freshAgainst = Some(eMoved)))

    // probes stay check-free by default (provenance is additive)
    assert(MinhashIndex.probe(spark, s"$root/minhash", arrivals).count() >= 0)
  }
}
