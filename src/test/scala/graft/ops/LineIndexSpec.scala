package graft.ops

import graft.SparkSpec
import graft.stream.StreamCurate
import org.apache.spark.sql.functions._

/** The persisted frequent-gram artifact family: threshold-at-load
  * equivalence with the one-shot operators, EXACT incremental merge on
  * disjoint corpora (including the cross-half gram pruning-at-build
  * loses), kind pinning, provenance, and the StreamCurate chain running
  * off the persisted form. */
class LineIndexSpec extends SparkSpec {
  import spark.implicits._

  // two DISJOINT corpus halves; "shared boiler" appears once per half —
  // frequent in the union (df 2), invisible to either half's pruned view
  private def halfA = Seq(
    (1L, "shared boiler\nalpha text one\ncommon line"),
    (2L, "common line\nbravo body two"),
    (3L, "charlie three")).toDF("doc_id", "text")
  private def halfB = Seq(
    (11L, "shared boiler\ndelta four"),
    (12L, "common line\necho five")).toDF("doc_id", "text")
  private def whole = halfA.unionByName(halfB)

  private def loadedSet(dir: String, threshold: Long) =
    LineIndex.load(spark, dir, threshold)
      .as[(Long, Long, Long)].collect().toSet

  test("lines: load(threshold) equals frequentLines; merge equals fresh concatenated build") {
    val dirA = tmpDir("li_a"); val dirM = tmpDir("li_m"); val dirF = tmpDir("li_f")
    LineIndex.build(halfA, dirA, LineIndex.Kind.Lines())
    assert(loadedSet(dirA, 2) ==
      Curate.frequentLines(halfA).as[(Long, Long, Long)].collect().toSet)
    LineIndex.merge(spark, dirA, halfB, dirM)
    LineIndex.build(whole, dirF, LineIndex.Kind.Lines())
    assert(LineIndex.counts(spark, dirM).as[(Long, Long, Long)].collect().toSet ==
      LineIndex.counts(spark, dirF).as[(Long, Long, Long)].collect().toSet,
      "unpruned merged counts must equal the fresh build's")
    assert(loadedSet(dirM, 2) ==
      Curate.frequentLines(whole).as[(Long, Long, Long)].collect().toSet)
    // the exactness gap the artifact closes: 'shared boiler' (df 1+1)
    // is frequent in the union but in NEITHER half's pruned view — a
    // pruned-at-build artifact could never recover it by folding
    val sharedHash = Seq((0L, "shared boiler")).toDF("doc_id", "text")
      .select(call_function("graft_md5hh", col("text").cast("binary")).as("hh"))
      .select(element_at(col("hh"), 1), element_at(col("hh"), 2))
      .as[(Long, Long)].collect().head
    def hasShared(s: Set[(Long, Long, Long)]) =
      s.exists(r => (r._1, r._2) == sharedHash)
    assert(hasShared(loadedSet(dirM, 2)), "cross-half line must be frequent after merge")
    assert(!hasShared(Curate.frequentLines(halfA).as[(Long, Long, Long)].collect().toSet) &&
      !hasShared(Curate.frequentLines(halfB).as[(Long, Long, Long)].collect().toSet),
      "non-vacuous: neither half's pruned view carries it")
    // in-place merge refused (overwrite would delete the input counts)
    val e = intercept[IllegalArgumentException] {
      LineIndex.merge(spark, dirA, halfB, dirA)
    }
    assert(e.getMessage.contains("in place"))
  }

  test("windows and shingles: per-occurrence counts merge exactly too") {
    // windows: l=3 so the short fixtures carry windows; a window split
    // across the halves' counts (once each) must survive the merge
    val wA = Seq((1L, "a b c d"), (2L, "x y z w a b c")).toDF("doc_id", "text")
    val wB = Seq((11L, "q a b c r")).toDF("doc_id", "text")
    val wAll = wA.unionByName(wB)
    val dA = tmpDir("li_w_a"); val dM = tmpDir("li_w_m"); val dF = tmpDir("li_w_f")
    LineIndex.build(wA, dA, LineIndex.Kind.Windows(3))
    LineIndex.merge(spark, dA, wB, dM)
    LineIndex.build(wAll, dF, LineIndex.Kind.Windows(3))
    assert(LineIndex.counts(spark, dM).as[(Long, Long, Long)].collect().toSet ==
      LineIndex.counts(spark, dF).as[(Long, Long, Long)].collect().toSet)
    assert(loadedSet(dM, 2) ==
      ExactSubstr.frequentWindows(wAll, l = 3).as[(Long, Long, Long)].collect().toSet)
    assert(loadedSet(dM, 2).nonEmpty, "non-vacuous: 'a b c' repeats 3x")

    val sA = Seq((1L, "One two. Three four. Five six."),
      (2L, "Seven. One two. Three four. Five six.")).toDF("doc_id", "text")
    val sB = Seq((11L, "One two. Three four. Five six. Eight nine.")).toDF("doc_id", "text")
    val sAll = sA.unionByName(sB)
    val eA = tmpDir("li_s_a"); val eM = tmpDir("li_s_m"); val eF = tmpDir("li_s_f")
    LineIndex.build(sA, eA, LineIndex.Kind.Shingles(3))
    LineIndex.merge(spark, eA, sB, eM)
    LineIndex.build(sAll, eF, LineIndex.Kind.Shingles(3))
    assert(LineIndex.counts(spark, eM).as[(Long, Long, Long)].collect().toSet ==
      LineIndex.counts(spark, eF).as[(Long, Long, Long)].collect().toSet)
    assert(loadedSet(eM, 2) ==
      ExactSubstr.frequentShingles(sAll).as[(Long, Long, Long)].collect().toSet)
    assert(loadedSet(eM, 2).nonEmpty, "non-vacuous: the 3-sentence span repeats")
  }

  test("kind pinning and threshold floor are loud; provenance + freshness guard wire through") {
    val dir = tmpDir("li_kind")
    LineIndex.build(halfA, dir, LineIndex.Kind.Windows(5))
    assert(LineIndex.meta(spark, dir) == LineIndex.Kind.Windows(5))
    val e1 = intercept[IllegalArgumentException] {
      LineIndex.load(spark, dir, 2, expectKind = Some(LineIndex.Kind.Lines()))
    }
    assert(e1.getMessage.contains("windows"))
    // the same kind with a different parameter is a mismatch too
    val e2 = intercept[IllegalArgumentException] {
      LineIndex.load(spark, dir, 2, expectKind = Some(LineIndex.Kind.Windows(20)))
    }
    assert(e2.getMessage.contains("expected"))
    intercept[IllegalArgumentException] { LineIndex.load(spark, dir, 1) }
    intercept[IllegalArgumentException] {
      LineIndex.load(spark, tmpDir("li_nothing"), 2)
    }
    // provenance: stamp travels with the artifact; a probe against an
    // EDITED corpus fails loudly when the caller opts in
    val dirP = tmpDir("li_prov")
    LineIndex.build(halfA, dirP, LineIndex.Kind.Lines(),
      provenance = Some(ArtifactProvenance.Target("corpus.docs", "1.0.0",
        snapshot = Some(halfA))))
    val p = ArtifactProvenance.read(spark, dirP)
    assert(p.exists(x => x.artifactKind == "line-index" &&
      x.datasetId == "corpus.docs" && x.operation == "build"))
    LineIndex.load(spark, dirP, 2, freshAgainst = Some(halfA)) // fresh: fine
    val stale = intercept[IllegalArgumentException] {
      LineIndex.load(spark, dirP, 2, freshAgainst = Some(whole))
    }
    assert(stale.getMessage.contains("stale artifact"))
  }

  test("StreamCurate runs off the persisted artifacts: loadArtifacts == in-memory frames") {
    // docs rich enough to exercise the line AND shingle stages: the
    // boilerplate line appears in 2 docs, the 3-sentence span twice
    val corpus = Seq(
      (1L, "subscribe now\nReal alpha content here. It spans sentences. Another one follows. Done."),
      (2L, "subscribe now\nDifferent body text."),
      (3L, "Real alpha content here. It spans sentences. Another one follows. Tail.")
    ).toDF("doc_id", "text")
    val arrivals = Seq(
      (100L, "subscribe now\nFresh arrival text. Real alpha content here. It spans sentences. Another one follows."),
      (101L, "Plain newcomer with nothing to strip. Clean and long enough to keep.")
    ).toDF("doc_id", "text")
    val evalDocs = Seq((900L, "held out eval doc")).toDF("doc_id", "text")
    val linesDir = tmpDir("li_sc_lines"); val shinglesDir = tmpDir("li_sc_sh")
    LineIndex.build(corpus, linesDir, LineIndex.Kind.Lines())
    LineIndex.build(corpus, shinglesDir, LineIndex.Kind.Shingles(3))
    val fromDisk = StreamCurate.curate(arrivals,
      StreamCurate.loadArtifacts(spark, linesDir, shinglesDir, evalDocs))
    val inMemory = StreamCurate.curate(arrivals,
      StreamCurate.Artifacts(Curate.frequentLines(corpus),
        ExactSubstr.frequentShingles(corpus), evalDocs))
    assert(fromDisk.collect().toSet == inMemory.collect().toSet)
    assert(fromDisk.filter(col("n_boilerplate_lines") > 0).count() > 0,
      "non-vacuous: the persisted line artifact must actually strip")
    // swapped directories fail loudly instead of mis-cleaning
    val e = intercept[IllegalArgumentException] {
      StreamCurate.loadArtifacts(spark, shinglesDir, linesDir, evalDocs)
    }
    assert(e.getMessage.contains("shingles"))
  }
}
