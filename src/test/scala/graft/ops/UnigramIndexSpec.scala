package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The persisted unigram artifact: segment-from-disk ≡ the in-memory
  * model, merge ≡ a fresh build on the concatenated corpus (the
  * additive-vocabulary contract), metadata round trip, provenance
  * staleness guard. */
class UnigramIndexSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "banana bandana and an ana"),
    (2L, "banana and banana"),
    (3L, "an ana and a banana")).toDF("doc_id", "text")
  private def newDocs = Seq(
    (7L, "cab and cabana"),
    (8L, "banana cab")).toDF("doc_id", "text")

  test("build → segmentCounts ≡ the in-memory Unigram model") {
    val dir = tmpDir("graft_ugix")
    UnigramIndex.build(docs, dir, vocabSize = 8, maxPieceLen = 3, emIters = 2)
    assert(UnigramIndex.readMeta(spark, dir) ==
      UnigramIndex.Meta(8, 3, 2, 0, 6))
    val m = Unigram.train(docs, vocabSize = 8, maxPieceLen = 3, emIters = 2)
    val fromIndex = UnigramIndex.segmentCounts(spark, dir, docs)
      .as[(Long, Long, Long)].collect().toSet
    val inMemory = Unigram.segmentCounts(docs, m)
      .as[(Long, Long, Long)].collect().toSet
    assert(fromIndex == inMemory)
    // the persisted pieces ARE the model's
    assert(UnigramIndex.loadPieces(spark, dir)
      .as[(String, Long, Long)].collect().toSet == m.pieces.toSet)
  }

  test("merge ≡ a fresh build on the concatenated corpus") {
    val base = tmpDir("graft_ugix_m")
    UnigramIndex.build(docs, s"$base/a", vocabSize = 8, maxPieceLen = 3,
      emIters = 2)
    UnigramIndex.merge(spark, s"$base/a", newDocs, s"$base/merged")
    UnigramIndex.build(docs.unionByName(newDocs), s"$base/fresh",
      vocabSize = 8, maxPieceLen = 3, emIters = 2)
    def pieces(d: String) = UnigramIndex.loadPieces(spark, d)
      .as[(String, Long, Long)].collect().toSet
    def segs(d: String) = spark.read.parquet(s"$d/wordsegs")
      .as[(String, Long, Long)].collect().toSet
    assert(pieces(s"$base/merged") == pieces(s"$base/fresh"))
    assert(segs(s"$base/merged") == segs(s"$base/fresh"))
    assert(UnigramIndex.readMeta(spark, s"$base/merged") ==
      UnigramIndex.readMeta(spark, s"$base/fresh"))
    // the new corpus's word types became segmentable through the merge
    assert(segs(s"$base/merged").exists(_._1 == "cabana"))
    // in-place merge is refused (it would delete the input mid-plan)
    intercept[IllegalArgumentException](
      UnigramIndex.merge(spark, s"$base/a", newDocs, s"$base/a"))
  }

  test("freshAgainst refuses a stale index; bare dirs are not artifacts") {
    val dir = tmpDir("graft_ugix_f")
    UnigramIndex.build(docs, dir, vocabSize = 8, maxPieceLen = 3,
      emIters = 2,
      provenance = Some(ArtifactProvenance.Target("docs", "1",
        snapshot = Some(docs))))
    UnigramIndex.segmentCounts(spark, dir, docs,
      freshAgainst = Some(docs)).collect()
    val edited = docs.withColumn("text",
      when(col("doc_id") === 2L, lit("EDITED")).otherwise(col("text")))
    val e = intercept[IllegalArgumentException](
      UnigramIndex.segmentCounts(spark, dir, docs,
        freshAgainst = Some(edited)).collect())
    assert(e.getMessage.contains("stale artifact"), e.getMessage)
    intercept[IllegalArgumentException](
      UnigramIndex.segmentCounts(spark, tmpDir("graft_ugix_bare"), docs))
  }
}
