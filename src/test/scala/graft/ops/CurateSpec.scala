package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CurateSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the customer sent a key to the customer", "en", "s1"),
    (2L, "contact me at bob@example.com or 10.0.0.1", "en", "s1"),
    (3L, "plain text with nothing sensitive", "en", "s2"),
    (4L, "call 555-123-4567 ssn 123-45-6789", "en", "s2")
  ).toDF("doc_id", "text", "lang", "source")

  test("sampleByHash is deterministic, id-stable, and roughly proportional") {
    val big = (0L until 1000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val a = Curate.sampleByHash(big, "doc_id", 10).select("doc_id").as[Long].collect().toSet
    val b = Curate.sampleByHash(big, "doc_id", 10).select("doc_id").as[Long].collect().toSet
    assert(a == b, "same ids must be kept across runs")
    assert(a.size > 50 && a.size < 200, s"~10% of 1000 expected, got ${a.size}")
    // monotone: raising the rate only ADDS ids (bucket membership is stable)
    val wider = Curate.sampleByHash(big, "doc_id", 20).select("doc_id").as[Long].collect().toSet
    assert(a.subsetOf(wider))
    assert(Curate.sampleByHash(big, "doc_id", 0).count() == 0)
    assert(Curate.sampleByHash(big, "doc_id", 100).count() == 1000)
  }

  test("capPerSource keeps the lowest ids per source") {
    val capped = Curate.capPerSource(docs, cap = 1)
    assert(capped.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(Curate.capPerSource(docs, cap = 10).count() == 4)
  }

  test("redact scrubs PII defaults and counts matches on the original text") {
    val out = Curate.redact(docs).orderBy("doc_id").collect()
    assert(out(1).getAs[String]("text") == "contact me at [EMAIL] or [IP]")
    assert(out(1).getAs[Long]("n_redactions") == 2L)
    assert(out(3).getAs[String]("text") == "call [PHONE] ssn [SSN]")
    assert(out(3).getAs[Long]("n_redactions") == 2L)
    assert(out(2).getAs[String]("text") == "plain text with nothing sensitive")
    assert(out(2).getAs[Long]("n_redactions") == 0L)
  }

  test("redact and sampleByHash compose with Structured Streaming (stateless projections)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text")
    val out = Curate.sampleByHash(Curate.redact(src), "doc_id", 100)
    val q = out.writeStream.format("memory").queryName("curate_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "mail bob@example.com now"), (2L, "clean"))
      q.processAllAvailable()
      val rows = spark.table("curate_stream").orderBy("doc_id").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[String]("text") == "mail [EMAIL] now")
      assert(rows(0).getAs[Long]("n_redactions") == 1L)
    } finally q.stop()
  }

  test("contamination flags k-gram overlap with the eval set only") {
    val evalDocs = Seq((100L, "the customer sent a key", "en", "e")).toDF("doc_id", "text", "lang", "source")
    val out = Curate.contamination(docs, evalDocs, k = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L)) // only doc 1 shares the 5-gram
    // docs shorter than k produce no grams and cannot be flagged
    assert(Curate.contamination(docs, evalDocs, k = 50).count() == 0)
  }
}
