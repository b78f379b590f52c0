package graft.ops

import graft.SparkSpec

class ExactSubstrSpec extends SparkSpec {
  import spark.implicits._

  // l = 5 fixture: A and B share a 7-token run; C repeats itself; D/E short
  private def docs = Seq(
    (1L, "a b c d e f g h i j"),           // shared run at pos 1-7
    (2L, "x x a b c d e f g y"),           // same run at pos 3-9
    (3L, "p q r s t p q r s t"),           // self-repetition: whole doc
    (4L, "u v w"),                         // shorter than l: no windows
    (5L, "")                               // empty
  ).toDF("doc_id", "text")

  test("windowHashes: one window per token start, none for short or empty docs") {
    val w = ExactSubstr.windowHashes(docs, l = 5)
      .as[(Long, Int, String)].collect()
    assert(w.count(_._1 == 1L) == 6) // 10 - 5 + 1
    assert(w.count(_._1 == 2L) == 6)
    assert(!w.exists(t => t._1 == 4L || t._1 == 5L))
    // identical window text => identical hash across docs
    val h = w.filter(t => t._1 == 1L && t._2 == 1).head._3
    assert(w.exists(t => t._1 == 2L && t._2 == 3 && t._3 == h))
  }

  test("duplicatedSpans merges overlapping windows into maximal spans") {
    val spans = ExactSubstr.duplicatedSpans(docs, l = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(spans == Set(
      (1L, 1L, 7L, 7L),   // "a b c d e f g"
      (2L, 3L, 9L, 7L),
      (3L, 1L, 10L, 10L)  // self-repeat: pos 1 and 6 merge across the gap
    ), s"got $spans")
  }

  test("a gap longer than l splits islands") {
    val d2 = Seq(
      (1L, "a b c d e Z1 Z2 Z3 Z4 Z5 Z6 a b c d e"),
      (2L, "a b c d e")).toDF("doc_id", "text")
    val spans = ExactSubstr.duplicatedSpans(d2, l = 5)
      .as[(Long, Long, Long, Long)].collect().toSet
    // doc 1: dup windows at pos 1 and 12 — 11 apart > l, two spans
    assert(spans == Set((1L, 1L, 5L, 5L), (1L, 12L, 16L, 5L), (2L, 1L, 5L, 5L)))
  }

  test("stripSpans removes exactly the flagged tokens; unflagged docs pass through normalised") {
    val spans = ExactSubstr.duplicatedSpans(docs, l = 5)
    val out = ExactSubstr.stripSpans(docs, spans)
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "h i j")
    assert(out(2L) == "x x y")
    assert(out(3L) == "")       // fully duplicated doc
    assert(out(4L) == "u v w")  // untouched
    assert(out(5L) == "")
    // caller policy: protecting doc 1's copy leaves it intact
    val protect = spans.filter(org.apache.spark.sql.functions.col("doc_id") =!= 1L)
    assert(ExactSubstr.stripSpans(docs, protect)
      .as[(Long, String)].collect().toMap.apply(1L) == "a b c d e f g h i j")
  }

  test("stripSubstrFlag reproduces the batch span strip from the offline artifact") {
    val art = ExactSubstr.frequentWindows(docs, l = 5)
    val flagged = ExactSubstr.stripSubstrFlag(docs, art, l = 5)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> r._2).toMap
    val batch = ExactSubstr.stripSpans(docs,
      ExactSubstr.duplicatedSpans(docs, l = 5))
      .as[(Long, String)].collect().toMap
    assert(flagged == batch, s"flag=$flagged batch=$batch")
    // removed-token accounting
    val counts = ExactSubstr.stripSubstrFlag(docs, art, l = 5)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> (r._3, r._4)).toMap
    assert(counts(1L) == (10L, 7L) && counts(3L) == (10L, 10L) &&
      counts(4L) == (3L, 0L))
  }

  test("stripSubstrFlag runs unchanged on a stream (stateless projection)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val art = ExactSubstr.frequentWindows(docs, l = 5)
    val mem = MemoryStream[(Long, String)](spark)
    val q = ExactSubstr.stripSubstrFlag(mem.toDF().toDF("doc_id", "text"), art, l = 5)
      .writeStream.format("memory").queryName("ss_strip")
      .outputMode("append").start()
    try {
      docs.as[(Long, String)].collect().foreach(mem.addData(_))
      q.processAllAvailable()
      val streamed = spark.table("ss_strip")
        .as[(Long, String, Long, Long)].collect()
        .map(r => r._1 -> r._2).toMap
      val batch = ExactSubstr.stripSpans(docs,
        ExactSubstr.duplicatedSpans(docs, l = 5))
        .as[(Long, String)].collect().toMap
      assert(streamed == batch)
    } finally q.stop()
  }

  test("the duplicate-count branch prunes its scan to the text column") {
    val dir = tmpDir("substr_plan")
    docs.write.mode("overwrite").parquet(dir)
    val plan = ExactSubstr.duplicatedSpans(spark.read.parquet(dir), l = 5)
      .queryExecution.executedPlan.toString
    // the groupBy(wh) branch needs no doc_id: one of the two scans must
    // read ONLY text (column pruning through the window projection)
    assert(plan.contains("ReadSchema: struct<text:string>"),
      s"count branch must scan text only:\n$plan")
  }

  test("minOccurrences raises the duplication bar") {
    // the shared run appears twice; minOccurrences = 3 excludes it, but
    // doc 3's window [p q r s t] also appears twice only -> nothing at 3
    val spans = ExactSubstr.duplicatedSpans(docs, l = 5, minOccurrences = 3)
    assert(spans.count() == 0)
  }

  test("dupFraction reduces spans to the doc-level score, total over all docs") {
    val out = ExactSubstr.dupFraction(docs, l = 5)
      .as[(Long, Long, Long, Double)].collect().toSet
    assert(out == Set(
      (1L, 10L, 7L, 0.7),   // span 1-7 of 10 tokens
      (2L, 10L, 7L, 0.7),
      (3L, 10L, 10L, 1.0),  // fully self-duplicated
      (4L, 3L, 0L, 0.0),    // shorter than one window: no spans, still a row
      (5L, 0L, 0L, 0.0)     // empty doc: zero tokens, zero fraction
    ), s"got $out")
  }
}
