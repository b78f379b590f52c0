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

  test("capPerSource keeps the lowest ids per source, including a null source group") {
    val capped = Curate.capPerSource(docs, cap = 1)
    assert(capped.select("doc_id").as[Long].collect().toSet == Set(1L, 3L))
    assert(Curate.capPerSource(docs, cap = 10).count() == 4)
    val withNull = docs.unionByName(
      Seq((8L, "x", "en"), (9L, "y", "en")).toDF("doc_id", "text", "lang")
        .withColumn("source", org.apache.spark.sql.functions.lit(null: String)))
    val kept = Curate.capPerSource(withNull, cap = 1)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 8L), s"null source must be capped as a group: $kept")
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

  test("redactCards: Luhn-valid PANs redacted, checksum-failing shapes kept") {
    val rows = Seq(
      (1L, "pay 4539578763621486 today"),          // valid, contiguous
      (2L, "pay 4539-5787-6362-1486 today"),       // valid, separator form
      (3L, "order 4539578763621487 shipped"),      // shape match, bad checksum
      (4L, "ref 12345678901234567890 is 20 digits"), // past the 13-19 envelope
      (5L, "cards 4111111111111111 and 4222222222222444 both"), // two valid
      (6L, "same 4111111111111111 twice 4111111111111111 here"),
      (7L, "nothing here"),
      (8L, "amex 3782 822463 10005 and visa 4222222222222 short forms")
    ).toDF("doc_id", "text")
    val out = Curate.redactCards(rows).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == "pay [CARD] today")
    assert(out(0).getAs[Long]("n_cards") == 1L)
    assert(out(1).getAs[String]("text") == "pay [CARD] today")
    assert(out(2).getAs[String]("text") == "order 4539578763621487 shipped",
      "checksum-failing shapes are the false-positive class: left verbatim")
    assert(out(2).getAs[Long]("n_cards") == 0L)
    assert(out(3).getAs[String]("text") == "ref 12345678901234567890 is 20 digits",
      "a 20-digit run has no 13-19-digit \\b-bounded sub-run: no candidate")
    assert(out(3).getAs[Long]("n_cards") == 0L)
    assert(out(4).getAs[String]("text") == "cards [CARD] and [CARD] both")
    assert(out(4).getAs[Long]("n_cards") == 2L)
    // repeated candidate: both occurrences replaced, both counted
    assert(out(5).getAs[String]("text") == "same [CARD] twice [CARD] here")
    assert(out(5).getAs[Long]("n_cards") == 2L)
    assert(out(6).getAs[Long]("n_cards") == 0L)
    // the envelope is 13-19 digits, not just 16: Amex 4-6-5 print form
    // and a 13-digit Visa both validate and redact
    assert(out(7).getAs[String]("text") == "amex [CARD] and visa [CARD] short forms")
    assert(out(7).getAs[Long]("n_cards") == 2L)
  }

  test("redactCards: occurrences the extraction scan skipped are still counted") {
    // the non-overlapping regex scan consumes "1234 4111 1111 1111" (a
    // checksum-failing shape) before reaching the second valid PAN
    // occurrence — the \b-anchored replace still redacts it, and
    // n_cards counts REPLACEMENTS (2), not raw extraction hits (1)
    val rows = Seq(
      (1L, "4111 1111 1111 1111 and 1234 4111 1111 1111 1111")
    ).toDF("doc_id", "text")
    val out = Curate.redactCards(rows).collect()
    assert(out(0).getAs[String]("text") == "[CARD] and 1234 [CARD]")
    assert(out(0).getAs[Long]("n_cards") == 2L,
      "n_cards must equal the number of redactions actually made")
  }

  test("redactCards: n_cards counts replacements, not pre-replacement occurrences") {
    // "0-4539578763621486" is Luhn-valid (the leading 0 adds nothing to
    // the checksum) and CONTAINS a \b-bounded occurrence of the plain
    // PAN right after the dash. Counting candidates against the
    // ORIGINAL text would see the plain PAN twice (inside the dashed
    // span + standalone) = 3 total, but replacing the dashed candidate
    // first consumes the embedded occurrence — only 2 replacements
    // happen. n_cards is derived from the redacted-vs-original diff,
    // so it must say 2.
    val rows = Seq(
      (1L, "0-4539578763621486 and 4539578763621486")
    ).toDF("doc_id", "text")
    val out = Curate.redactCards(rows).collect()
    assert(out(0).getAs[String]("text") == "[CARD] and [CARD]")
    assert(out(0).getAs[Long]("n_cards") == 2L,
      "n_cards must equal replacements actually performed, not original-text occurrence counts")
  }

  test("redactCards: count equals replacements for empty and combining replacements") {
    // replacement = "" (strip the PAN outright): a zero-width diff count
    // would go negative; the sequential fold counts exactly 1
    val stripped = Curate.redactCards(
      Seq((1L, "pan 4539578763621486 end")).toDF("doc_id", "text"),
      replacement = "").collect()(0)
    assert(stripped.getAs[String]("text") == "pan  end")
    assert(stripped.getAs[Long]("n_cards") == 1L)
    // replacement that COMBINES with adjacent original text into extra
    // copies of itself: "!!" next to literal '!' characters — a token
    // diff would read 2; one replacement happened
    val combined = Curate.redactCards(
      Seq((2L, "!4539578763621486!")).toDF("doc_id", "text"),
      replacement = "!!").collect()(0)
    assert(combined.getAs[String]("text") == "!!!!")
    assert(combined.getAs[Long]("n_cards") == 1L)
  }

  test("redactCards is a stateless projection (streams as-is)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, String)](spark)
    val out = Curate.redactCards(mem.toDF().toDF("doc_id", "text"))
    val q = out.writeStream.format("memory").queryName("card_stream")
      .outputMode("append").start()
    try {
      mem.addData((1L, "pan 4539 5787 6362 1486 ok"), (2L, "pan 4539 5787 6362 1487 bad"))
      q.processAllAvailable()
      val rows = spark.table("card_stream").orderBy("doc_id").collect()
      assert(rows(0).getAs[String]("text") == "pan [CARD] ok")
      assert(rows(1).getAs[String]("text") == "pan 4539 5787 6362 1487 bad")
    } finally q.stop()
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

  test("contaminationFlag: no false negatives vs the exact join; clean docs pass at tiny fpp") {
    val corpus = (0L until 200L).map(i => (i, s"w${i} x${i} y${i} z${i} q${i}"))
      .toDF("doc_id", "text")
    // eval set shares the exact text of docs 10 and 20
    val eval = Seq((9000L, "w10 x10 y10 z10 q10"), (9001L, "w20 x20 y20 z20 q20"))
      .toDF("doc_id", "text")
    val exact = Curate.contamination(corpus, eval, k = 3)
      .select("doc_id").as[Long].collect().toSet
    assert(exact == Set(10L, 20L))
    val flagged = Curate.contaminationFlag(corpus, eval, k = 3, fpp = 1e-6)
      .filter(col("might_contaminated")).select("doc_id").as[Long].collect().toSet
    assert(exact.subsetOf(flagged), "Bloom must never miss a contaminated doc")
    assert(flagged == exact, s"at fpp=1e-6 on 200 docs no false positives expected: $flagged")
    // short docs (no k-grams) are never flagged
    val short = Seq((1L, "a b")).toDF("doc_id", "text")
    assert(Curate.contaminationFlag(short, eval, k = 3)
      .filter(col("might_contaminated")).count() == 0)
  }

  test("contaminationFlag is a stateless projection: runs on a stream, matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val eval = Seq((9000L, "alpha beta gamma delta")).toDF("doc_id", "text")
    val mem = MemoryStream[(Long, String)](spark)
    val src = mem.toDF().toDF("doc_id", "text")
    val out = Curate.contaminationFlag(src, eval, k = 3, fpp = 1e-6)
    val q = out.writeStream.format("memory").queryName("contam_stream")
      .outputMode("append").start()
    try {
      mem.addData(
        (1L, "alpha beta gamma delta epsilon"), // shares "alpha beta gamma"
        (2L, "totally unrelated text right here"))
      q.processAllAvailable()
      val rows = spark.table("contam_stream").orderBy("doc_id").collect()
      assert(rows.length == 2)
      assert(rows(0).getAs[Boolean]("might_contaminated"))
      assert(!rows(1).getAs[Boolean]("might_contaminated"))
    } finally q.stop()
  }

  test("mixBySource applies per-source rates with the id-stable hash") {
    val big = (0L until 400L).map(i => (i, s"t$i", "en", s"src${i % 4}"))
      .toDF("doc_id", "text", "lang", "source")
    val mixed = Curate.mixBySource(big, Map("src0" -> 0, "src1" -> 100), defaultPercent = 50)
    val bySrc = mixed.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!bySrc.contains("src0"))
    assert(bySrc("src1") == 100L)
    assert(bySrc("src2") + bySrc("src3") > 50 && bySrc("src2") + bySrc("src3") < 150)
    // a kept id stays kept when its source's rate rises (same hash buckets)
    val kept25 = Curate.mixBySource(big, Map.empty, defaultPercent = 25)
      .select("doc_id").as[Long].collect().toSet
    val kept75 = Curate.mixBySource(big, Map.empty, defaultPercent = 75)
      .select("doc_id").as[Long].collect().toSet
    assert(kept25.subsetOf(kept75))
    // distinct salts decorrelate sampling from mixing: composing 50% x 50%
    // keeps ~25%, not min(50%, 50%)
    val composed = Curate.mixBySource(
      Curate.sampleByHash(big, "doc_id", 50), Map.empty, defaultPercent = 50).count()
    assert(composed > 50 && composed < 150, s"expected ~100 of 400, got $composed")
  }

  test("packChunks cuts contiguous id-ordered runs at the token budget per source") {
    val d = Seq(
      (1L, 300L, "s1"), (2L, 300L, "s1"), (3L, 300L, "s1"), (4L, 50L, "s1"),
      (10L, 600L, "s2")
    ).toDF("doc_id", "n_tokens", "source")
    val out = Curate.packChunks(d, budget = 512).collect()
      .map(r => r.getLong(0) -> r.getAs[Long]("chunk_id")).toMap
    // s1 cumulative starts: 0, 300, 600, 900 -> chunks 0, 0, 1, 1
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 1L, 4L -> 1L, 10L -> 0L))
  }

  test("AutoShards sizes the shard count from the largest source and matches the explicit path") {
    val rows = (0L until 300L).map(i => (i, 100L, "s0")) ++
      (1000L until 1050L).map(i => (i, 100L, "s1"))
    val d = rows.toDF("doc_id", "n_tokens", "source")
    // target 100 rows/task over a 300-row max source → ceil(300/100) = 3
    // shards → identical output to an explicit shards = 3 call
    val auto = Curate.packChunks(d, budget = 512, autoTargetRows = 100L).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("chunk_id")).toMap
    val explicit = Curate.packChunks(d, budget = 512, shards = 3).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("chunk_id")).toMap
    assert(auto == explicit)
    // a tame corpus resolves to the exact shards = 1 layout
    val tame = Curate.packChunks(d, budget = 512).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("chunk_id")).toMap
    val one = Curate.packChunks(d, budget = 512, shards = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("chunk_id")).toMap
    assert(tame == one)
    // empty corpus: the auto guard must not NPE on the null max
    assert(Curate.packChunks(d.limit(0), budget = 512).count() == 0)
  }

  test("sharded packChunks matches the naive (shard, id)-ordered layout and stays globally consistent") {
    // dominant source: s0 holds 80% of rows — the shape that makes the
    // unsharded window a single-task bottleneck
    val rows = (0L until 400L).map(i => (i, 37L + (i % 13) * 7, "s0")) ++
      (1000L until 1100L).map(i => (i, 53L + (i % 5) * 11, "s1"))
    val d = rows.toDF("doc_id", "n_tokens", "source")
    for (s <- Seq(2, 3, 16)) {
      val got = Curate.packChunks(d, budget = 512, shards = s).collect()
        .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("chunk_id")).toMap
      // naive reference: per source, lay docs out in (id % s, id) order,
      // chunk = floor(token-prefix / budget)
      val expected = rows.groupBy(_._3).flatMap { case (_, rs) =>
        var cum = 0L
        rs.sortBy(r => (r._1 % s, r._1)).map { r =>
          val c = cum / 512; cum += r._2; r._1 -> c
        }
      }
      assert(got == expected, s"shards=$s")
      // chunk ids contiguous from 0 per source (docs are all < budget)
      val bySrc = rows.groupBy(_._3).view.mapValues(_.map(r => got(r._1)).toSet)
      bySrc.foreach { case (src, chunks) =>
        assert(chunks == (0L until (chunks.max + 1)).toSet, s"source $src gaps")
      }
    }
    // shards=1 keeps the exact id-ordered layout of the unsharded path
    val one = Curate.packChunks(d, budget = 512, shards = 1).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("chunk_id")).toMap
    val naive1 = rows.groupBy(_._3).flatMap { case (_, rs) =>
      var cum = 0L
      rs.sortBy(_._1).map { r => val c = cum / 512; cum += r._2; r._1 -> c }
    }
    assert(one == naive1)
  }

  test("sharded packChunks keeps null-id rows (they land in shard 0)") {
    val d = Seq((Some(1L), 100L, "s"), (None, 100L, "s"), (Some(2L), 100L, "s"))
      .toDF("doc_id", "n_tokens", "source")
    for (s <- Seq(1, 3)) {
      val out = Curate.packChunks(d, budget = 150, shards = s)
      assert(out.count() == 3, s"shards=$s dropped rows")
      assert(out.filter(col("doc_id").isNull).count() == 1, s"shards=$s null row lost")
    }
  }

  test("packText concatenates chunk members in id order regardless of partitioning") {
    val d = Seq(
      (3L, "cc", "s1", 2L), (1L, "aa", "s1", 2L), (2L, "bb", "s1", 2L),
      (4L, "dd", "s2", 1L)
    ).toDF("doc_id", "text", "source", "n_tokens")
    val chunked = Curate.packChunks(d, budget = 4, shards = 1)
    val out = Curate.packText(chunked.repartition(7)) // scramble partitions
      .orderBy("source", "chunk_id").collect()
    // budget 4 tokens: docs 1,2 (4 tokens) -> chunk 0; doc 3 -> chunk 1
    assert(out(0).getAs[String]("packed_text") == "aa bb")
    assert(out(0).getAs[Long]("n_docs") == 2L)
    assert(out(1).getAs[String]("packed_text") == "cc")
    assert(out(2).getAs[String]("packed_text") == "dd")
  }

  test("packTokens concatenates token streams in id order with a boundary per doc") {
    val d = Seq(
      (3L, Seq("c", "c2"), "s1", 2L), (1L, Seq("a", "a2"), "s1", 2L),
      (2L, Seq("b", "b2"), "s1", 2L), (4L, Seq("d"), "s2", 1L),
      (5L, Seq.empty[String], "s2", 0L) // empty doc: boundary only
    ).toDF("doc_id", "tokens", "source", "n_tokens")
    val chunked = Curate.packChunks(d, budget = 4, shards = 1)
    val out = Curate.packTokens(chunked.repartition(7)) // scramble partitions
      .orderBy("source", "chunk_id").collect()
    // budget 4: docs 1,2 -> chunk 0; doc 3 -> chunk 1; s2 docs 4,5 -> chunk 0
    assert(out(0).getSeq[String](3) == Seq("a", "a2", "</s>", "b", "b2", "</s>"))
    assert(out(0).getAs[Long]("n_docs") == 2L
      && out(0).getAs[Long]("n_tokens_packed") == 6L)
    assert(out(1).getSeq[String](3) == Seq("c", "c2", "</s>"))
    // the empty doc contributes exactly its boundary, in id position
    assert(out(2).getSeq[String](3) == Seq("d", "</s>", "</s>"))
    assert(out(2).getAs[Long]("n_tokens_packed") == 3L)
  }

  test("stratifiedSample takes exact per-stratum quotas, deterministically") {
    val big = (0L until 400L).map(i =>
      (i, s"t$i", if (i % 2 == 0) "en" else "de", s"s${i % 4}"))
      .toDF("doc_id", "text", "lang", "source")
    // lang is i-parity, source is i%4 → exactly 4 populated strata of 100
    val s1 = Curate.stratifiedSample(big, Seq("lang", "source"), k = 5)
    assert(s1.count() == 20)
    val per = s1.groupBy("lang", "source").count().select("count").as[Long].collect()
    assert(per.length == 4 && per.forall(_ == 5))
    val s2 = Curate.stratifiedSample(big, Seq("lang", "source"), k = 5)
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ==
      s2.select("doc_id").as[Long].collect().sorted.toSeq)
    // quota above the stratum size keeps the whole stratum
    assert(Curate.stratifiedSample(docs, Seq("source"), k = 10).count() == 4)
  }

  test("stratifiedSample: null strata group together; encoding is collision-free") {
    val withNull = docs.unionByName(
      Seq((8L, "x", "en"), (9L, "y", "en")).toDF("doc_id", "text", "lang")
        .withColumn("source", lit(null: String)))
    val kept = Curate.stratifiedSample(withNull, Seq("source"), k = 1)
    assert(kept.count() == 3) // s1, s2, and the null-source stratum
    // ("ab","") vs ("a","b"): a separator join would collide these strata
    val tricky = Seq(
      (1L, "t", "ab", ""), (2L, "t", "ab", ""),
      (3L, "t", "a", "b"), (4L, "t", "a", "b")
    ).toDF("doc_id", "text", "lang", "source")
    assert(Curate.stratifiedSample(tricky, Seq("lang", "source"), k = 1).count() == 2)
  }

  test("upsampleBySource repeats by factor: int copies + hash-decided fractional copy") {
    val big = (0L until 400L).map(i =>
      (i, s"t$i", if (i < 200) "rare" else "common")).toDF("doc_id", "text", "source")
    val up = Curate.upsampleBySource(big, Map("rare" -> 2.5, "common" -> 1.0))
    val rare = up.filter(col("source") === "rare")
    val perDoc = rare.groupBy("doc_id").count().select("count").as[Long].collect()
    assert(perDoc.forall(c => c == 2L || c == 3L))
    val three = perDoc.count(_ == 3L)
    assert(three > 60 && three < 140, s"~50% of 200 rare docs expected 3 copies, got $three")
    assert(up.filter(col("source") === "common").count() == 200)
    // copy indices are 1..n, rows otherwise unchanged
    assert(rare.select("copy").as[Int].collect().toSet == Set(1, 2, 3))
    // factor 0 drops; fractional-only factors downsample like mixBySource
    val downOnly = Curate.upsampleBySource(big,
      Map("rare" -> 0.0, "common" -> 0.3))
    assert(downOnly.filter(col("source") === "rare").count() == 0)
    val kept = downOnly.filter(col("source") === "common").count()
    assert(kept > 30 && kept < 90, s"~30% of 200 expected, got $kept")
    // determinism
    assert(Curate.upsampleBySource(big, Map("rare" -> 2.5)).count() ==
      Curate.upsampleBySource(big, Map("rare" -> 2.5)).count())
    // sub-percent factors are rejected, not silently quantised
    intercept[IllegalArgumentException] {
      Curate.upsampleBySource(big, Map("rare" -> 1.234))
    }
  }

  test("dedupLines removes cross-doc boilerplate lines, preserves order, totals on edges") {
    val corpus = Seq(
      (1L, "unique alpha\nCOOKIE BANNER\nunique beta\nFOOTER"),
      (2L, "COOKIE BANNER\nown content two\nFOOTER"),
      (3L, "FOOTER\nCOOKIE BANNER"),          // fully boilerplate
      (4L, "standalone document")
    ).toDF("doc_id", "text")
    val out = Curate.dedupLines(corpus, minDocs = 3).orderBy("doc_id").collect()
    // only FOOTER and COOKIE BANNER hit df >= 3
    assert(out(0).getAs[String]("text") == "unique alpha\nunique beta")
    assert(out(0).getAs[Long]("n_lines") == 4L && out(0).getAs[Long]("n_removed") == 2L)
    assert(out(1).getAs[String]("text") == "own content two")
    assert(out(2).getAs[String]("text") == "" && out(2).getAs[Long]("n_removed") == 2L)
    assert(out(3).getAs[String]("text") == "standalone document")
    assert(out(3).getAs[Long]("n_removed") == 0L)
    // duplicate lines WITHIN one doc don't reach the df threshold alone
    val within = Seq(
      (1L, "same\nsame\nsame"), (2L, "other")).toDF("doc_id", "text")
    val w = Curate.dedupLines(within, minDocs = 2).orderBy("doc_id").collect()
    assert(w(0).getAs[String]("text") == "same\nsame\nsame")
    // null text counts as empty, doc survives
    val withNull = corpus.unionByName(
      Seq(Tuple1(5L)).toDF("doc_id").withColumn("text", lit(null: String)))
    val n = Curate.dedupLines(withNull, minDocs = 3).orderBy("doc_id").collect()
    assert(n.length == 5 && n(4).getAs[String]("text") == "")
  }

  test("stripLinesFlag matches dedupLines given the same frequency artifact; no false negatives") {
    val corpus = Seq(
      (1L, "unique alpha\nCOOKIE BANNER\nunique beta\nFOOTER"),
      (2L, "COOKIE BANNER\nown content two\nFOOTER"),
      (3L, "FOOTER\nCOOKIE BANNER"),
      (4L, "standalone document")
    ).toDF("doc_id", "text")
    val freq = Curate.frequentLines(corpus, minDocs = 3)
    assert(freq.count() == 2) // FOOTER, COOKIE BANNER
    val flagged = Curate.stripLinesFlag(corpus, freq)
      .select("doc_id", "text", "n_lines", "n_removed")
    val exact = Curate.dedupLines(corpus, minDocs = 3)
      .select("doc_id", "text", "n_lines", "n_removed")
    assert(flagged.orderBy("doc_id").collect().toSeq ==
      exact.orderBy("doc_id").collect().toSeq)
  }

  test("stripLinesFlag is a stateless projection: runs on a stream, matches batch") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val offline = Seq(
      (10L, "AD BLOCK\nreal text one"), (11L, "AD BLOCK\nreal text two"),
      (12L, "AD BLOCK")).toDF("doc_id", "text")
    val freq = Curate.frequentLines(offline, minDocs = 3)
    val mem = MemoryStream[(Long, String)](spark)
    val out = Curate.stripLinesFlag(mem.toDF().toDF("doc_id", "text"), freq)
    val q = out.writeStream.format("memory").queryName("strip_stream")
      .outputMode("append").start()
    try {
      mem.addData((20L, "AD BLOCK\nfresh arrival"), (21L, "clean doc"))
      q.processAllAvailable()
      val rows = spark.table("strip_stream").orderBy("doc_id").collect()
      assert(rows(0).getAs[String]("text") == "fresh arrival")
      assert(rows(0).getAs[Long]("n_removed") == 1L)
      assert(rows(1).getAs[String]("text") == "clean doc")
      assert(rows(1).getAs[Long]("n_removed") == 0L)
    } finally q.stop()
  }

  test("weightedSample keeps the k smallest hash-div-weight priorities, deterministically") {
    val big = (0L until 400L).map(i => (i, s"t$i", 1L + i % 7))
      .toDF("doc_id", "text", "w")
    val s1 = Curate.weightedSample(big, k = 40, weightCol = "w")
    assert(s1.count() == 40)
    val s2 = Curate.weightedSample(big, k = 40, weightCol = "w")
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq ==
      s2.select("doc_id").as[Long].collect().sorted.toSeq)
    // brute-force twin: the same priority computed through a global sort
    // (nonNegHash under Default = sign bit dropped before the division)
    val brute = big
      .select(col("doc_id"),
        expr("shiftrightunsigned(xxhash64('wsamp', doc_id), 1) div w").as("pri"))
      .orderBy(col("pri"), col("doc_id")).limit(40)
      .select("doc_id").as[Long].collect().sorted.toSeq
    assert(s1.select("doc_id").as[Long].collect().sorted.toSeq == brute)
    // null / non-positive weights never sample
    val mixed = Seq((1L, "a", 5L), (2L, "b", 0L), (3L, "c", -2L))
      .toDF("doc_id", "text", "w")
      .unionByName(Seq((4L, "d")).toDF("doc_id", "text").withColumn("w", lit(null: java.lang.Long)))
    val kept = Curate.weightedSample(mixed, k = 10, weightCol = "w")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L))
    // k above the eligible count keeps every eligible row
    assert(Curate.weightedSample(big, k = 1000, weightCol = "w").count() == 400)
  }

  test("weightedSample weights tilt inclusion toward heavy rows") {
    // two weight classes over the same id population: heavy rows (w=100)
    // must out-sample light rows (w=1) under a πps design
    val big = (0L until 1000L).map(i => (i, s"t$i", if (i < 500) 100L else 1L))
      .toDF("doc_id", "text", "w")
    // BOTH modes must tilt the same way: Default used to divide the SIGNED
    // xxhash64, under which the min-k set came from negative hashes and
    // heavier weight made a row LESS likely — the πps contract inverted
    for (mode <- Seq(HashMode.Portable, HashMode.Default)) {
      val kept = Curate.weightedSample(big, k = 100, weightCol = "w",
        mode = mode)
        .select("doc_id").as[Long].collect()
      val heavy = kept.count(_ < 500)
      assert(heavy > 80,
        s"expected heavy rows to dominate a πps sample under $mode, got $heavy/100")
    }
  }

  test("boilerplateRatio flags k-grams shared by at least minDocs documents") {
    val d = Seq(
      (1L, "a b c d"), // grams: "a b c", "b c d"
      (2L, "a b c e"),
      (3L, "a b c f"),
      (4L, "x y")      // shorter than k: no grams
    ).toDF("doc_id", "text")
    val out = Curate.boilerplateRatio(d, k = 3, minDocs = 3).orderBy("doc_id").collect()
    // "a b c" is in 3 docs → boilerplate; each doc's second gram is unique
    assert(out(0).getAs[Long]("n_grams") == 2L)
    assert(out(0).getAs[Long]("n_boiler") == 1L)
    assert(out(0).getAs[Double]("boiler_ratio") == 0.5)
    assert(out(3).getAs[Long]("n_grams") == 0L)
    assert(out(3).getAs[Double]("boiler_ratio") == 0.0)
    // at minDocs=4 nothing clears the bar
    val none = Curate.boilerplateRatio(d, k = 3, minDocs = 4)
    assert(none.agg(max(col("n_boiler"))).collect()(0).getLong(0) == 0L)
  }

  test("contamination flags k-gram overlap with the eval set only") {
    val evalDocs = Seq((100L, "the customer sent a key", "en", "e")).toDF("doc_id", "text", "lang", "source")
    val out = Curate.contamination(docs, evalDocs, k = 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out == Map(1L -> 1L)) // only doc 1 shares the 5-gram
    // docs shorter than k produce no grams and cannot be flagged
    assert(Curate.contamination(docs, evalDocs, k = 50).count() == 0)
  }

  test("assignSplits partitions completely, deterministically, and id-stably") {
    val big = (0L until 1000L).map(i => (i, s"t$i")).toDF("doc_id", "text")
    val splits = Seq("train" -> 80, "val" -> 10, "test" -> 10)
    val a = Curate.assignSplits(big, splits).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    val b = Curate.assignSplits(big, splits).select("doc_id", "split")
      .as[(Long, String)].collect().toMap
    assert(a == b, "assignment must be run-stable")
    assert(a.size == 1000, "every row gets exactly one split")
    val byLabel = a.values.groupBy(identity).view.mapValues(_.size).toMap
    assert(byLabel.keySet == Set("train", "val", "test"))
    assert(byLabel("train") > 700 && byLabel("train") < 900)
    // id-stable: a subset corpus assigns the same ids to the same splits
    val sub = Curate.assignSplits(big.filter($"doc_id" < 100), splits)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(sub.forall { case (id, s) => a(id) == s })
    // zero-percent splits are legal and empty
    val z = Curate.assignSplits(big, Seq("all" -> 100, "none" -> 0))
      .select("split").distinct().as[String].collect().toSet
    assert(z == Set("all"))
    intercept[IllegalArgumentException] {
      Curate.assignSplits(big, Seq("train" -> 80, "val" -> 10))
    }
  }

  test("contaminationBloom is output-identical to the exact path") {
    // a corpus big enough that the bloom genuinely prunes: 200 docs, 5 of
    // which embed an eval sentence verbatim
    val corpus = (0L until 200L).map { i =>
      val base = s"document number $i talks about topic ${i % 7} in plain words"
      val text = if (i % 40 == 0) base + " the quick brown fox jumps over dogs" else base
      (i, text, "en", "s")
    }.toDF("doc_id", "text", "lang", "source")
    val evalDocs = Seq((9999L, "the quick brown fox jumps over dogs", "en", "e"))
      .toDF("doc_id", "text", "lang", "source")
    def asMap(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val exact = asMap(Curate.contamination(corpus, evalDocs, k = 5))
    val bloom = asMap(Curate.contaminationBloom(corpus, evalDocs, k = 5))
    assert(exact == bloom)
    assert(exact.keySet == Set(0L, 40L, 80L, 120L, 160L))
    // tight filters (high fpp → tiny bitset) still verify exactly
    assert(asMap(Curate.contaminationBloom(corpus, evalDocs, k = 5, fpp = 0.5)) == exact)
    // empty eval set → empty result, not a crash
    assert(Curate.contaminationBloom(corpus, evalDocs.limit(0), k = 5).count() == 0)
    // the eval-shaped guard refuses corpus-shaped eval frames
    intercept[IllegalArgumentException] {
      Curate.contaminationBloom(corpus, corpus, k = 5, maxEvalGrams = 10)
    }
  }

  test("snapshotDiff classifies every fate; whitespace-only edits are unchanged") {
    import spark.implicits._
    val old = Seq(
      (1L, "alpha beta"), (2L, "gamma delta"), (3L, "kept verbatim"),
      (4L, "spaced   out")).toDF("doc_id", "text")
    val now = Seq(
      (1L, "alpha beta REVISED"),      // changed
      (3L, "kept verbatim"),           // unchanged; 2 removed
      (4L, "spaced out"),              // normalised-equal -> unchanged
      (5L, "brand new")                // added
    ).toDF("doc_id", "text")
    val out = Curate.snapshotDiff(old, now)
      .as[(Long, String)].collect().toMap
    assert(out == Map(1L -> "changed", 2L -> "removed", 3L -> "unchanged",
      4L -> "unchanged", 5L -> "added"))
  }
}
