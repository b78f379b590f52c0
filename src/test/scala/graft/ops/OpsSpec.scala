package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TextOpsSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "The quick brown fox, it jumps!", "en", "s1"),
    (2L, "the  QUICK   brown fox, it jumps!", "en", "s2"), // same normalised text
    (3L, "", "en", "s3"),
    (4L, "word", "en", "s4")
  ).toDF("doc_id", "text", "lang", "source")

  test("textStats: token/char/punct counts with empty-text safety") {
    val rows = TextOps.textStats(docs).orderBy("doc_id").collect()
    assert(rows(0).getAs[Long]("n_tokens") == 6L)
    assert(rows(0).getAs[Long]("n_punct") == 2L) // comma + bang
    assert(rows(2).getAs[Long]("n_tokens") == 0L)
    assert(rows(2).getAs[Double]("punct_ratio") == 0.0)
    assert(rows(3).getAs[Double]("avg_token_len") == 4.0)
  }

  test("fingerprint groups whitespace/case variants together") {
    val g = TextOps.fingerprintGroups(docs).collect()
    assert(g.length == 4 - 1) // docs 1 and 2 share a fingerprint
    val dup = g.find(_.getAs[Long]("group_size") == 2L).get
    assert(dup.getAs[Long]("canonical_doc_id") == 1L)
  }

  test("dedupExact keeps the min doc_id per group") {
    val kept = TextOps.dedupExact(docs).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 3L, 4L))
  }

  test("langId falls back deterministically and flags correctness") {
    val out = TextOps.langId(docs).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("predicted_lang") == "en")
    assert(out(0).getAs[Boolean]("correct"))
  }

  test("truncateTokens keeps whole tokens, case, and budget under messy whitespace") {
    val d = Seq(
      (1L, "  Alpha   Beta\tGamma Delta  "), // leading/odd whitespace
      (2L, "one two"),                       // under budget
      (3L, "")                               // empty
    ).toDF("doc_id", "text")
    val out = TextOps.truncateTokens(d, maxTokens = 3).orderBy("doc_id").collect()
    assert(out(0).getAs[String]("text") == "Alpha Beta Gamma") // case kept, 3 tokens
    assert(out(0).getAs[Long]("n_tokens_kept") == 3L)
    assert(out(1).getAs[String]("text") == "one two")
    assert(out(1).getAs[Long]("n_tokens_kept") == 2L)
    assert(out(2).getAs[String]("text") == "")
    assert(out(2).getAs[Long]("n_tokens_kept") == 0L)
    // null text follows the family's empty-doc contract (windowChunks'):
    // empty string out, 0 kept — not null propagation
    val withNull = d.unionByName(
      Seq(4L).toDF("doc_id").withColumn("text", lit(null: String)))
    val nout = TextOps.truncateTokens(withNull, maxTokens = 3)
      .filter(col("doc_id") === 4L).collect()(0)
    assert(nout.getAs[String]("text") == "")
    assert(nout.getAs[Long]("n_tokens_kept") == 0L)
  }

  test("bigramLm: conditional probabilities normalise over ALL continuations") {
    val d = Seq(
      (1L, "a b a b a c"),  // bigrams: ab, ba, ab, ba, ac
      (2L, "a b")           // ab
    ).toDF("doc_id", "text")
    val out = TextOps.bigramLm(d, minCount = 2)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getAs[Long]("n"), r.getAs[Double]("p_cond"))).toMap
    // c(a b)=3, c(b a)=2, c(a c)=1; continuations of a: 4 → P(b|a)=0.75
    // even though "a c" itself falls under minCount, it still counts in the denominator
    assert(out == Map(("a", "b") -> (3L, 0.75), ("b", "a") -> (2L, 1.0)))
  }

  test("tokenEntropy: hand-computed bits, empty and single-token docs at zero") {
    val d = Seq(
      (1L, "a a b b"),   // uniform over 2 tokens -> 1 bit
      (2L, "a a a a"),   // single symbol -> 0 bits
      (3L, "a b c d"),   // uniform over 4 -> 2 bits
      (4L, ""),          // no tokens -> 0
      (5L, "x")          // one token -> 0
    ).toDF("doc_id", "text")
    val out = TextOps.tokenEntropy(d).collect()
      .map(r => r.getLong(0) -> (r.getAs[Long]("n_tokens"),
        r.getAs[Long]("n_distinct"), r.getAs[Double]("entropy"))).toMap
    assert(out(1L) == ((4L, 2L, 1.0)))
    assert(out(2L) == ((4L, 1L, 0.0)))
    assert(out(3L) == ((4L, 4L, 2.0)))
    assert(out(4L) == ((0L, 0L, 0.0)))
    assert(out(5L) == ((1L, 1L, 0.0)))
  }

  test("textQuality score is bounded and keep-flag consistent") {
    val out = TextOps.textQuality(docs).collect()
    assert(out.forall(r => r.getAs[Double]("score") >= 0.0 && r.getAs[Double]("score") <= 1.0))
    assert(out.forall(r => r.getAs[Boolean]("keep") == (r.getAs[Double]("score") >= 0.5)))
  }
}

class NearDupSpec extends SparkSpec {
  import spark.implicits._

  // a/b near-identical (1 word changed), c unrelated, d == a exactly
  private def docs = Seq(
    (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"),
    (3L, "one two three four five six seven eight nine ten"),
    (4L, "alpha beta gamma delta epsilon zeta eta theta iota kappa")
  ).toDF("doc_id", "text")

  test("ngramPairs: exact jaccard, identical docs at 1.0, unrelated absent") {
    val pairs = NearDup.ngramPairs(docs, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("jaccard")).toMap
    assert(pairs((1L, 4L)) == 1.0)
    // 8 shingles each, 7 common -> j = 7/9
    assert(math.abs(pairs((1L, 2L)) - 7.0 / 9.0) < 1e-6)
    assert(pairs.contains((2L, 4L)))
    assert(!pairs.keys.exists { case (x, y) => x == 3L || y == 3L })
  }

  test("minhashPairs finds the same high-similarity pairs as exact ngram") {
    val mh = NearDup.minhashPairs(docs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(mh.contains((1L, 4L)) && mh.contains((1L, 2L)))
    assert(!mh.exists { case (x, y) => x == 3L || y == 3L })
  }

  test("hashTuple is separator-collision-free where the raw portable hash is not") {
    val rows = Seq(("a:b", "c"), ("a", "b:c")).toDF("x", "y")
    def vals(c: org.apache.spark.sql.Column) =
      rows.select(c).as[Long].collect().toSeq
    // the raw ':'-join collides the two tuples (the documented caveat)...
    val raw = vals(HashMode.Portable.hash(col("x"), col("y")))
    assert(raw.head == raw(1))
    // ...the length-prefixed tuple hash does not
    val tup = vals(HashMode.Portable.hashTuple(col("x"), col("y")))
    assert(tup.head != tup(1))
    // null components are distinct from empty strings AND from each other's
    // positions: ("a", null) vs (null, "a") vs ("a", "") all differ
    val nulls = Seq((Some("a"), None: Option[String]), (None: Option[String], Some("a")),
      (Some("a"), Some(""))).toDF("x", "y")
    val nv = nulls.select(HashMode.Portable.hashTuple(col("x"), col("y"))).as[Long].collect()
    assert(nv.distinct.length == 3, s"null-component collision: ${nv.toSeq}")
    // Default (xxhash64) is structurally typed: injective either way
    val xx = vals(HashMode.Default.hashTuple(col("x"), col("y")))
    assert(xx.head != xx(1))
  }

  test("simhash: identical docs at hamming 0, near-dups close, unrelated far") {
    val sh = NearDup.simhash(docs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sh(1L) == sh(4L))
    val pairs = NearDup.simhashPairs(docs, maxHamming = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Long]("hamming")).toMap
    assert(pairs((1L, 4L)) == 0L)
    assert(pairs.get((1L, 2L)).exists(_ <= 16L))
  }

  test("hammingPairs is a generic 64-bit engine: nulls dropped, radius exact, recall-lossless") {
    val df = Seq(
      (1L, Option(0x0F0FL)), (2L, Option(0x0F0EL)),          // hamming 1
      (3L, Option(0x0F0F0F0F0F0F0F0FL)), (4L, Option(-1L)),  // far from all
      (5L, Option.empty[Long])                                // no fingerprint
    ).toDF("doc_id", "h")
    val got = NearDup.hammingPairs(df, maxHamming = 2, hashCol = "h")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 2L, 1L)), s"got $got")
    // recall-lossless vs brute force on a structured set
    val many = (0L until 40L).map(i => (i, i * 0x9E3779B97F4A7C15L))
      .toDF("doc_id", "h")
    val banded = NearDup.hammingPairs(many, maxHamming = 8, hashCol = "h")
      .as[(Long, Long, Long)].collect().toSet
    val vals = (0L until 40L).map(i => i -> i * 0x9E3779B97F4A7C15L)
    val brute = (for {
      (a, ha) <- vals; (b, hb) <- vals if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 8
    } yield (a, b, d.toLong)).toSet
    assert(banded == brute, "pigeonhole banding must equal the brute-force filter")
  }

  test("band-pair blocking (wide radius): boundary-exact, recall-lossless, probe-consistent") {
    // radius 8 over 64 bits crosses the MinSingleBandBits cutover:
    // blocking runs on PAIRS of the 10 narrower bands. Planted pairs at
    // exactly hamming 8 (must surface — boundary) and 9 (must not).
    val base = 0x0123456789ABCDEFL
    val at8 = base ^ 0xFFL          // 8 low bits flipped
    val at9 = base ^ 0x1FFL         // 9 bits flipped
    val spread8 = base ^ 0x8040201008040201L // 8 bits across all bands
    val df = Seq((1L, base), (2L, at8), (3L, at9), (4L, spread8))
      .toDF("doc_id", "h")
    val got = NearDup.hammingPairs(df, maxHamming = 8, hashCol = "h")
      .as[(Long, Long, Long)].collect().toSet
    val vals = Seq(1L -> base, 2L -> at8, 3L -> at9, 4L -> spread8)
    val brute = (for {
      (a, ha) <- vals; (b, hb) <- vals if a < b
      d = java.lang.Long.bitCount(ha ^ hb) if d <= 8
    } yield (a, b, d.toLong)).toSet
    assert(got == brute, s"pair banding must equal brute force: $got vs $brute")
    assert(got.contains((1L, 2L, 8L)) && got.contains((1L, 4L, 8L)),
      "hamming == maxHamming pairs must surface (boundary)")
    assert(!got.exists { case (a, b, _) => Set(a, b) == Set(1L, 3L) })
    // probe side must band with the same pair layout
    val index = NearDup.hammingIndex(df, maxHamming = 8, hashCol = "h")
    val probed = NearDup.hammingProbe(index,
      Seq((100L, base ^ 0x3L)).toDF("doc_id", "h"), maxHamming = 8, hashCol = "h")
      .as[(Long, Long, Long)].collect().toSet
    val bruteProbe = vals.collect { case (c, hc)
      if java.lang.Long.bitCount((base ^ 0x3L) ^ hc) <= 8 =>
        (100L, c, java.lang.Long.bitCount((base ^ 0x3L) ^ hc).toLong) }.toSet
    assert(probed == bruteProbe && probed.map(_._2).contains(1L),
      s"pair-mode probe must equal brute force: $probed vs $bruteProbe")
  }

  test("band-pair blocking bounds candidate counts where single bands go quadratic") {
    // corpus-sized shape check without materializing any join: candidate
    // pairs = Σ_buckets C(c, 2) over the banded index. At radius 8 on
    // 4096 well-spread 64-bit hashes, single-band buckets (≤128
    // distinct values) are ~n/128 and quadratic; pair-band buckets
    // (~13-bit keys) must cut the candidate count by well over an
    // order of magnitude.
    val n = 4096L
    // xxhash64 spreads bits uniformly — a stand-in for real content
    // hashes (a wrapping multiply would trip ANSI overflow checks)
    val hashed = spark.range(n).select(col("id").as("doc_id"),
      xxhash64(col("id")).as("h"))
    def candidates(index: org.apache.spark.sql.DataFrame): Long =
      index.groupBy("band", "band_val").count()
        .agg(sum(expr("count * (count - 1) div 2")).cast("long")).as[Long].head()
    val pairCand = candidates(
      NearDup.hammingIndex(hashed, maxHamming = 8, hashCol = "h"))
    // the pre-r11 single-band layout, reconstructed inline: 9 bands
    val single = (0 until 9).map { b =>
      val width = if (b < 64 % 9) 64 / 9 + 1 else 64 / 9
      val start = (0 until b).map(i => if (i < 64 % 9) 64 / 9 + 1 else 64 / 9).sum
      val mask = (1L << width) - 1L
      shiftrightunsigned(col("h"), start).bitwiseAND(lit(mask))
    }
    val singleCand = candidates(hashed.select(col("doc_id"),
      posexplode(array(single: _*)).as(Seq("band", "band_val"))))
    // both layouts are quadratic in n on random hashes; the pair keys
    // carry ~2x the bits, so the CONSTANT shrinks by
    // (9/2^7)/(45/2^12.8) ≈ 13x asymptotically (~9.5x measured at this
    // n, where the uneven 6/7-bit widths bite) — the difference between
    // a verify join that drowns at corpus scale and one that doesn't
    assert(pairCand * 8 < singleCand,
      s"pair banding must collapse the candidate count: $pairCand vs $singleCand")
  }

  test("hammingProbe refuses a layout-mismatched or untagged index LOUDLY") {
    // joining two band layouts does not error — it silently returns
    // near-zero matches; the probe must therefore validate the layout
    // tag the index carries in its schema metadata
    val hashes = Seq((1L, 0x0F0FL), (2L, 0x0F0EL)).toDF("doc_id", "h")
    val idx3 = NearDup.hammingIndex(hashes, maxHamming = 3, hashCol = "h")
    // radius mismatch (3-band layout probed at radius 8's pair layout)
    val e1 = intercept[IllegalArgumentException] {
      NearDup.hammingProbe(idx3, hashes, maxHamming = 8, hashCol = "h")
    }
    assert(e1.getMessage.contains("layout mismatch"))
    // an index persisted before the tag existed (no metadata) is refused
    val legacy = idx3.withColumn("band", col("band") + 0L) // strips metadata
    val e2 = intercept[IllegalArgumentException] {
      NearDup.hammingProbe(legacy, hashes, maxHamming = 3, hashCol = "h")
    }
    assert(e2.getMessage.contains("no layout tag"))
    // the tag survives a parquet round trip (the build-once contract)
    val dir = java.nio.file.Files.createTempDirectory("graft_hpix").toString
    idx3.write.mode("overwrite").parquet(dir)
    val reloaded = spark.read.parquet(dir)
    val probed = NearDup.hammingProbe(reloaded, hashes, maxHamming = 3, hashCol = "h")
      .as[(Long, Long, Long)].collect().toSet
    assert(probed.contains((1L, 2L, 1L)) && probed.contains((1L, 1L, 0L)))
  }

  test("hammingAppend/hammingMerge: incremental growth == fresh build; layout guarded") {
    // the build-once artifact's incremental entry points: growing an
    // index with new arrivals (append) or combining per-shard builds
    // (merge) must equal a fresh build over the concatenated corpus —
    // for BOTH layouts (radius 3 single-band, radius 8 band-pair)
    for (radius <- Seq(3, 8)) {
      val oldDocs = (0L until 20L).map(i => (i, i * 0x9E3779B97F4A7C15L)).toDF("doc_id", "h")
      val newDocs = (20L until 30L).map(i => (i, i * 0x9E3779B97F4A7C15L ^ 5L)).toDF("doc_id", "h")
      val fresh = NearDup.hammingIndex(oldDocs.unionByName(newDocs), radius, hashCol = "h")
        .as[(Long, Long, Int, Long)].collect().toSet
      val appended = NearDup.hammingAppend(
        NearDup.hammingIndex(oldDocs, radius, hashCol = "h"),
        newDocs, radius, hashCol = "h")
      assert(appended.as[(Long, Long, Int, Long)].collect().toSet == fresh,
        s"append at radius $radius must equal the fresh concatenated build")
      val merged = NearDup.hammingMerge(
        NearDup.hammingIndex(oldDocs, radius, hashCol = "h"),
        NearDup.hammingIndex(newDocs, radius, hashCol = "h"))
      assert(merged.as[(Long, Long, Int, Long)].collect().toSet == fresh,
        s"merge at radius $radius must equal the fresh concatenated build")
      // the union keeps the layout tag: the grown index probes directly,
      // and still does after the persist/reload a real deployment does
      val dir = java.nio.file.Files.createTempDirectory("graft_hpapp").toString
      appended.write.mode("overwrite").parquet(dir)
      val probed = NearDup.hammingProbe(spark.read.parquet(dir),
        Seq((100L, 25L * 0x9E3779B97F4A7C15L ^ 4L)).toDF("doc_id", "h"),
        radius, hashCol = "h").as[(Long, Long, Long)].collect().toSet
      assert(probed.contains((100L, 25L, 1L)),
        s"appended index must serve probes after a parquet round trip (radius $radius)")
    }
    // layout guards: append refuses a radius/tag mismatch and an
    // untagged (pre-r11) index; merge refuses two different layouts
    val docs = Seq((1L, 0x0F0FL)).toDF("doc_id", "h")
    val idx3 = NearDup.hammingIndex(docs, maxHamming = 3, hashCol = "h")
    val idx8 = NearDup.hammingIndex(docs, maxHamming = 8, hashCol = "h")
    val eApp = intercept[IllegalArgumentException] {
      NearDup.hammingAppend(idx3, docs, maxHamming = 8, hashCol = "h")
    }
    assert(eApp.getMessage.contains("layout mismatch"))
    val eLegacy = intercept[IllegalArgumentException] {
      NearDup.hammingAppend(idx3.withColumn("band", col("band") + 0L),
        docs, maxHamming = 3, hashCol = "h")
    }
    assert(eLegacy.getMessage.contains("no layout tag"))
    val eMerge = intercept[IllegalArgumentException] {
      NearDup.hammingMerge(idx3, idx8)
    }
    assert(eMerge.getMessage.contains("layout mismatch"))
  }

  test("hammingProbe: arrivals vs a banded index == the restricted pair set; streams as-is") {
    val corpus = (0L until 30L).map(i => (i, i * 0x9E3779B97F4A7C15L)).toDF("doc_id", "h")
    val arrivals = (100L until 110L).map(i => (i, (i - 100L) * 0x9E3779B97F4A7C15L + 3L))
      .toDF("doc_id", "h") // hashes near corpus entries 0..9 (xor with 3: hamming <= 2)
    val index = NearDup.hammingIndex(corpus, maxHamming = 4, hashCol = "h")
    val got = NearDup.hammingProbe(index, arrivals, maxHamming = 4, hashCol = "h")
      .as[(Long, Long, Long)].collect().toSet
    // brute force over corpus x arrivals
    val cv = (0L until 30L).map(i => i -> i * 0x9E3779B97F4A7C15L)
    val av = (100L until 110L).map(i => i -> ((i - 100L) * 0x9E3779B97F4A7C15L + 3L))
    val brute = (for {
      (a, ha) <- av; (c, hc) <- cv
      d = java.lang.Long.bitCount(ha ^ hc) if d <= 4
    } yield (a, c, d.toLong)).toSet
    assert(got == brute, s"probe must equal the brute-force restriction: $got vs $brute")
    assert(got.nonEmpty, "fixture must actually produce near pairs")
    // stateless arrival side: the same probe runs on a stream unchanged
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val mem = MemoryStream[(Long, Long)](spark)
    val out = NearDup.hammingProbe(index, mem.toDF().toDF("doc_id", "h"),
      maxHamming = 4, hashCol = "h")
    val q = out.writeStream.format("memory").queryName("hp_stream")
      .outputMode("append").start()
    try {
      mem.addData(av: _*)
      q.processAllAvailable()
      val streamed = spark.table("hp_stream").as[(Long, Long, Long)].collect().toSet
      assert(streamed == brute, "stream probe must equal the batch probe")
    } finally q.stop()
  }
}

class VectorOpsSpec extends SparkSpec {
  import spark.implicits._

  private def emb = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f), 0),
    (1L, Array(1.0f, 0.0f, 0.0f), 0),   // identical to 0
    (2L, Array(0.0f, 1.0f, 0.0f), 0),   // orthogonal
    (3L, Array(0.6f, 0.8f, 0.0f), 1),   // other label
    (4L, Array(0.6f, 0.8f, 0.0f), 1)
  ).toDF("vec_id", "embedding", "label")

  test("embeddingPairs: label-blocked cosine with exact values") {
    val pairs = VectorOps.embeddingPairs(emb, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getAs[Double]("cosine")).toMap
    assert(pairs((0L, 1L)) == 1.0)
    assert(pairs((3L, 4L)) == 1.0)
    assert(!pairs.contains((0L, 2L)))   // cosine 0 below threshold
    assert(!pairs.contains((0L, 3L)))   // different label: never scored
  }

  test("annBrute: correct ranking with deterministic tiebreaks") {
    val out = VectorOps.annBrute(emb, nProbes = 1, topK = 4)
      .orderBy("rank").collect()
    assert(out.map(_.getAs[Long]("neighbor_id")).toSeq == Seq(1L, 3L, 4L, 2L))
    assert(out.head.getAs[Double]("cosine") == 1.0)
    assert(out.map(_.getAs[Long]("rank")).toSeq == Seq(1L, 2L, 3L, 4L))
  }

  test("containmentPairs catches quote-inclusion that symmetric Jaccard misses") {
    val short = "alpha beta gamma delta epsilon zeta"
    val long = ("x" + (1 to 40).map(i => s" filler$i").mkString(" ")) +
      " " + short + " trailing words here"
    val corpus = Seq((1L, short), (2L, long), (3L, "totally different content"))
      .toDF("doc_id", "text")
    val cont = NearDup.containmentPairs(corpus, threshold = 0.8)
      .collect().map(r => (r.getAs[Long]("doc_a"), r.getAs[Long]("doc_b")) ->
        (r.getAs[Double]("cont_a"), r.getAs[Double]("cont_b"))).toMap
    assert(cont.contains((1L, 2L)), "quoted doc must pair with its host")
    val (ca, cb) = cont((1L, 2L))
    assert(ca == 1.0, s"every shingle of the short doc is in the long one: $ca")
    assert(cb < 0.2, "the long doc is mostly its own content")
    // symmetric Jaccard never surfaces this pair
    assert(!NearDup.ngramPairs(corpus, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet.contains((1L, 2L)))
    // df cap drops boilerplate-only docs rather than scoring them 1.0
    val boiler = Seq.tabulate(5)(i => (10L + i, "same same same same")).toDF("doc_id", "text")
    assert(NearDup.containmentPairs(boiler, threshold = 0.1, maxShingleDf = 3).count() == 0)
  }

  test("zero-norm vectors drop from threshold paths (NaN sorts above numbers in Spark)") {
    val withZero = emb.unionByName(Seq(
      (9L, Array(0.0f, 0.0f, 0.0f), 0)).toDF("vec_id", "embedding", "label"))
    // the zero-norm vector must appear in NO output, neither as neighbor...
    val radius = VectorOps.annRadius(withZero, nProbes = 1, threshold = 0.0)
    assert(!radius.select("neighbor_id").as[Long].collect().contains(9L))
    assert(radius.filter(isnan(col("cosine"))).count() == 0)
    // ...nor in cluster-blocked pairs (a bare >= filter would emit it)
    val sem = VectorOps.semanticPairs(withZero, threshold = 0.0, nCentroids = 2)
    assert(!sem.select("vec_a", "vec_b").as[(Long, Long)].collect()
      .exists(p => p._1 == 9L || p._2 == 9L))
    val ivfR = VectorOps.annIvfRadius(withZero, threshold = 0.0, nCentroids = 2, nProbes = 1)
    assert(ivfR.filter(isnan(col("cosine"))).count() == 0)
  }

  test("semanticPairs: cluster-blocked dedup finds same-cluster near-dups unsupervised") {
    // no labels consulted: 0/1 identical (cluster of seed 0), 3/4 identical
    val out = VectorOps.semanticPairs(emb, threshold = 0.9, nCentroids = 2)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(out.contains((0L, 1L)))
    assert(out.contains((3L, 4L)))
    // orthogonal pair never crosses the threshold
    assert(!out.contains((0L, 2L)))
    // grid size does not change the result
    val g1 = VectorOps.semanticPairs(emb, threshold = 0.9, nCentroids = 2, targetBlock = 1)
      .select("vec_a", "vec_b").as[(Long, Long)].collect().toSet
    assert(g1 == out)
  }

  test("annRadius returns exactly the above-threshold neighborhood, no ranks") {
    val out = VectorOps.annRadius(emb, nProbes = 1, threshold = 0.5)
      .collect().map(r => r.getAs[Long]("neighbor_id") -> r.getAs[Double]("cosine")).toMap
    // probe 0 = (1,0,0): cos(1)=1.0, cos(3)=cos(4)=0.6, cos(2)=0.0 below
    assert(out == Map(1L -> 1.0, 3L -> 0.6, 4L -> 0.6))
    // radius result == the unranked above-threshold slice of brute-force scores
    val brute = VectorOps.annBrute(emb, nProbes = 1, topK = 4)
      .filter(col("cosine") >= 0.5)
      .select("neighbor_id").as[Long].collect().toSet
    assert(out.keySet == brute)
  }

  test("annIvf recall matches brute force on the sf0.001 embeddings") {
    val e = graft.T.load(spark, "/root/testdata/sf0.001", "embeddings")
    val brute = VectorOps.annBrute(e, nProbes = 5, topK = 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val ivf = VectorOps.annIvf(e, nCentroids = 8, nProbes = 5, nProbeClusters = 4, topK = 3)
      .select("probe_id", "neighbor_id").as[(Long, Long)].collect().toSet
    // approximate: demand >=50% recall of the true top-3 with half the clusters probed
    assert(ivf.intersect(brute).size >= brute.size / 2)
  }
}

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq((1L, "abc"), (2L, "hello world"), (3L, "")).toDF("doc_id", "text")

  test("extractMeta: deterministic typed metadata from opaque bytes") {
    val m = Multimodal.extractMeta(docs).orderBy("doc_id").collect()
    assert(m(0).getAs[Long]("byte_len") == 3L)
    assert(m(0).getAs[String]("format") == "image") // 3 % 3 == 0
    assert(m(0).getAs[String]("checksum") == "900150983cd24fb0d6963f7d28e17f72") // md5("abc")
    assert(m(1).getAs[Long]("byte_len") == 11L)
    assert(m(1).getAs[String]("format") == "video") // 11 % 3 == 2
    assert(m(0).getAs[Long]("width") == 67L && m(0).getAs[Long]("n_frames") == 4L)
  }

  test("decodeMeta (mapPartitions stub) agrees with the expression path") {
    val expr = Multimodal.extractMeta(docs).orderBy("doc_id").collect().toSeq
    val mp = Multimodal.decodeMeta(spark, docs).orderBy("doc_id").collect().toSeq
    assert(expr == mp)
  }
}

class DotProductSpec extends SparkSpec {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("graft_dot: codegen expression matches the fold bit-for-bit incl. nulls") {
    val df = Seq(
      (Some(Seq(1.0, 2.0, 3.0)), Some(Seq(4.0, 5.0, 6.0))),
      (None, Some(Seq(1.0, 2.0, 3.0))),
      (Some(Seq(0.1, 0.2, 0.3)), Some(Seq(0.9, 0.8, 0.7)))
    ).toDF("a", "b")
    val out = df.select(
      VectorOps.dot(col("a"), col("b")).as("fast"),
      VectorOps.dotFold(col("a"), col("b")).as("fold")).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0) && out(1).isNullAt(1)) // null-intolerant
    assert(out.filter(r => !r.isNullAt(0)).forall(r => r.getDouble(0) == r.getDouble(1)))
    intercept[Exception] {
      Seq((Seq(1.0), Seq(1.0, 2.0))).toDF("a", "b")
        .select(VectorOps.dot(col("a"), col("b"))).collect()
    }
  }
}

class FrameSampleSpec extends SparkSpec {
  import spark.implicits._

  test("sampleFrames explodes deterministic frame rows from metadata") {
    val docs = Seq((1L, "abcdefgh"), (2L, "xy")).toDF("doc_id", "text") // 8 and 2 bytes
    val meta = Multimodal.extractMeta(docs)
    val frames = Multimodal.sampleFrames(meta, everyN = 3).collect()
    // doc 1: n_frames = 8 % 30 + 1 = 9 -> idx 0,3,6; doc 2: n_frames = 3 -> idx 0
    val byDoc = frames.groupBy(_.getLong(0)).view.mapValues(_.map(_.getAs[Long]("frame_idx")).sorted.toSeq).toMap
    assert(byDoc(1L) == Seq(0L, 3L, 6L))
    assert(byDoc(2L) == Seq(0L))
    // features deterministic per (checksum, frame)
    val f2 = Multimodal.sampleFrames(meta, everyN = 3).collect()
      .map(r => (r.getLong(0), r.getAs[Long]("frame_idx"), r.getAs[String]("frame_feature"))).toSet
    assert(frames.map(r => (r.getLong(0), r.getAs[Long]("frame_idx"), r.getAs[String]("frame_feature"))).toSet == f2)
  }

}