package graft.stream

import graft.SparkSpec
import graft.ops.UrlOps
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Streaming frontier admission: (a) stream verdicts ≡ batch
  * robotsAllowed on the same rows (both wildcard modes), (b) per-host
  * slots strictly monotone across micro-batches with offsets honouring
  * the crawl-delay, (c) the slot counters survive a checkpointed
  * restart. */
class StreamFrontierSpec extends SparkSpec {
  import spark.implicits._

  private val agent = "graftbot"

  private def robotsDocs = Seq(
    ("a.example",
      "User-agent: graftbot\nDisallow: /private\nAllow: /private/ok\n" +
        "User-agent: *\nDisallow: /"),
    ("b.example", "User-agent: *\nCrawl-delay: 2\nDisallow: /tmp"),
    ("w.example",
      "User-agent: *\nDisallow: /d*\nAllow: /d*/keep\nDisallow: /exact$"))
    .toDF("host", "text")

  private def rules = UrlOps.parseRobots(robotsDocs, idCol = "host")

  private def urls = Seq(
    ("a.example", 1L, "/private/x"), ("a.example", 2L, "/private/ok/page"),
    ("a.example", 3L, "/pub"),
    ("b.example", 1L, "/tmp/x"), ("b.example", 2L, "/ok"),
    ("c.example", 1L, "/anything"),
    ("w.example", 1L, "/dx"), ("w.example", 2L, "/dx/keep"),
    ("w.example", 3L, "/exact"), ("w.example", 4L, "/exactz"))
    .toDF("host", "url_id", "path")

  test("permit verdicts equal batch robotsAllowed, both wildcard modes") {
    for (wc <- Seq(false, true)) {
      val batch = UrlOps.robotsAllowed(rules, urls, agent,
        keyCol = "host", wildcards = wc)
        .select("host", "url_id", "allowed")
        .as[(String, Long, Boolean)].collect().toSet
      val stream = StreamFrontier.permit(urls,
        UrlOps.compiledRobots(rules, agent, keyCol = "host", wildcards = wc),
        keyCol = "host")
        .select("host", "url_id", "allowed")
        .as[(String, Long, Boolean)].collect().toSet
      assert(stream == batch, s"wildcards=$wc")
      assert(batch.exists(_._3) && batch.exists(!_._3),
        s"non-vacuous: both verdicts present (wildcards=$wc)")
    }
    // spot-pins so the fixture can't silently go degenerate: the own
    // group's longer allow overrides; no-robots host defaults allowed;
    // the anchored wildcard blocks the exact path only
    val wc = StreamFrontier.permit(urls,
      UrlOps.compiledRobots(rules, agent, keyCol = "host", wildcards = true),
      keyCol = "host")
      .select("host", "url_id", "allowed")
      .as[(String, Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(!wc(("a.example", 1L)) && wc(("a.example", 2L)))
    assert(wc(("c.example", 1L)))
    assert(!wc(("w.example", 3L)) && wc(("w.example", 4L)))
    // and the delay rides the permit join (null when unpublished)
    val delays = StreamFrontier.permit(urls,
      UrlOps.compiledRobots(rules, agent, keyCol = "host"), keyCol = "host")
      .select("host", "delay_s").distinct()
      .as[(String, Option[Double])].collect().toMap
    assert(delays("b.example").contains(2.0) && delays("a.example").isEmpty)
  }

  test("one-batch frontier reproduces batch crawlSchedule exactly") {
    val compiled = UrlOps.compiledRobots(rules, agent, keyCol = "host")
    val got = StreamFrontier.frontier(urls, compiled, keyCol = "host")
      .select("host", "url_id", "slot", "delay_s", "offset_s")
      .as[(String, Long, Long, Double, Double)].collect().toSet
    val allowed = UrlOps.robotsAllowed(rules, urls, agent, keyCol = "host")
      .filter(col("allowed")).drop("allowed")
    val want = UrlOps.crawlSchedule(allowed, rules, agent, keyCol = "host")
      .select("host", "url_id", "slot", "delay_s", "offset_s")
      .as[(String, Long, Long, Double, Double)].collect().toSet
    assert(got == want)
    assert(want.exists(_._4 == 2.0) && want.exists(_._4 == 1.0),
      "non-vacuous: published and default delays both present")
  }

  test("slots stay strictly monotone per host across micro-batches; offsets honour the delay") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val compiled = UrlOps.compiledRobots(rules, agent, keyCol = "host")
    val mem = MemoryStream[(String, Long, String)](spark)
    val q = StreamFrontier.frontier(
      mem.toDF().toDF("host", "url_id", "path"), compiled, keyCol = "host")
      .writeStream.format("memory").queryName("sf_slots")
      .outputMode("append").start()
    try {
      mem.addData(("b.example", 12L, "/ok"), ("b.example", 11L, "/ok2"),
        ("a.example", 3L, "/pub"))
      q.processAllAvailable()
      mem.addData(("b.example", 13L, "/ok3"), ("a.example", 5L, "/pub2"),
        ("b.example", 1L, "/tmp/x")) // disallowed: consumes NO slot
      q.processAllAvailable()
      val out = spark.table("sf_slots")
        .select("host", "url_id", "slot", "offset_s")
        .as[(String, Long, Long, Double)].collect()
      val b = out.filter(_._1 == "b.example").sortBy(_._3)
      // batch 1 slotted 11,12 in url-id order; batch 2 continues at 2
      assert(b.map(r => (r._2, r._3)).toSeq == Seq((11L, 0L), (12L, 1L), (13L, 2L)))
      assert(b.map(_._4).toSeq == Seq(0.0, 2.0, 4.0),
        "offsets must honour the host's crawl-delay of 2s")
      val a = out.filter(_._1 == "a.example").sortBy(_._3)
      assert(a.map(r => (r._2, r._3)).toSeq == Seq((3L, 0L), (5L, 1L)))
      assert(!out.exists(_._2 == 1L), "the disallowed URL never schedules")
    } finally q.stop()
  }

  test("schedule rejects inputs already carrying its reserved column names") {
    // withColumn REPLACES an existing column in place, which would
    // silently shift the positional key/uid reads onto the wrong
    // columns (r14 advice) — the guard fails loudly instead
    val base = urls.withColumn("delay_s", lit(1.0))
    for (bad <- Seq("_sf_skey", "_sf_uid", "slot", "offset_s")) {
      val e = intercept[IllegalArgumentException] {
        StreamFrontier.schedule(base.withColumn(bad, lit(0L)),
          keyCol = "host")
      }
      assert(e.getMessage.contains(bad))
    }
    // permit has the same contract on ITS working/output names (r15
    // review: a frame already carrying `allowed` would have its column
    // silently consumed and dropped)
    val compiled = UrlOps.compiledRobots(rules, agent, keyCol = "host")
    for (bad <- Seq("_sf_key", "_sf_rules", "_sf_la", "_sf_ld",
        "allowed", "delay_s")) {
      val e = intercept[IllegalArgumentException] {
        StreamFrontier.permit(urls.withColumn(bad, lit(true)), compiled,
          keyCol = "host")
      }
      assert(e.getMessage.contains(bad))
    }
  }

  test("a null url_id mis-slots one URL (nulls first), never kills the query") {
    // batch twin's contract: crawlSchedule's window orders
    // asc_nulls_first; a getLong on the null would instead NPE the
    // whole streaming query from inside flatMapGroupsWithState
    val rows = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row("b.example", null, "/a", null),
        org.apache.spark.sql.Row("b.example", java.lang.Long.valueOf(7L), "/b",
          java.lang.Double.valueOf(2.0))),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("host",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("url_id",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("path",
          org.apache.spark.sql.types.StringType),
        org.apache.spark.sql.types.StructField("delay_s",
          org.apache.spark.sql.types.DoubleType))))
    val got = StreamFrontier.schedule(rows, keyCol = "host")
      .select("url_id", "slot", "delay_s")
      .as[(Option[Long], Long, Double)].collect().toSet
    assert(got == Set((None, 0L, 1.0), (Some(7L), 1L, 2.0)),
      "null id slots first on the default delay; the real id follows")
  }

  test("discovery to dispatch on one stream: sitemap entries flow parse -> permit -> schedule") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    // the arrival-side crawl loop end to end: sitemap XML lands on the
    // stream, parseSitemap (stateless generate) yields entries,
    // parseUrls (pure projection) keys them by host, and the frontier
    // chain admits + slots them — all in ONE streaming query
    val compiled = UrlOps.compiledRobots(rules, agent, keyCol = "host")
    val mem = MemoryStream[(Long, String)](spark)
    val entries = UrlOps.parseSitemap(mem.toDF().toDF("doc_id", "text"))
      .select(col("doc_id"), col("entry_pos"), col("loc").as("url"))
    val urls = UrlOps.parseUrls(entries)
      .select(col("host"), (col("doc_id") * 100 + col("entry_pos")).as("url_id"),
        col("path"))
    val q = StreamFrontier.frontier(urls, compiled, keyCol = "host")
      .writeStream.format("memory").queryName("sf_discovery")
      .outputMode("append").start()
    try {
      mem.addData((1L,
        """<urlset><url><loc>http://b.example/ok</loc></url>
          |<url><loc>http://b.example/tmp/blocked</loc></url>
          |<url><loc>http://c.example/fresh</loc></url></urlset>""".stripMargin))
      q.processAllAvailable()
      mem.addData((2L,
        "<urlset><url><loc>http://b.example/ok2</loc></url></urlset>"))
      q.processAllAvailable()
      val out = spark.table("sf_discovery")
        .select("host", "url_id", "slot", "delay_s", "offset_s")
        .as[(String, Long, Long, Double, Double)].collect().toSet
      assert(out == Set(
        ("b.example", 100L, 0L, 2.0, 0.0),  // batch 1, slot 0
        ("c.example", 102L, 0L, 1.0, 0.0),  // no robots -> default delay
        ("b.example", 200L, 1L, 2.0, 2.0)), // batch 2 continues b's counter
        s"got $out")
      // the disallowed /tmp entry (url_id 101) was parsed, permitted
      // FALSE, and never scheduled
      assert(!out.exists(_._2 == 101L))
    } finally q.stop()
  }

  test("host counters survive a checkpointed restart") {
    val base = tmpDir("sf_recov")
    val src = s"$base/src"; val out = s"$base/out"; val ckpt = s"$base/ckpt"
    val compiled = UrlOps.compiledRobots(rules, agent, keyCol = "host")

    def runOnce(): Unit = {
      val stream = spark.readStream
        .schema("host string, url_id long, path string")
        .parquet(src)
      val q = StreamFrontier.frontier(stream, compiled, keyCol = "host")
        .writeStream.option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet").start(out)
      q.awaitTermination()
    }

    Seq(("b.example", 11L, "/ok"), ("b.example", 12L, "/ok2"))
      .toDF("host", "url_id", "path").write.mode("append").parquet(src)
    runOnce()
    Seq(("b.example", 13L, "/ok3"))
      .toDF("host", "url_id", "path").write.mode("append").parquet(src)
    runOnce()
    val got = spark.read.parquet(out)
      .select("url_id", "slot", "offset_s")
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((11L, 0L, 0.0), (12L, 1L, 2.0), (13L, 2L, 4.0)),
      "the restarted query must continue the host's slot counter, not reset it")
  }
}
