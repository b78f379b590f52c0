package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The CDX range layout end to end: cdx → writeCdx (range-partitioned,
  * manifest-backed) → readCdxPrefix, pinning pruned-read ≡ full-scan
  * filter AND the skipping effect (a minority of files opened for a
  * single-domain prefix). */
class CdxLayoutSpec extends SparkSpec {
  import spark.implicits._

  test("readCdxPrefix equals the full-scan filter and opens a minority of files") {
    val dir = tmpDir("cdx_layout")
    // 40 shards across the fixture's 7 hosts → an index whose sorted
    // key space spans several files per host range
    val ids = (0L until 40L).toDF("doc_id")
    val index = WarcOps.cdx(WarcOps.parseWarc(spark, WarcOps.warcPayloads(spark, ids)))
    WarcOps.writeCdx(index, dir, numFiles = 4)

    // pick a real single-host prefix from the data ("all captures under
    // example,siteK" — the archive-index use case)
    val prefix = spark.read.parquet(dir)
      .filter(col("urlkey").isNotNull)
      .select(substring_index(col("urlkey"), ")", 1))
      .as[String].collect().distinct.sorted.apply(3) + ")"

    val pruned = WarcOps.readCdxPrefix(spark, dir, prefix)
    val full = spark.read.parquet(dir).filter(col("urlkey").startsWith(prefix))
    val key = (df: org.apache.spark.sql.DataFrame) => df
      .select("urlkey", "warc_date", "doc_id", "rec_index", "rec_offset")
      .as[(String, String, Long, Long, Long)].collect().toSet
    assert(key(pruned) == key(full))
    assert(key(full).nonEmpty, "non-vacuous: the prefix must match captures")

    // the skipping effect: the manifest bounds select a strict minority
    // of the 8 range-partitioned files for a single-host prefix
    val manifest = spark.read.parquet(Layout.manifestPath(dir))
    val total = manifest.count()
    val selected = manifest
      .filter(col("max_urlkey") >= prefix &&
        (col("min_urlkey") <= prefix ||
          col("min_urlkey").startsWith(prefix))).count()
    assert(total == 4, s"layout must land in 4 files, got $total")
    assert(selected >= 1 && selected <= 2,
      s"a one-host range must touch 1-2 of 4 sorted files, touched $selected")

    // an off-the-end prefix prunes to ZERO files and still returns the
    // schema-preserving empty frame
    val none = WarcOps.readCdxPrefix(spark, dir, "zzz,nonexistent)")
    assert(none.count() == 0)
    assert(none.columns.toSeq == full.columns.toSeq)

    // subdomain contiguity — the property the SURT reversal buys: every
    // capture of a host's subdomains falls inside the host's prefix range
    val hostPrefix = prefix.stripSuffix(")")
    val inRange = spark.read.parquet(dir)
      .filter(col("urlkey").startsWith(hostPrefix))
    assert(key(WarcOps.readCdxPrefix(spark, dir, hostPrefix)) == key(inRange))
  }

  test("prefix pruning keeps files whose keys carry supplementary characters") {
    // IRI crawl urlkeys can carry non-BMP codepoints, which sort ABOVE
    // U+FFFF in Spark's UTF-8 byte order — a `prefix + U+FFFF` upper
    // bound (the naive spelling) prunes the file holding them and
    // silently loses matching rows; the exact interval test must not
    val dir = tmpDir("cdx_supp")
    val emoji = new String(Character.toChars(0x1F600)) // U+1F600, F0-lead UTF-8
    val prefix = "com,example)/"
    // three single-file appends pin the file split: the middle file's
    // min_urlkey starts "com,example)/😀…", which is GREATER than
    // prefix + U+FFFF in UTF-8 byte order — the naive bound drops it
    Seq(("com,apple)/a", 1L)).toDF("urlkey", "doc_id")
      .coalesce(1).write.mode("append").parquet(dir)
    Seq((s"$prefix${emoji}page", 2L), (s"$prefix${emoji}z", 3L))
      .toDF("urlkey", "doc_id").coalesce(1).write.mode("append").parquet(dir)
    Seq(("com,zebra)/x", 4L)).toDF("urlkey", "doc_id")
      .coalesce(1).write.mode("append").parquet(dir)
    Layout.writeManifest(spark, dir, Seq("urlkey"))
    // non-vacuous: the fixture really is above the naive bound
    val naiveKept = spark.read.parquet(Layout.manifestPath(dir))
      .filter(col("max_urlkey") >= prefix &&
        col("min_urlkey") <= prefix + "￿").count()
    assert(naiveKept == 0, s"naive bound must drop the emoji file, kept $naiveKept")
    val pruned = Layout.prunedReadPrefix(spark, dir, "urlkey", prefix)
      .filter(col("urlkey").startsWith(prefix))
      .as[(String, Long)].collect().toSet
    val full = spark.read.parquet(dir)
      .filter(col("urlkey").startsWith(prefix))
      .as[(String, Long)].collect().toSet
    assert(pruned == full && full.map(_._2) == Set(2L, 3L),
      "supplementary-character keys must survive the manifest pruning")
  }
}
