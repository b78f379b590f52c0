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
        col("min_urlkey") <= prefix + "￿").count()
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
}
