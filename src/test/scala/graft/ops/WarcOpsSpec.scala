package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** WARC ingest: framing correctness on the closed-form fixtures, gzip /
  * plain parity, totality on damage, and spec tolerances (header case,
  * line folding, non-http records). */
class WarcOpsSpec extends SparkSpec {
  import spark.implicits._

  test("synthetic fixtures parse back to the closed-form fields, gzip == plain") {
    val ids = Seq(0L, 1L, 2L, 3L, 4L, 5L, 11L).toDF("doc_id")
    val rows = WarcOps.parseWarc(spark, WarcOps.warcPayloads(spark, ids))
      .collect()
    // every file: 1 warcinfo + (1 + doc%3) responses, in file order
    for (doc <- Seq(0L, 1L, 2L, 3L, 4L, 5L, 11L)) {
      val recs = rows.filter(_.getLong(0) == doc).sortBy(_.getLong(1))
      assert(recs.length == 2 + (doc % 3).toInt, s"doc $doc record count")
      assert(recs.head.getAs[String]("warc_type") == "warcinfo")
      assert(recs.head.get(recs.head.fieldIndex("http_status")) == null,
        "warcinfo has no http envelope")
      recs.tail.zipWithIndex.foreach { case (r, i) =>
        assert(r.getAs[String]("warc_type") == "response")
        assert(r.getAs[String]("target_uri") == WarcOps.fixtureUri(doc, i))
        assert(r.getAs[String]("warc_date") == WarcOps.fixtureDate(doc))
        assert(r.getAs[Long]("http_status") == WarcOps.fixtureStatus(doc, i))
        assert(r.getAs[String]("content_type") ==
          (if (WarcOps.fixtureHtml(doc, i)) "text/html" else "text/plain"))
        assert(Option(r.getAs[String]("charset")) == WarcOps.fixtureCharset(i))
        // the DECODE honors the declared charset: the latin-1 class's
        // 0xE9 byte reads back as the intended character, which a UTF-8
        // decode of the same bytes would mangle to the replacement char
        assert(r.getAs[String]("payload_text") == WarcOps.fixtureBody(doc, i),
          s"payload_text doc $doc rec $i")
        if (i % 3 == 1) {
          assert(r.getAs[String]("payload_text").contains("caf" + 0xE9.toChar))
          assert(new String(r.getAs[Array[Byte]]("payload"), "UTF-8") !=
            WarcOps.fixtureBody(doc, i),
            "the latin-1 fixture must actually be non-UTF-8 (non-vacuous)")
        }
      }
    }
  }

  test("total on garbage: bad magic, corrupt gzip, truncation keep the parsed prefix") {
    assert(WarcOps.parseFile(1L, null).isEmpty)
    assert(WarcOps.parseFile(1L, Array.empty[Byte]).isEmpty)
    assert(WarcOps.parseFile(1L, "not a warc at all\r\n\r\n".getBytes("UTF-8")).isEmpty)
    // gzip magic but corrupt body: total, zero records
    assert(WarcOps.parseFile(1L, Array(0x1F.toByte, 0x8B.toByte, 7, 7, 7, 7)).isEmpty)
    // a valid file truncated mid-block: the records BEFORE the damage
    // survive, the damaged one does not, nothing throws
    val whole = WarcOps.syntheticWarc(3L) // plain (odd), 1 + 3%3 = 1 response
    val full = WarcOps.parseFile(3L, whole)
    assert(full.length == 2)
    val truncated = WarcOps.parseFile(3L, whole.take(whole.length - 30))
    assert(truncated.length < full.length, "the truncated record must not surface")
    assert(truncated.map(_.get(2)) == full.take(truncated.length).map(_.get(2)))
    // a semicolon-only Content-Type (Java's ";".split(";") is an EMPTY
    // array) must not crash the type normalization on either path
    val semiBlock = "some bytes".getBytes("UTF-8")
    val semiRec = ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Type: ;\r\n" +
      s"Content-Length: ${semiBlock.length}\r\n\r\n").getBytes("UTF-8") ++
      semiBlock ++ "\r\n\r\n".getBytes("UTF-8")
    assert(WarcOps.parseFile(5L, semiRec).length == 1)
    val semiHttp = ("HTTP/1.1 200 X\r\nContent-Type: ;\r\n\r\nbody").getBytes("US-ASCII")
    val semiRec2 = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${semiHttp.length}\r\n\r\n").getBytes("UTF-8") ++
      semiHttp ++ "\r\n\r\n".getBytes("UTF-8")
    assert(WarcOps.parseFile(5L, semiRec2).length == 1)
    // a declared Content-Length past EOF stops cleanly too
    val lied = ("WARC/1.0\r\nWARC-Type: resource\r\nContent-Length: 99999\r\n\r\nshort"
      ).getBytes("UTF-8")
    assert(WarcOps.parseFile(9L, lied).isEmpty)
    // an all-digit length that would overflow toLong is damage, not a
    // length — total, no NumberFormatException out of the partition
    val overflow = ("WARC/1.0\r\nWARC-Type: resource\r\n" +
      "Content-Length: 99999999999999999999\r\n\r\nx").getBytes("UTF-8")
    assert(WarcOps.parseFile(9L, overflow).isEmpty)
    // same for an overflowing HTTP status: the record surfaces with the
    // raw block and null http fields instead of throwing
    val badStatus = "HTTP/1.1 99999999999999999999 X\r\n\r\nbody".getBytes("UTF-8")
    val rec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${badStatus.length}\r\n\r\n").getBytes("UTF-8") ++
      badStatus ++ "\r\n\r\n".getBytes("UTF-8")
    val rows = WarcOps.parseFile(9L, rec)
    assert(rows.length == 1 && rows.head.get(5) == null)
  }

  test("gzip truncation keeps records from intact earlier members (totality parity with plain)") {
    // doc 2: gzipped one-member-per-record, 1 + 2%3 = 3 responses + warcinfo
    val whole = WarcOps.syntheticWarc(2L)
    val full = WarcOps.parseFile(2L, whole)
    assert(full.length == 4)
    // EVERY truncation point yields a clean record PREFIX — the same
    // totality contract the plain path sweeps — and the sweep must pass
    // through intermediate counts: cuts inside a later member keep the
    // intact earlier members' records (readAllBytes discarded everything)
    val counts = (1 until whole.length).map { cut =>
      val rows = WarcOps.parseFile(2L, whole.take(cut))
      assert(rows.map(_.get(3)) == full.take(rows.length).map(_.get(3)), s"cut=$cut")
      rows.length
    }
    for (k <- 1 until full.length)
      assert(counts.contains(k),
        s"some cut must keep exactly $k intact-member records")
  }

  test("spec tolerances: header case, line folding, non-http blocks, unparseable http") {
    // lowercased header names, a folded WARC header value, and a
    // resource (non-http) record whose payload is the raw block
    val block = "raw resource bytes".getBytes("UTF-8")
    val rec = ("WARC/1.0\r\n" +
      "warc-type: Resource\r\n" +
      "WARC-Target-URI: http://a.example/\r\n" +
      "\tfolded-tail\r\n" +
      s"content-length: ${block.length}\r\n" +
      "\r\n").getBytes("UTF-8") ++ block ++ "\r\n\r\n".getBytes("UTF-8")
    // parseFile rows carry no schema (the DataFrame layer adds it):
    // positional access per WarcOps.Schema order
    val rows = WarcOps.parseFile(7L, rec)
    assert(rows.length == 1)
    assert(rows.head.getString(2) == "resource") // warc_type, lowercased
    assert(rows.head.getString(3) == "http://a.example/ folded-tail")
    assert(rows.head.get(5) == null) // http_status
    assert(new String(rows.head.get(8).asInstanceOf[Array[Byte]], "UTF-8") ==
      "raw resource bytes")
    assert(rows.head.getString(9) == "raw resource bytes") // UTF-8 text twin
    // an application/http record whose block is NOT parseable http:
    // surfaces with null http fields and the raw block as payload
    val junkHttp = "totally not http".getBytes("UTF-8")
    val rec2 = ("WARC/1.0\r\n" +
      "WARC-Type: response\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${junkHttp.length}\r\n" +
      "\r\n").getBytes("UTF-8") ++ junkHttp ++ "\r\n\r\n".getBytes("UTF-8")
    val rows2 = WarcOps.parseFile(8L, rec2)
    assert(rows2.length == 1)
    assert(rows2.head.get(5) == null) // http_status: envelope unparseable
    assert(new String(rows2.head.get(8).asInstanceOf[Array[Byte]], "UTF-8") ==
      "totally not http")
    // an unknown/illegal declared charset falls back to UTF-8, total:
    // the decode never throws and the charset column keeps the claim
    val weird = "body bytes here".getBytes("UTF-8")
    val http3 = ("HTTP/1.1 200 X\r\n" +
      "Content-Type: text/plain; charset=\"no such cs!\"\r\n\r\n").getBytes("US-ASCII") ++ weird
    val rec3 = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${http3.length}\r\n\r\n").getBytes("UTF-8") ++
      http3 ++ "\r\n\r\n".getBytes("UTF-8")
    val rows3 = WarcOps.parseFile(8L, rec3)
    assert(rows3.length == 1)
    assert(rows3.head.getString(7) == "no such cs!") // charset as declared
    assert(rows3.head.getString(9) == "body bytes here") // UTF-8 fallback decode
  }

  test("charset forms legacy servers emit; binary payloads skip the text decode") {
    def respRec(contentType: String, body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n\r\n")
        .getBytes("US-ASCII") ++ body
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
        http ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val latin = ("caf" + 0xE9.toChar).getBytes("ISO-8859-1")
    // whitespace around '=' and single quotes — both ubiquitous on
    // legacy servers; missing them silently decodes latin-1 as mojibake
    for (ct <- Seq("text/html; charset = iso-8859-1",
                   "text/html; CHARSET='ISO-8859-1'",
                   "text/html; charset=\"iso-8859-1\"")) {
      val r = WarcOps.parseFile(1L, respRec(ct, latin)).head
      assert(r.getString(7) == "iso-8859-1", s"charset from: $ct")
      assert(r.getString(9) == "caf" + 0xE9.toChar, s"decode under: $ct")
    }
    // a binary content type keeps its bytes but skips the text decode —
    // a jpeg body must not ride every exchange twice as replacement-char
    // garbage (payload_text null, the media operators read `payload`)
    val fakeJpeg = Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte, 0xE0.toByte, 7, 9)
    val img = WarcOps.parseFile(2L, respRec("image/jpeg", fakeJpeg)).head
    assert(img.getString(6) == "image/jpeg")
    assert(java.util.Arrays.equals(img.get(8).asInstanceOf[Array[Byte]], fakeJpeg))
    assert(img.getString(9) == null, "binary payloads carry no payload_text")
    // json stays text-shaped
    val js = WarcOps.parseFile(3L,
      respRec("application/json", "{\"k\":1}".getBytes("UTF-8"))).head
    assert(js.getString(9) == "{\"k\":1}")
  }

  test("meta-charset prescan: sniffed decode, header precedence, http-equiv form") {
    def respRec(contentType: String, body: Array[Byte]): Array[Byte] = {
      val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\n\r\n")
        .getBytes("US-ASCII") ++ body
      ("WARC/1.0\r\nWARC-Type: response\r\n" +
        "Content-Type: application/http; msgtype=response\r\n" +
        s"Content-Length: ${http.length}\r\n\r\n").getBytes("UTF-8") ++
        http ++ "\r\n\r\n".getBytes("UTF-8")
    }
    val eAcute = 0xE9.toChar
    // no header charset + a meta declaration: the sniff drives the decode
    val metaOnly = WarcOps.parseFile(1L, respRec("text/html",
      (s"""<meta charset="iso-8859-1">caf$eAcute""").getBytes("ISO-8859-1"))).head
    assert(metaOnly.getString(7) == null, "charset column = HEADER declaration only")
    assert(metaOnly.getString(9) == s"""<meta charset="iso-8859-1">caf$eAcute""")
    // header charset beats a conflicting meta (WHATWG precedence)
    val hdrWins = WarcOps.parseFile(2L, respRec("text/html; charset=utf-8",
      (s"""<meta charset="iso-8859-1">caf$eAcute""").getBytes("UTF-8"))).head
    assert(hdrWins.getString(7) == "utf-8")
    assert(hdrWins.getString(9) == s"""<meta charset="iso-8859-1">caf$eAcute""",
      "a meta-first decode would read the two utf-8 bytes as mojibake")
    // the http-equiv/content form, a cp1252-only byte
    val equiv = WarcOps.parseFile(3L, respRec("text/html",
      ("<meta http-equiv=\"Content-Type\" " +
        "content=\"text/html; charset=windows-1252\">q\u201C")
        .getBytes("windows-1252"))).head
    assert(equiv.getString(9).endsWith("q\u201C"))
    // non-html text NEVER sniffs: a plain-text file QUOTING a meta tag
    // keeps the UTF-8 default
    val plain = WarcOps.parseFile(4L, respRec("text/plain",
      ("say <meta charset=\"iso-8859-1\"> then caf\u00E9").getBytes("UTF-8"))).head
    assert(plain.getString(9).endsWith("caf\u00E9"))
    // unsupported sniffed name degrades to the UTF-8 fallback, total
    val bogus = WarcOps.parseFile(5L, respRec("text/html",
      "<meta charset=\"no-such-cs\">ok".getBytes("UTF-8"))).head
    assert(bogus.getString(9).endsWith("ok"))
    // the prescan window is 1024 bytes: a meta beyond it is not seen
    val far = ("x" * 1100) + "<meta charset=\"iso-8859-1\">" + "caf\u00E9"
    val farRow = WarcOps.parseFile(6L, respRec("text/html",
      far.getBytes("UTF-8"))).head
    assert(farRow.getString(9).endsWith("caf\u00E9"), "UTF-8 default past the window")
    // charset= inside ANOTHER attribute's value is a decoy, not a
    // declaration: attribute-position discipline must skip the og:url
    // query string and honor the later real charset attribute
    val decoy = WarcOps.parseFile(7L, respRec("text/html",
      ("<meta property=\"og:url\" content=\"http://x/?charset=big5\">" +
        "<meta charset=\"iso-8859-1\">caf" + 0xE9.toChar)
        .getBytes("ISO-8859-1"))).head
    assert(decoy.getString(9).endsWith("caf" + 0xE9.toChar),
      "a flat regex would decode as big5 here")
    // a content attribute carrying charset= WITHOUT http-equiv=
    // content-type is not a declaration either
    val noEquiv = WarcOps.parseFile(8L, respRec("text/html",
      ("<meta name=\"x\" content=\"text/html; charset=iso-8859-1\">caf\u00E9")
        .getBytes("UTF-8"))).head
    assert(noEquiv.getString(9).endsWith("caf\u00E9"),
      "content= only counts on an http-equiv=content-type tag")
    // an UNBALANCED quote elsewhere in the tag must not hide a real
    // charset declaration: the loose fallback pass catches what the
    // strict quoted-run pattern cannot span
    val unbalanced = WarcOps.parseFile(10L, respRec("text/html",
      ("<meta charset=iso-8859-1 content=O'Brien>caf" + 0xE9.toChar)
        .getBytes("ISO-8859-1"))).head
    assert(unbalanced.getString(9).endsWith("caf" + 0xE9.toChar),
      "stray apostrophe in another attribute must not kill the sniff")
    // NO Content-Type header at all: the legacy class that relies
    // entirely on its meta \u2014 absent type must still sniff
    val noCt = ("HTTP/1.1 200 OK\r\n\r\n").getBytes("US-ASCII") ++
      ("<meta charset=\"iso-8859-1\">caf" + 0xE9.toChar).getBytes("ISO-8859-1")
    val noCtRec = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      "Content-Type: application/http; msgtype=response\r\n" +
      s"Content-Length: ${noCt.length}\r\n\r\n").getBytes("UTF-8") ++
      noCt ++ "\r\n\r\n".getBytes("UTF-8")
    val noCtRow = WarcOps.parseFile(9L, noCtRec).head
    assert(noCtRow.getString(9).endsWith("caf" + 0xE9.toChar),
      "header-less html sniffs its meta")
  }

  test("payload digest surfaces verbatim; revisits resolve to the canonical original") {
    val ids = Seq(3L, 13L, 23L, 4L).toDF("doc_id") // 3/13/23 share residue 3
    val recs = WarcOps.parseWarc(spark, WarcOps.warcRevisitPayloads(spark, ids))
    // the digest header reads back verbatim on responses AND revisits
    val digests = recs.filter(col("doc_id") === 3L).orderBy("rec_index")
      .select("payload_digest").as[String].collect().toSeq
    assert(digests == Seq("sha1:R3", "sha1:R3", "sha1:X3"))
    val resolved = WarcOps.resolveRevisits(recs)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        ((Option(r.get(4)).map(_.asInstanceOf[Long]),
          Option(r.get(5)).map(_.asInstanceOf[Long])))).toMap
    // all three residue-3 revisits point at doc 3's response (lowest id)
    for (doc <- Seq(3L, 13L, 23L))
      assert(resolved((doc, 1L)) == ((Some(3L), Some(0L))), s"doc $doc")
    assert(resolved((4L, 1L)) == ((Some(4L), Some(0L))), "own residue class")
    // the digest no response carries resolves to nulls, row kept
    assert(resolved((3L, 2L)) == ((None, None)), "unresolved revisit")
    // a record WITHOUT the digest header keeps the column null
    val plain = WarcOps.parseWarc(spark, WarcOps.warcPayloads(spark, Seq(2L).toDF("doc_id")))
    assert(plain.filter(col("payload_digest").isNotNull).count() == 0)
  }

  test("rec_offset anchors every record's version line; cdx surt keys range-group") {
    // plain file (odd doc): offsets index the file bytes directly
    val plainBytes = WarcOps.syntheticWarc(5L)
    WarcOps.parseFile(5L, plainBytes).foreach { r =>
      val off = r.getLong(11)
      assert(new String(plainBytes, off.toInt, 5, "US-ASCII") == "WARC/",
        s"plain offset $off")
    }
    // gzip file (even doc): offsets are the COMPRESSED starts of the
    // member containing each record — seek there, inflate ONE member,
    // and the record's version line is at its head (the CDX offset
    // contract a range-request replay needs)
    val gzBytes = WarcOps.syntheticWarc(4L)
    WarcOps.parseFile(4L, gzBytes).foreach { r =>
      val off = r.getLong(11).toInt
      assert((gzBytes(off) & 0xFF) == 0x1F && (gzBytes(off + 1) & 0xFF) == 0x8B,
        s"gz offset $off lands on a member header")
      val one = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gzBytes, off, gzBytes.length - off))
      val head = new Array[Byte](5)
      var got = 0
      while (got < 5) got += one.read(head, got, 5 - got)
      assert(new String(head, "US-ASCII") == "WARC/",
        s"member at $off inflates to a record head")
    }
    // member-per-record layout: each record gets a DISTINCT member
    assert(WarcOps.parseFile(4L, gzBytes).map(_.getLong(11)).distinct.size ==
      WarcOps.parseFile(4L, gzBytes).size)
    // surt keys: reversed host labels put subdomains in one key range,
    // query kept, port and scheme dropped
    val urls = Seq(
      (1L, "https://a.site.example.com:8443/p/q?x=1"),
      (2L, "http://site.example.com/"),
      (3L, "http://other.net"))
      .toDF("doc_id", "url")
    val keys = urls.select(col("doc_id"), UrlOps.surtKey(col("url")).as("k"))
      .as[(Long, String)].collect().toMap
    assert(keys(1L) == "com,example,site,a)/p/q?x=1")
    assert(keys(2L) == "com,example,site)/")
    assert(keys(3L) == "net,other)/", "empty path -> /")
    assert(keys(1L).startsWith(keys(2L).stripSuffix(")/")),
      "subdomain keys share the domain prefix")
    // non-hierarchical URIs (dns:/urn: records in real WARCs) key to
    // NULL, never to a colliding ')/' garbage bucket
    val nonH = Seq((1L, "dns:example.com"), (2L, "urn:uuid:abc"))
      .toDF("doc_id", "url")
      .select(col("doc_id"), UrlOps.surtKey(col("url")).as("k"))
      .collect()
    assert(nonH.forall(_.isNullAt(1)), "authority-less URIs -> null key")
  }

  test("readRecordAt/fetchRecords: every cdx offset fetches exactly its record") {
    // real files on disk, both physical classes: even doc gzipped
    // member-per-record, odd plain
    val dir = tmpDir("graft_warc_fetch")
    for (doc <- Seq(4L, 5L))
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/doc_$doc.warc"),
        WarcOps.syntheticWarc(doc))
    val full = WarcOps.readWarc(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(12), r.toSeq)).toSeq
    assert(full.size == 3 + 4,
      "fixture: warcinfo + (1 + doc % 3) responses per file")
    // driver-side single fetch: each (path, offset) returns ITS record —
    // same fields as the full scan's row at that anchor, with the
    // fetch-contract anchors (rec_index 0, rec_offset = the offset)
    for ((path, off, expected) <- full) {
      val got = WarcOps.readRecordAt(spark, path, off).collect()
      assert(got.length == 1)
      val g = got.head.toSeq
      // columns: path, doc_id, rec_index, then the envelope/payload
      // fields, rec_offset last
      assert(g.head == path && g(2) == 0L && g.last == off)
      // payload bytes are an Array (reference equality) — compare by value
      def norm(s: Seq[Any]): Seq[Any] =
        s.map { case a: Array[Byte] => a.toSeq; case x => x }
      assert(norm(g.slice(3, g.size - 1)) ==
          norm(expected.slice(3, expected.size - 1)),
        s"fetched record at $path:$off must equal the scanned record")
    }
    // distributed fetch over the cdx projection (responses only), which
    // now carries the shard path locator
    val cdx = WarcOps.cdx(WarcOps.readWarc(spark, dir))
    val fetched = WarcOps.fetchRecords(spark,
      cdx.select(col("path"), col("rec_offset")))
    assert(fetched.count() == 2 + 3, "2 + 3 responses, both physical classes")
    val uris = fetched.select(col("target_uri")).as[String].collect().toSet
    assert(uris == (for (doc <- Seq(4L, 5L); i <- 0L to doc % 3)
      yield s"http://site${doc % 7}.example/page/$doc/$i").toSet)
    // the declared-charset decode happens on the fetch path too: the
    // latin-1 ordinal (i % 3 == 1) reads back its 0xE9 byte
    val caf = fetched.filter(col("target_uri").endsWith("/1"))
      .select(col("payload_text")).as[String].collect()
    assert(caf.nonEmpty && caf.forall(_.startsWith("café ")))
    // loud contracts: a non-boundary offset, an out-of-range offset, and
    // an over-cap record all fail by name instead of returning garbage
    val (p5, off5) = (s"$dir/doc_5.warc",
      full.collect { case (p, o, _) if p.endsWith("doc_5.warc") => o }.max)
    intercept[IllegalArgumentException](
      WarcOps.readRecordAt(spark, p5, off5 + 3).collect())
    intercept[IllegalArgumentException](
      WarcOps.readRecordAt(spark, p5, 1L << 40).collect())
    val e = intercept[IllegalArgumentException](
      WarcOps.readRecordAt(spark, p5, 0L, maxBytes = 16).collect())
    assert(e.getMessage.contains("maxBytes"))
  }

  test("parseWarc composes with parseUrls/extractLinks (the crawl pipeline's next steps)") {
    val ids = Seq(2L, 5L).toDF("doc_id")
    val recs = WarcOps.parseWarc(spark, WarcOps.warcPayloads(spark, ids))
      .filter(col("warc_type") === "response")
    val hosts = UrlOps.parseUrls(recs.withColumn("url", col("target_uri")))
      .select(col("doc_id"), col("host")).distinct()
      .as[(Long, String)].collect().toSet
    assert(hosts == Set((2L, "site2.example"), (5L, "site5.example")))
    val links = UrlOps.extractLinks(recs.select(col("doc_id"), col("payload_text")),
      textCol = "payload_text").as[(Long, Long, String)].collect()
    // html payloads (even response ordinal) carry exactly one link each
    assert(links.nonEmpty && links.forall(_._3.startsWith("http://ref")))
  }

  test("single-member multi-record .warc.gz: truncation keeps records decoded before the cut") {
    // the `gzip file.warc` layout: the WHOLE multi-record file is ONE
    // gzip member — here the damaged member's partially-inflated prefix
    // is the only carrier of the earlier records, so dropping it (the
    // pre-r14 catch) turned every mid-stream cut into zero records
    val plain = WarcOps.syntheticWarc(5L) // odd → plain fixture bytes
    val full = WarcOps.parseFile(5L, plain)
    assert(full.length == 4, "fixture: warcinfo + 3 responses")
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(plain); gz.close()
    val whole = bos.toByteArray
    assert(WarcOps.parseFile(5L, whole).map(_.get(3)) == full.map(_.get(3)),
      "the intact single-member file parses identically to plain")
    // EVERY truncation point yields a clean record prefix, and the sweep
    // passes through intermediate counts — the plain path's totality
    // contract, now holding on this layout too
    val counts = (1 until whole.length).map { cut =>
      val rows = WarcOps.parseFile(5L, whole.take(cut))
      assert(rows.map(_.get(3)) == full.take(rows.length).map(_.get(3)), s"cut=$cut")
      rows.length
    }
    assert(counts.exists(k => k > 0 && k < full.length),
      "some cut must surface a strict prefix of the records (non-vacuous)")
    // RANDOM ACCESS into this layout is refused, not silently wrong:
    // every record shares the member-start offset, so "the record at
    // offset 0" names four records — returning the first would be wrong
    // data for the other three CDX rows
    val dir = tmpDir("graft_warc_onemember")
    java.nio.file.Files.write(
      java.nio.file.Paths.get(s"$dir/whole.warc.gz"), whole)
    val e = intercept[IllegalArgumentException](
      WarcOps.readRecordAt(spark, s"$dir/whole.warc.gz", 0L).collect())
    assert(e.getMessage.contains("member holding 4 records"), e.getMessage)
  }
}
