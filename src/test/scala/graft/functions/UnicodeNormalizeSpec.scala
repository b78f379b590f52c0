package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class UnicodeNormalizeSpec extends SparkSpec {
  import spark.implicits._

  private def nfcOf(s: String): String =
    spark.sql(s"SELECT graft_nfc('$s')").collect().head.getString(0)
  private def nfkcOf(s: String): String =
    spark.sql(s"SELECT graft_nfkc('$s')").collect().head.getString(0)

  test("NFC golden pairs: combining marks compose, composed text is a fixed point") {
    assert(nfcOf("café") == "café")       // e + acute -> é
    assert(nfcOf("naïve") == "naïve")     // i + diaeresis -> ï
    assert(nfcOf("café") == "café")        // already composed
    assert(nfcOf("ascii only") == "ascii only")
    // NFC leaves compatibility characters alone (that's NFKC's job)
    assert(nfcOf("ﬁne") == "ﬁne")
  }

  test("NFKC golden pairs: ligatures, widths and circled digits fold") {
    assert(nfkcOf("ﬁne") == "fine")             // ﬁ ligature
    assert(nfkcOf("ＡＢＣ") == "ABC")    // full-width
    assert(nfkcOf("①②") == "12")           // circled digits
    assert(nfkcOf("café") == "café")      // NFKC ⊇ NFC
  }

  test("null propagates; non-string input is rejected at analysis") {
    val r = Seq[Option[String]](Some("á"), None).toDF("s")
      .selectExpr("graft_nfc(s) AS n").collect()
    assert(r(0).getString(0) == "á" && r(1).isNullAt(0))
    intercept[Exception] {
      Seq(1).toDF("x").selectExpr("graft_nfc(x)").collect()
    }
  }

  test("interpreted eval matches codegen, and the ASCII fast path returns the input buffer") {
    val rows = Seq("café mix", "plain ascii", "ﬃx", "naïve")
    // codegen path (projection over a DataFrame)
    val viaCodegen = rows.toDF("s").selectExpr("graft_nfc(s)", "graft_nfkc(s)")
      .collect().map(r => (r.getString(0), r.getString(1)))
    // interpreted path (direct expression eval)
    val viaEval = rows.map { s =>
      (UnicodeNormalize.normalize(UTF8String.fromString(s), nfkc = false).toString,
        UnicodeNormalize.normalize(UTF8String.fromString(s), nfkc = true).toString)
    }
    assert(viaCodegen.toSeq == viaEval, s"$viaCodegen vs $viaEval")
    // allocation-free identity on ASCII: the SAME UTF8String comes back
    val ascii = UTF8String.fromString("just ascii bytes")
    assert(UnicodeNormalize.normalize(ascii, nfkc = false) eq ascii)
    assert(UnicodeNormalize.normalize(ascii, nfkc = true) eq ascii)
    // and on already-normalized non-ASCII (isNormalized fast path)
    val composed = UTF8String.fromString("café")
    assert(UnicodeNormalize.normalize(composed, nfkc = false) eq composed)
  }

  test("normalization unifies vocabulary: decomposed and composed spellings merge") {
    // the pipeline motivation in one assertion: same visible word, two
    // byte forms -> one vocab entry after nfc
    val docs = Seq((1L, "café bar"), (2L, "café bar")).toDF("doc_id", "text")
    val vocabRaw = graft.ops.Bpe.wordVocab(docs).count()
    val vocabNorm = graft.ops.Bpe.wordVocab(
      docs.withColumn("text", graft.ops.TextOps.nfc(col("text")))).count()
    assert(vocabRaw == 3L && vocabNorm == 2L, s"raw $vocabRaw norm $vocabNorm")
  }
}
