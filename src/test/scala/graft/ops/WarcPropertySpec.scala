package graft.ops

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property battery for the WARC byte-walk: round-trip over GENERATED
  * record shapes (random header names/values, random bodies including
  * CRLF runs and non-UTF-8 bytes), and totality under arbitrary damage
  * (random bytes, random truncation points) — the "total on garbage"
  * claim proven beyond the hand-built fixtures. Fixed seeds, manual
  * sampling (the [[graft.ContractGen]] convention — the scalatestplus
  * bridge is not on the offline classpath). */
class WarcPropertySpec extends AnyFunSuite {

  private def sample[A](gen: Gen[A], n: Int, seed: Long): Seq[A] =
    (0 until n).flatMap(i => gen.apply(Gen.Parameters.default, Seed(seed + i)))

  // header VALUES: printable ASCII without CR/LF (the grammar's token
  // space; leading/trailing blanks get trimmed by the parser, so keep
  // the generator trimmed to compare verbatim)
  private val genValue: Gen[String] =
    Gen.listOf(Gen.choose(33.toChar, 126.toChar))
      .map(_.mkString.filter(_ != ':').take(40))

  // bodies: arbitrary BYTES — CRLFs, fake version lines, nulls, high
  // bytes; Content-Length framing must carry the parse straight through
  private val genBody: Gen[Array[Byte]] = Gen.oneOf(
    Gen.listOf(Gen.choose(Byte.MinValue, Byte.MaxValue)).map(_.toArray),
    Gen.const("\r\nWARC/1.0\r\nContent-Length: 3\r\n\r\n".getBytes("UTF-8")),
    Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray))

  private case class Rec(warcType: String, uri: Option[String], body: Array[Byte])

  private val genRec: Gen[Rec] = for {
    t <- Gen.oneOf("response", "request", "metadata", "resource", "revisit")
    uri <- Gen.option(genValue.map(v => "http://x.example/" + v.filter(_ != ' ')))
    body <- genBody
  } yield Rec(t, uri, body)

  private def serialize(r: Rec): Array[Byte] = {
    val head = (Seq("WARC/1.0", s"WARC-Type: ${r.warcType}") ++
      r.uri.map(u => s"WARC-Target-URI: $u") ++
      Seq(s"Content-Length: ${r.body.length}", "", "")).mkString("\r\n")
    head.getBytes("UTF-8") ++ r.body ++ "\r\n\r\n".getBytes("UTF-8")
  }

  test("round trip: generated record sequences parse back field-for-field") {
    val files = sample(Gen.listOfN(4, genRec), 120, seed = 0x57A2C)
    files.zipWithIndex.foreach { case (recs, i) =>
      val bytes = recs.map(serialize).foldLeft(Array.empty[Byte])(_ ++ _)
      val rows = WarcOps.parseFile(i.toLong, bytes)
      assert(rows.length == recs.length, s"file $i record count")
      rows.zip(recs).foreach { case (row, rec) =>
        assert(row.getString(2) == rec.warcType)
        assert(Option(row.getString(3)) == rec.uri)
        assert(java.util.Arrays.equals(
          row.get(8).asInstanceOf[Array[Byte]], rec.body),
          s"file $i body round trip (len ${rec.body.length})")
      }
    }
  }

  test("totality: arbitrary byte blobs never throw") {
    val blobs = sample(Gen.listOf(Gen.choose(0, 255)).map(_.map(_.toByte).toArray),
      300, seed = 0xBEEF)
    blobs.foreach { b =>
      WarcOps.parseFile(1L, b) // must not throw, any result is acceptable
    }
    // gzip-magic-prefixed garbage takes the decompress path, still total
    blobs.foreach { b =>
      WarcOps.parseFile(1L, Array(0x1F.toByte, 0x8B.toByte) ++ b)
    }
  }

  test("totality: every truncation point of a valid file yields a clean prefix") {
    val recs = sample(genRec, 6, seed = 0xCAFE)
    val whole = recs.map(serialize).foldLeft(Array.empty[Byte])(_ ++ _)
    val full = WarcOps.parseFile(0L, whole)
    assert(full.length == recs.length)
    // every cut: no throw, and the surviving records are a PREFIX of the
    // full parse (field-identical, never reordered or corrupted)
    (0 until whole.length by 7).foreach { cut =>
      val rows = WarcOps.parseFile(0L, whole.take(cut))
      assert(rows.length <= full.length)
      rows.zip(full).foreach { case (a, b) =>
        assert(a.getString(2) == b.getString(2) &&
          java.util.Arrays.equals(a.get(8).asInstanceOf[Array[Byte]],
            b.get(8).asInstanceOf[Array[Byte]]),
          s"truncation at $cut must yield an exact prefix")
      }
    }
  }
}
