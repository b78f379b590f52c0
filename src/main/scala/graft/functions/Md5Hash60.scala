package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType, LongType}

/** The portable-hash digest pair `[h1, h2]` of a binary input, computed
  * directly from the raw MD5 bytes.
  *
  * Bit-identical by construction to the composable spelling the DuckDB
  * oracles replicate —
  * `conv(substr(md5(x), 1, 15), 16, 10)` and
  * `conv(substr(md5(x), 17, 13), 16, 10)` — because hex char `i`
  * (1-based) is nibble `i−1` of the digest:
  *
  *  - h1 = chars 1..15  = bytes 0..6 (56 bits) << 4 | high nibble of byte 7
  *  - h2 = chars 17..29 = bytes 8..13 (48 bits) << 4 | high nibble of byte 14
  *
  * What it skips versus the composable form: the 32-char hex encoding,
  * two substring allocations, and two base-16 string parses per shingle —
  * the dominant per-row cost of `HashMode.Portable` signatures
  * (`NearDup.minhashPrep`). One digest, two longs, zero intermediate
  * strings; the MessageDigest instance is reused across rows.
  * `HashModePortableParitySpec` pins equality against the composable
  * spelling on real corpus shingles. */
final case class Md5Hash60(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_md5hh expects binary, got ${t.simpleString(5)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_md5hh"

  @transient private lazy val localDigest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any = {
    val md = localDigest.get()
    md.reset()
    val d = md.digest(input.asInstanceOf[Array[Byte]])
    new GenericArrayData(Array(Md5Hash60.h1Of(d), Md5Hash60.h2Of(d)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val md = ctx.addMutableState("java.security.MessageDigest", "graftMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      val d = ctx.freshName("digest")
      s"""
         |$md.reset();
         |final byte[] $d = $md.digest($in);
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  new long[]{ graft.functions.Md5Hash60.h1Of($d), graft.functions.Md5Hash60.h2Of($d) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hash60 {
  /** Hex chars 1..15: bytes 0..6 fully, then the high nibble of byte 7. */
  def h1Of(d: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < 7) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(7) & 0xf0L) >> 4)
  }

  /** Hex chars 17..29: bytes 8..13 fully, then the high nibble of byte 14. */
  def h2Of(d: Array[Byte]): Long = {
    var acc = 0L
    var i = 8
    while (i < 14) { acc = (acc << 8) | (d(i) & 0xffL); i += 1 }
    (acc << 4) | ((d(14) & 0xf0L) >> 4)
  }
}
