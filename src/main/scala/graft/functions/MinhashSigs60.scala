package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** All K=32 portable minhash signature values of a shingle array in ONE
  * native pass — the per-row (streaming) signature path's codegen'd core.
  *
  * The array-lambda spelling (`array_min(transform(hhs, p → p₁ + i·p₂))`
  * × 32 seeds over a `transform(sh, graft_md5hh)` precursor array) is
  * semantically identical but runs INTERPRETED: Spark does not compile
  * higher-order functions, so every element access walks an expression
  * tree per shingle per seed (measured 2.7× slower than the exploded
  * batch aggregation on sf0.1). Here each shingle is digested once
  * (`Md5Hash60`'s raw-byte packing) and the 32 running minima advance in
  * a tight JVM loop — the seed-i value h1 + i·h2 accumulates by repeated
  * addition (h1 < 2⁶⁰, 31·h2 < 2⁵⁷: no overflow).
  *
  * Parity contract: element i equals the lambda spelling's `mh$i`
  * bit-for-bit — null elements are skipped, an empty or all-null array
  * yields all-null signatures (what `array_min` over an empty/all-null
  * transform gives). `StreamNearDupSpec` pins the streamed frame equal
  * to the exploded batch family, which pins this expression too. */
final case class MinhashSigs60(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash60 expects array<string>, got ${t.simpleString(5)}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_minhash60"

  @transient private lazy val localDigest =
    new ThreadLocal[java.security.MessageDigest] {
      override def initialValue(): java.security.MessageDigest =
        java.security.MessageDigest.getInstance("MD5")
    }

  override def nullSafeEval(input: Any): Any =
    MinhashSigs60.compute(input.asInstanceOf[ArrayData], localDigest.get())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in => {
      val md = ctx.addMutableState("java.security.MessageDigest", "graftMhMd5",
        v => s"""try { $v = java.security.MessageDigest.getInstance("MD5"); }
                |catch (java.security.NoSuchAlgorithmException e) { throw new RuntimeException(e); }
                |""".stripMargin)
      s"${ev.value} = graft.functions.MinhashSigs60.compute($in, $md);"
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSigs60 =
    copy(child = newChild)
}

object MinhashSigs60 {

  /** Signature count — MUST equal `NearDup.MinHashK` (spec-pinned). */
  val K = 32

  def compute(arr: ArrayData, md: java.security.MessageDigest): ArrayData = {
    val mins = new Array[Long](K)
    java.util.Arrays.fill(mins, Long.MaxValue)
    var any = false
    var j = 0
    val n = arr.numElements()
    while (j < n) {
      if (!arr.isNullAt(j)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(j).getBytes)
        val h1 = Md5Hash60.h1Of(d)
        val h2 = Md5Hash60.h2Of(d)
        any = true
        var v = h1
        var i = 0
        while (i < K) {
          if (v < mins(i)) mins(i) = v
          v += h2
          i += 1
        }
      }
      j += 1
    }
    if (!any) new GenericArrayData(Array.fill[Any](K)(null))
    else new GenericArrayData(mins)
  }
}
