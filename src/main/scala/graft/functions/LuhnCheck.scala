package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Luhn (ISO/IEC 7812 mod-10) checksum validation over a
  * string column — the verification step that separates a real payment
  * card number from sixteen random digits. A digit-shape regex alone
  * redacts phone-number fragments, order ids, and timestamps; requiring
  * the checksum cuts the false-positive rate by ~10× (only 1 in 10
  * random digit strings pass), which is what makes card redaction safe
  * to run over a whole corpus.
  *
  * Contract (shared by interpreted eval and generated code):
  *   - space and dash are accepted as group separators and skipped;
  *   - ANY other non-digit character → false (the input should be a
  *     regex-extracted candidate, not free text);
  *   - 13–19 digits required (the ISO/IEC 7812 PAN length envelope);
  *   - standard mod-10: from the RIGHTMOST digit, double every second
  *     digit, subtract 9 when the double exceeds 9, sum % 10 == 0.
  *
  * A native expression rather than a higher-order-function tree: the
  * check runs per extracted candidate inside `filter()` lambdas, and a
  * nested aggregate/transform tree there would be interpreted per
  * element — this stays one generated static call.
  *
  * Registered as `graft_luhn` via [[GraftExtensions]].
  */
final case class LuhnCheck(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString(5)}")
  }

  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_luhn"

  override def nullSafeEval(input: Any): Any =
    LuhnCheck.valid(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.LuhnCheck.valid($c)")

  override protected def withNewChildInternal(c: Expression): LuhnCheck =
    copy(child = c)
}

object LuhnCheck {

  /** Shared by interpreted eval and generated code. Digits, spaces, and
    * dashes only; 13–19 digits; mod-10 over the digit sequence. The scan
    * is byte-level — candidates are ASCII by construction (any multi-byte
    * UTF-8 unit has its high bit set and fails the digit/separator
    * test), so no string materialisation. */
  def valid(s: UTF8String): Boolean = {
    val n = s.numBytes
    var sum = 0
    var nd = 0
    var alt = false
    var i = n - 1 // rightmost digit first: that's where doubling anchors
    while (i >= 0) {
      val b = s.getByte(i)
      if (b >= '0' && b <= '9') {
        var d = b - '0'
        if (alt) { d *= 2; if (d > 9) d -= 9 }
        sum += d
        nd += 1
        alt = !alt
      } else if (b != ' ' && b != '-') return false
      i -= 1
    }
    nd >= 13 && nd <= 19 && sum % 10 == 0
  }
}
