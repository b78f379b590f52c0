package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd HTML entity decoding over a string column — the last step
  * of [[graft.ops.TextOps.stripHtml]]'s markup-removal pipeline (tag
  * stripping is plain regexp_replace; entity decode is not, because
  * neither Java regex nor RE2 can compute `chr()` of a capture, and a
  * Scala UDF would break whole-stage codegen in a projection that runs
  * over every crawled byte).
  *
  * ONE pass, decoded exactly once (never recursively — `&amp;amp;`
  * becomes the literal text `&amp;`, the standard anti-double-decode
  * posture):
  *
  *  - named entities: the core five (`&amp; &lt; &gt; &quot; &apos;`)
  *    plus `&nbsp;`, which folds to a PLAIN space — the cleaning
  *    pipeline's posture (a U+00A0 would just be one more invisible for
  *    downstream tokenizers to trip on).
  *  - numeric entities, decimal `&#NN;` (≤ 7 digits) and hex `&#xHH;`
  *    (≤ 6 digits, either case): decoded to the codepoint when it is a
  *    scalar value (1..U+10FFFF excluding surrogates); anything else —
  *    zero, out of range, a surrogate half, digitless — stays literal.
  *  - unknown names and bare `&` pass through byte-identical.
  *
  * FAST PATH: a byte scan for `&`; entity-free text (the overwhelming
  * majority of rows even in crawled corpora once tags are gone) returns
  * the input UTF8String with zero allocation.
  *
  * Registered as `graft_html_unescape` via [[GraftExtensions]].
  */
final case class HtmlUnescape(child: Expression) extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString(5)}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_html_unescape"

  override def nullSafeEval(input: Any): Any =
    HtmlUnescape.unescape(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.HtmlUnescape.unescape($c)")

  override protected def withNewChildInternal(c: Expression): HtmlUnescape =
    copy(child = c)
}

object HtmlUnescape {
  private val Named: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">",
    "quot" -> "\"", "apos" -> "'", "nbsp" -> " ")

  /** Shared by interpreted eval and generated code. */
  def unescape(s: UTF8String): UTF8String = {
    // allocation-free fast path: no '&' byte, no entity (0x26 never
    // occurs inside a UTF-8 multi-byte sequence, so the byte scan is
    // exact)
    val n = s.numBytes
    var has = false
    var i = 0
    while (i < n && !has) { if (s.getByte(i) == '&') has = true; i += 1 }
    if (!has) return s
    val str = s.toString
    val out = new java.lang.StringBuilder(str.length)
    var p = 0
    while (p < str.length) {
      val c = str.charAt(p)
      if (c != '&') { out.append(c); p += 1 }
      else {
        // entities are short: a ';' more than 9 chars away (longest
        // valid body is 8: x + 6 hex digits, or 7 decimal digits)
        // means this '&' starts no entity — and the scan is BOUNDED to
        // that window, or ampersand-dense semicolon-free text (a query-
        // string-heavy crawl) would make the pass O(n²) per row
        val limit = math.min(str.length, p + 10)
        var semi = p + 1
        while (semi < limit && str.charAt(semi) != ';') semi += 1
        if (semi >= limit || str.charAt(semi) != ';' || semi - p < 2) {
          out.append(c); p += 1
        }
        else {
          val body = str.substring(p + 1, semi)
          val decoded: String =
            if (body.charAt(0) == '#') {
              val num = body.substring(1)
              val cp: Int =
                try {
                  if (num.nonEmpty && (num.charAt(0) == 'x' || num.charAt(0) == 'X'))
                    if (num.length > 1) Integer.parseInt(num.substring(1), 16) else -1
                  else if (num.nonEmpty) Integer.parseInt(num, 10)
                  else -1
                } catch { case _: NumberFormatException => -1 }
              if (cp >= 1 && cp <= 0x10FFFF && (cp < 0xD800 || cp > 0xDFFF))
                new String(Character.toChars(cp))
              else null
            } else Named.getOrElse(body, null)
          if (decoded == null) { out.append(c); p += 1 }
          else { out.append(decoded); p = semi + 1 }
        }
      }
    }
    UTF8String.fromString(out.toString)
  }
}
