package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode normalization (NFC / NFKC) over a string column —
  * the standard first cleaning step of a web-scale text pipeline
  * (decomposed accents, ligatures, full-width forms and compatibility
  * characters otherwise split the SAME word across vocabulary, dedup
  * fingerprint and tokenizer-merge space; C4/CCNet-class pipelines
  * normalize before everything else). Spark has no built-in for it, and
  * a Scala UDF would break whole-stage codegen in the one projection
  * that by definition touches every byte of the corpus.
  *
  * FAST PATH: `Normalizer.isNormalized` runs first and returns the
  * input UTF8String untouched when it is already normalized — for the
  * overwhelmingly-ASCII web corpus this is a quick-check scan with zero
  * allocation, so the 100 TB cost is a read pass, not a rewrite pass.
  * Only rows that actually carry denormalized codepoints pay the
  * String round-trip.
  *
  * NFC is DuckDB-oracle-gated (`nfc_normalize` — q_unicode_nfc); NFKC
  * (ligature/width/compatibility folding, the aggressive variant
  * tokenizer pipelines prefer) has no DuckDB normalize twin, so its
  * gate (q_unicode_nfkc, since r9) states GOLDEN VALUES: the injected
  * compatibility dirt folds to plain ASCII the oracle spells directly.
  * Registered as `graft_nfc` / `graft_nfkc` via [[GraftExtensions]].
  */
final case class UnicodeNormalize(child: Expression, nfkc: Boolean)
    extends UnaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects string, got ${t.simpleString(5)}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = if (nfkc) "graft_nfkc" else "graft_nfc"

  override def nullSafeEval(input: Any): Any =
    UnicodeNormalize.normalize(input.asInstanceOf[UTF8String], nfkc)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UnicodeNormalize.normalize($c, $nfkc)")

  override protected def withNewChildInternal(c: Expression): UnicodeNormalize =
    copy(child = c)
}

object UnicodeNormalize {
  /** Shared by interpreted eval and generated code (a static call keeps
    * the codegen body one line and JIT-friendly). */
  def normalize(s: UTF8String, nfkc: Boolean): UTF8String = {
    // pure-ASCII fast path with NO String materialisation: ASCII is a
    // fixed point of both NFC and NFKC, and numBytes == numChars is an
    // allocation-free byte scan — the common (web-text) row never
    // leaves the UTF8String buffer
    if (s.numBytes == s.numChars) return s
    val form =
      if (nfkc) java.text.Normalizer.Form.NFKC else java.text.Normalizer.Form.NFC
    val str = s.toString
    if (java.text.Normalizer.isNormalized(str, form)) s
    else UTF8String.fromString(java.text.Normalizer.normalize(str, form))
  }
}
