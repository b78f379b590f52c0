package graft.functions

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Codegen'd dot product over two `array<double>` columns.
  *
  * The composable formulation (`aggregate(zip_with(a, b, _*_), 0d, _+_)`)
  * allocates a zipped intermediate array per row-pair and folds through
  * lambda dispatch; in pair-scoring joins (ANN, embedding dedup) that is
  * the hot loop. This expression generates a bare multiply-add loop over
  * the two `ArrayData` buffers — no allocation, stays inside whole-stage
  * codegen. Element order is ascending, so results are bit-identical to
  * the sequential fold it replaces.
  *
  * Registered as SQL function `graft_dot` via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.functions.GraftExtensions` or
  * `builder.withExtensions(new GraftExtensions)`).
  */
final case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(DoubleType, _), ArrayType(DoubleType, _)) => TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"graft_dot expects (array<double>, array<double>), got (${l.simpleString(5)}, ${r.simpleString(5)})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n)
      throw new IllegalArgumentException(
        s"graft_dot dimension mismatch: $n vs ${y.numElements()}")
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw new IllegalArgumentException(
         |    "graft_dot dimension mismatch: " + $n + " vs " + $b.numElements());
         |}
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
}

/** Session extension registering graft's native functions and the
  * fold→native optimizer rewrite. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => DotProduct(children.head, children(1))))
    ext.injectFunction((
      FunctionIdentifier("graft_md5hh"),
      new ExpressionInfo(classOf[Md5Hash60].getName, "graft_md5hh"),
      (children: Seq[Expression]) => Md5Hash60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_minhash60"),
      new ExpressionInfo(classOf[MinhashSigs60].getName, "graft_minhash60"),
      (children: Seq[Expression]) => MinhashSigs60(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => UnicodeNormalize(children.head, nfkc = false)))
    ext.injectFunction((
      FunctionIdentifier("graft_nfkc"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_nfkc"),
      (children: Seq[Expression]) => UnicodeNormalize(children.head, nfkc = true)))
    ext.injectFunction((
      FunctionIdentifier("graft_html_unescape"),
      new ExpressionInfo(classOf[HtmlUnescape].getName, "graft_html_unescape"),
      (children: Seq[Expression]) => HtmlUnescape(children.head)))
    ext.injectFunction((
      FunctionIdentifier("graft_luhn"),
      new ExpressionInfo(classOf[LuhnCheck].getName, "graft_luhn"),
      (children: Seq[Expression]) => LuhnCheck(children.head)))
    ext.injectOptimizerRule(_ => RewriteDotFold)
  }
}
