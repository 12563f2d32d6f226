package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expressions for the vector hot path (ANN search, cosine
  * near-dup). The equivalent `aggregate`/`zip_with` higher-order functions
  * evaluate their lambda interpreted, once per array element; these compile
  * into the whole-stage-codegen loop.
  *
  * Numeric contract (what keeps the DuckDB oracle hash-matching): a plain
  * left-to-right fold over double elements — exactly the evaluation order of
  * `aggregate(zip_with(a, b, (x, y) -> x * y), 0D, (acc, x) -> acc + x)` and
  * of DuckDB's `list_sum(list_transform(...))` — so swapping the
  * implementation changes no result bits. Elements are assumed non-null
  * (embeddings are dense); a null array yields null.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Inputs must already be ARRAY<DOUBLE> (call sites cast explicitly).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  // Length mismatch yields null — matching zip_with's null-padding (null
  // product -> null sum), so malformed vectors surface as nulls instead of
  // silently truncated partial sums.
  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (n != y.numElements()) null
    else {
      var sum = 0.0
      var i = 0
      while (i < n) { sum += x.getDouble(i) * y.getDouble(i); i += 1 }
      sum
    }
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      s"""
         |int $n = $a.numElements();
         |if ($n != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $sum = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $sum += $a.getDouble($i) * $b.getDouble($i);
         |  }
         |  ${ev.value} = $sum;
         |}
       """.stripMargin
    })

  override def nullable: Boolean = true

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** L2 norm of a double array: sqrt of the left-to-right sum of squares —
  * same fold order as `sqrt(aggregate(transform(a, x -> x * x), 0D, +))`. */
case class L2Norm(child: Expression)
    extends UnaryExpression {

  // Input must already be ARRAY<DOUBLE> (call sites cast explicitly).
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_l2norm"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    var sum = 0.0
    var i = 0
    while (i < n) { val v = x.getDouble(i); sum += v * v; i += 1 }
    math.sqrt(sum)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val sum = ctx.freshName("sum")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $sum = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  $sum += $v * $v;
         |}
         |${ev.value} = java.lang.Math.sqrt($sum);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): L2Norm =
    copy(child = newChild)
}
