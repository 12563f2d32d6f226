package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType}

/** Hilbert-curve index of a 2-D cell: maps `(x, y)` in a `2^bits × 2^bits`
  * grid to its distance along the Hilbert space-filling curve — the
  * clustering key behind curve-ordered table layouts (q189/q195/q175).
  *
  * This is the classic xy2d walk (Hamilton's rotate/flip recurrence) as ONE
  * tight codegen'd loop: at each level take the two quadrant bits, accumulate
  * `s²·((3·rx) ⊕ ry)`, and rotate/reflect the frame for the next level. The
  * previous formulation unrolled the 10 levels as a ~60-node Column
  * expression tree per row (each level a `when` cascade over the prior
  * level's aliases); Catalyst codegen evaluated it fine but the generated
  * code re-materialized every intermediate — this Expression replaces the
  * tree with the 10-iteration loop a hand-written kernel would use.
  *
  * Portability contract (what keeps the DuckDB oracle hash-matching): the
  * reflection constant is the FULL-grid `2^bits − 1` at every level — the
  * exact twin of the SQL formulation and the JVM reference in
  * `RelationalSpec.hilbertXy2d`. Pure integer shift/mask/xor; inputs outside
  * `[0, 2^bits)` have their high bits ignored (only bits `0..bits-1` are
  * read). Null in either child yields null.
  */
case class HilbertIndex(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {

  require(bits >= 1 && bits <= 31,
    s"graft_hilbert bits must be in [1, 31], got $bits")

  private val mask = (1L << bits) - 1

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hilbert"

  override def nullSafeEval(xIn: Any, yIn: Any): Any = {
    var hx = xIn.asInstanceOf[Long] & mask
    var hy = yIn.asInstanceOf[Long] & mask
    var d = 0L
    var k = bits - 1
    while (k >= 0) {
      val rx = (hx >>> k) & 1L
      val ry = (hy >>> k) & 1L
      d += (1L << (2 * k)) * ((3L * rx) ^ ry)
      if (ry == 0L) {
        val t = hx
        hx = if (rx == 1L) mask - hy else hy
        hy = if (rx == 1L) mask - t else t
      }
      k -= 1
    }
    d
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val hx = ctx.freshName("hx")
      val hy = ctx.freshName("hy")
      val d = ctx.freshName("d")
      val k = ctx.freshName("k")
      val rx = ctx.freshName("rx")
      val ry = ctx.freshName("ry")
      val t = ctx.freshName("t")
      s"""
         |long $hx = $x & ${mask}L;
         |long $hy = $y & ${mask}L;
         |long $d = 0L;
         |for (int $k = ${bits - 1}; $k >= 0; $k--) {
         |  long $rx = ($hx >>> $k) & 1L;
         |  long $ry = ($hy >>> $k) & 1L;
         |  $d += (1L << (2 * $k)) * ((3L * $rx) ^ $ry);
         |  if ($ry == 0L) {
         |    long $t = $hx;
         |    $hx = ($rx == 1L) ? (${mask}L - $hy) : $hy;
         |    $hy = ($rx == 1L) ? (${mask}L - $t) : $t;
         |  }
         |}
         |${ev.value} = $d;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertIndex =
    copy(left = newLeft, right = newRight)
}
