package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType, StringType}

/** |A ∩ B| of two SORTED, duplicate-free arrays in one O(|A|+|B|)
  * merge walk, allocating nothing — versus `size(array_intersect(a, b))`,
  * which builds a hash set of one side AND materializes the intersection
  * array only for `size` to immediately reduce it to an int. Containment /
  * overlap verification (q78) calls this once per candidate pair with
  * full shingle-digest arrays on both sides, so the avoided allocation is
  * per-pair × per-element.
  *
  * Element types: `string` (UTF8String lexicographic order) or `bigint`
  * (numeric order) — both sides must agree. The q78 verify payloads moved
  * from 32-byte md5 hex strings to 60-bit truncated digests in round 13
  * (4× smaller shuffle/memo rows), which is what the long branch serves;
  * the string branch stays for callers that walk raw token arrays.
  *
  * Contract: both inputs ascending (Spark `array_sort` order — null
  * elements, if any, sort LAST and are skipped here) and duplicate-free
  * (`array_distinct`); on unsorted input the count is a lower bound, not an
  * error. Value-identical to `size(array_intersect(a, b))` under the
  * contract (law-checked in `SortedIntersectSpec`). Null array → null.
  */
case class SortedIntersectCount(left: Expression, right: Expression)
  extends BinaryExpression {

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (StringType | LongType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(a), Some(b)) if a == b => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"$prettyName needs two array<string> or two array<bigint> inputs, " +
          s"got ${left.dataType.catalogString} and " +
          s"${right.dataType.catalogString}")
    }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_count"

  private lazy val longElems =
    left.dataType.asInstanceOf[ArrayType].elementType == LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i = na // nulls sort last: nothing left to match
      else if (b.isNullAt(j)) j = nb
      else {
        val cmp =
          if (longElems) java.lang.Long.compare(a.getLong(i), b.getLong(j))
          else a.getUTF8String(i).compareTo(b.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val cmp = ctx.freshName("cmp")
      val compare =
        if (longElems) s"java.lang.Long.compare($a.getLong($i), $b.getLong($j))"
        else s"$a.getUTF8String($i).compareTo($b.getUTF8String($j))"
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0; int $j = 0; int $c = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i)) { $i = $na; }
         |  else if ($b.isNullAt($j)) { $j = $nb; }
         |  else {
         |    int $cmp = $compare;
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}
