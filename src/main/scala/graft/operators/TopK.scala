package graft.operators

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** Bounded top-k as a typed `Aggregator`: each map-side partial keeps at
  * most k elements, so the shuffle carries k rows per partition per group
  * instead of the whole group — the scale-correct alternative to a global
  * `Window.orderBy` sort when only the top k survive. Ordering is total
  * (price desc, then orderkey, then linenumber) so results are deterministic
  * and oracle-checkable.
  */
case class LineRef(price: Double, okey: Long, lineno: Int)

class TopKLines(k: Int) extends Aggregator[LineRef, List[LineRef], Seq[LineRef]] {

  private val ord: Ordering[LineRef] =
    Ordering.by((r: LineRef) => (-r.price, r.okey, r.lineno))

  override def zero: List[LineRef] = Nil

  /** Insert keeping the buffer sorted and bounded at k. */
  override def reduce(buf: List[LineRef], a: LineRef): List[LineRef] = {
    val (before, after) = buf.span(ord.lt(_, a))
    (before ::: a :: after).take(k)
  }

  override def merge(b1: List[LineRef], b2: List[LineRef]): List[LineRef] = {
    val m = (b1 ++ b2).sorted(ord)
    m.take(k)
  }

  override def finish(buf: List[LineRef]): Seq[LineRef] = buf

  override def bufferEncoder: Encoder[List[LineRef]] =
    ExpressionEncoder[List[LineRef]]()
  override def outputEncoder: Encoder[Seq[LineRef]] =
    ExpressionEncoder[Seq[LineRef]]()
}
