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

/** A (sort-key, id) pair for bounded per-group sampling — the hash key is
  * the sort order, the id breaks ties and identifies the row. */
case class HashedId(h: String, id: Long)

/** k smallest (h, id) pairs per group, same bounded-partial shape as
  * [[TopKLines]]: map-side state never exceeds k rows, so a stratum of any
  * size shuffles at most k * partitions rows — the scale-correct form of
  * "deterministic sample of k per stratum" (vs a per-stratum row_number
  * window, which sorts every stratum in full). */
class MinKByHash(k: Int) extends Aggregator[HashedId, List[HashedId], Seq[HashedId]] {

  private val ord: Ordering[HashedId] = Ordering.by((r: HashedId) => (r.h, r.id))

  override def zero: List[HashedId] = Nil

  override def reduce(buf: List[HashedId], a: HashedId): List[HashedId] = {
    val (before, after) = buf.span(ord.lt(_, a))
    (before ::: a :: after).take(k)
  }

  override def merge(b1: List[HashedId], b2: List[HashedId]): List[HashedId] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(buf: List[HashedId]): Seq[HashedId] = buf

  override def bufferEncoder: Encoder[List[HashedId]] =
    ExpressionEncoder[List[HashedId]]()
  override def outputEncoder: Encoder[Seq[HashedId]] =
    ExpressionEncoder[Seq[HashedId]]()
}

/** k smallest longs per group (bounded posting list): caps the per-term
  * state of an inverted index so a stopword-grade mega-term costs k slots,
  * not a row holding every document id in the corpus. */
class MinKLongs(k: Int) extends Aggregator[Long, List[Long], Seq[Long]] {

  override def zero: List[Long] = Nil

  override def reduce(buf: List[Long], a: Long): List[Long] = {
    val (before, after) = buf.span(_ < a)
    (before ::: a :: after).take(k)
  }

  override def merge(b1: List[Long], b2: List[Long]): List[Long] =
    (b1 ++ b2).sorted.take(k)

  override def finish(buf: List[Long]): Seq[Long] = buf

  override def bufferEncoder: Encoder[List[Long]] =
    ExpressionEncoder[List[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] =
    ExpressionEncoder[Seq[Long]]()
}
