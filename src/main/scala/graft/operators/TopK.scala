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

object LineRef {
  implicit val ordering: Ordering[LineRef] =
    Ordering.by((r: LineRef) => (-r.price, r.okey, r.lineno))
}

class TopKLines(k: Int) extends MinK[LineRef](k)

/** A (sort-key, id) pair for bounded per-group sampling — the hash key is
  * the sort order, the id breaks ties and identifies the row. */
case class HashedId(h: String, id: Long)

object HashedId {
  implicit val ordering: Ordering[HashedId] =
    Ordering.by((r: HashedId) => (r.h, r.id))
}

/** k smallest elements per group under `T`'s ordering, same bounded-partial
  * shape as [[TopKLines]]: map-side state never exceeds k rows, so a group
  * of any size shuffles at most k * partitions rows. One implementation
  * serves every element type (see [[MinKByHash]], [[MinKLongs]]). */
class MinK[T: Ordering : scala.reflect.runtime.universe.TypeTag](k: Int)
    extends Aggregator[T, List[T], Seq[T]] {

  private val ord = implicitly[Ordering[T]]

  override def zero: List[T] = Nil

  /** Insert keeping the buffer sorted and bounded at k. */
  override def reduce(buf: List[T], a: T): List[T] = {
    val (before, after) = buf.span(ord.lt(_, a))
    (before ::: a :: after).take(k)
  }

  override def merge(b1: List[T], b2: List[T]): List[T] =
    (b1 ++ b2).sorted(ord).take(k)

  override def finish(buf: List[T]): Seq[T] = buf

  override def bufferEncoder: Encoder[List[T]] = ExpressionEncoder[List[T]]()
  override def outputEncoder: Encoder[Seq[T]] = ExpressionEncoder[Seq[T]]()
}

/** k smallest (h, id) pairs per group — the deterministic-sample-per-stratum
  * primitive (vs a per-stratum row_number window, which sorts every stratum
  * in full). */
class MinKByHash(k: Int) extends MinK[HashedId](k)

/** A (priority, id) pair for bounded per-group selection under an integer
  * priority — weighted sampling (priority = hash div weight) and outlier
  * top-k (priority = negated distance) both reduce to "k smallest longs,
  * id tie-break". */
case class WeightedId(pri: Long, id: Long)

object WeightedId {
  implicit val ordering: Ordering[WeightedId] =
    Ordering.by((r: WeightedId) => (r.pri, r.id))
}

/** k smallest (pri, id) pairs per group: same bounded-partial shape as
  * [[MinKByHash]] — any group shuffles at most k * partitions rows. */
class MinKWeighted(k: Int) extends MinK[WeightedId](k)

/** k smallest longs per group (bounded posting list): caps the per-term
  * state of an inverted index so a stopword-grade mega-term costs k slots,
  * not a row holding every document id in the corpus. */
class MinKLongs(k: Int) extends MinK[Long](k)

/** A (priority, id, weight) triple for Duffield priority sampling: the
  * ordering NEGATES the double priority so [[MinK]]'s k-smallest machinery
  * keeps the k LARGEST priorities, id tie-break. The ordering is TOTAL
  * over all three fields — (pri, id) ties cannot occur on real input (one
  * row per doc id), but a total order is what makes the merge laws
  * unconditional (MaxKPriorityLawsSpec exercises adversarial ties). Same
  * bounded-partial contract: any stratum's map-side state is k slots. */
case class PriorityDoc(pri: Double, id: Long, w: Long)

object PriorityDoc {
  implicit val ordering: Ordering[PriorityDoc] =
    Ordering.by((r: PriorityDoc) => (-r.pri, r.id, r.w))
}

/** k largest-priority (pri, id, w) triples per group. */
class MaxKPriority(k: Int) extends MinK[PriorityDoc](k)
