package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Merge laws for the Duffield priority-sampling aggregator ([[MaxKPriority]]
  * via [[MinK]] under the negated-priority ordering): any partition split
  * must yield the same k-largest set as a sequential fold — the property
  * that makes the bounded map-side partials safe at any parallelism. */
class MaxKPriorityLawsSpec extends Properties("MaxKPriority") {

  private val k = 5
  private val agg = new MaxKPriority(k)

  private val rows: Gen[List[PriorityDoc]] = Gen.listOf(for {
    pri <- Gen.chooseNum(0.0, 1e6)
    id <- Gen.chooseNum(0L, 50L)
    w <- Gen.chooseNum(1L, 1000L)
  } yield PriorityDoc(pri, id, w))

  private def fold(xs: List[PriorityDoc]) = xs.foldLeft(agg.zero)(agg.reduce)

  property("zero is identity for merge") = Prop.forAll(rows) { xs =>
    val b = fold(xs)
    agg.merge(b, agg.zero) == b && agg.merge(agg.zero, b) == b
  }

  property("merge is commutative") = Prop.forAll(rows, rows) { (x, y) =>
    agg.merge(fold(x), fold(y)) == agg.merge(fold(y), fold(x))
  }

  property("merge is associative") = Prop.forAll(rows, rows, rows) { (x, y, z) =>
    val (bx, by, bz) = (fold(x), fold(y), fold(z))
    agg.merge(agg.merge(bx, by), bz) == agg.merge(bx, agg.merge(by, bz))
  }

  property("any partition split = sequential fold = sorted take k") =
    Prop.forAll(rows, Gen.chooseNum(0, 100)) { (xs, cut) =>
      val cutAt = if (xs.isEmpty) 0 else cut % (xs.size + 1)
      val (l, r) = xs.splitAt(cutAt)
      val merged = agg.finish(agg.merge(fold(l), fold(r)))
      val direct = agg.finish(fold(xs))
      val reference = xs.sorted(PriorityDoc.ordering).take(k)
      merged == direct && direct == reference
    }

  property("buffer never exceeds k entries") = Prop.forAll(rows) { xs =>
    fold(xs).size <= k
  }
}
