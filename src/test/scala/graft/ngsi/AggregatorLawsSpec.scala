package graft.ngsi

import org.scalacheck.{Gen, Prop, Properties}

/** Property tests for the Example4-equivalent typed Aggregator
  * (`Example4.scala:39-49` semantics): merge must be associative and
  * commutative with zero as identity — the laws Spark's partial+final
  * aggregation relies on when combining map-side partials in any order. */
object AggregatorLawsSpec extends Properties("AverageAggregate") {

  private val agg = AverageAggregate
  private val temps = Gen.listOf(Gen.chooseNum(-50.0f, 60.0f))

  private def fold(xs: List[Float]) = xs.foldLeft(agg.zero)(agg.reduce)

  property("zero is identity for merge") = Prop.forAll(temps) { xs =>
    val b = fold(xs)
    agg.merge(b, agg.zero) == b && agg.merge(agg.zero, b) == b
  }

  property("merge is commutative") = Prop.forAll(temps, temps) { (x, y) =>
    agg.merge(fold(x), fold(y)) == agg.merge(fold(y), fold(x))
  }

  property("merge is associative") = Prop.forAll(temps, temps, temps) { (x, y, z) =>
    val (bx, by, bz) = (fold(x), fold(y), fold(z))
    agg.merge(agg.merge(bx, by), bz) == agg.merge(bx, agg.merge(by, bz))
  }

  property("any partition split = sequential fold") =
    Prop.forAll(temps, Gen.chooseNum(0, 100)) { (xs, cut) =>
      xs.isEmpty || {
        val k = cut % (xs.size + 1)
        val (l, r) = xs.splitAt(k)
        val merged = agg.finish(agg.merge(fold(l), fold(r)))
        val direct = agg.finish(fold(xs))
        math.abs(merged - direct) <= 1e-3f
      }
    }

  property("finish divides sum by count; empty window is NaN") = Prop {
    agg.finish((30.0, 3L)) == 10.0f && agg.finish(agg.zero).isNaN
  }
}
