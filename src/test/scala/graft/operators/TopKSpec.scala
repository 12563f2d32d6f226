package graft.operators

import org.scalacheck.{Gen, Prop, Properties}

/** Aggregator-law property tests for the bounded top-k: any split of the
  * input into partial buffers, reduced then merged in any grouping, must
  * equal the top-k of a full sort — exactly what Spark's partial+final
  * aggregation assumes when it combines map-side partials. */
object TopKSpec extends Properties("TopKLines") {

  private val agg = new TopKLines(3)
  private val ord: Ordering[LineRef] =
    Ordering.by((r: LineRef) => (-r.price, r.okey, r.lineno))

  private val refGen = for {
    p <- Gen.chooseNum(0.0, 1000.0)
    o <- Gen.chooseNum(0L, 50L)
    l <- Gen.chooseNum(0, 7)
  } yield LineRef(math.rint(p) / 2, o, l) // coarse prices -> frequent ties

  private val refs = Gen.listOf(refGen)

  private def fold(xs: List[LineRef]) = xs.foldLeft(agg.zero)(agg.reduce)

  property("reduce+merge over arbitrary splits == top-k of full sort") =
    Prop.forAll(refs, Gen.chooseNum(1, 5)) { (xs, nSplits) =>
      val expected = xs.sorted(ord).take(3)
      val chunks = if (xs.isEmpty) Seq(List.empty[LineRef])
        else xs.grouped(math.max(1, xs.length / nSplits)).toSeq
      val merged = chunks.map(fold).foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == expected
    }

  property("merge is associative on bounded buffers") =
    Prop.forAll(Gen.listOfN(4, refGen), Gen.listOfN(4, refGen), Gen.listOfN(4, refGen)) {
      (a, b, c) =>
        agg.merge(agg.merge(fold(a), fold(b)), fold(c)) ==
          agg.merge(fold(a), agg.merge(fold(b), fold(c)))
    }

  property("zero is identity") = Prop.forAll(refs) { xs =>
    val b = fold(xs)
    agg.merge(b, agg.zero) == b && agg.merge(agg.zero, b) == b
  }
}

/** Same laws for the (priority, id) variant behind weighted sampling (q84)
  * and centroid outliers (q87) — narrow priority range forces frequent
  * ties so the id tie-break is actually exercised. */
object MinKWeightedSpec extends Properties("MinKWeighted") {

  private val agg = new MinKWeighted(3)

  private val wGen = for {
    p <- Gen.chooseNum(0L, 20L)
    i <- Gen.chooseNum(0L, 100L)
  } yield WeightedId(p, i)

  private val ws = Gen.listOf(wGen)

  private def fold(xs: List[WeightedId]) = xs.foldLeft(agg.zero)(agg.reduce)

  property("reduce+merge over arbitrary splits == 3 smallest of full sort") =
    Prop.forAll(ws, Gen.chooseNum(1, 5)) { (xs, nSplits) =>
      val expected = xs.sorted.take(3)
      val chunks = if (xs.isEmpty) Seq(List.empty[WeightedId])
        else xs.grouped(math.max(1, xs.length / nSplits)).toSeq
      val merged = chunks.map(fold).foldLeft(agg.zero)(agg.merge)
      agg.finish(merged) == expected
    }

  property("buffer never exceeds k") = Prop.forAll(ws) { xs =>
    fold(xs).lengthCompare(3) <= 0
  }
}
