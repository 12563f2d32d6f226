package graft.operators

import graft.SparkSpec

/** The scale claim behind q231/q232, asserted on real corpora: the
  * calibrated eps keeps the grid join's candidate volume within
  * [[Similarity.DbscanCandBudget]] pairs per point at EVERY available
  * scale (sf0.001 → sf100 spans 20,000× in points), while the q225 hand
  * dial — correct where it was dialed — blows through the budget as the
  * corpus densifies. Candidate volumes here are EXACT (histogram algebra,
  * the same integers the oracle recomputes), not samples. */
class DbscanCalibrationSpec extends SparkSpec {

  private def dirs: Seq[String] =
    (Seq("0.001", "0.01", "0.1").map(sfDirAt)
      ++ Seq("data/sf1", "data/sf10", "data/sf100"))
      .filter(d => new java.io.File(d).isDirectory)

  private def calRows(d: String) =
    Similarity.dbscanCalibration(spark, d).collect()
      .map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getBoolean(4)))
      .toSeq // (epsq, cand_pairs, n_points, chosen)

  test("calibration recovers the hand dial at the driver SFs, tightens as corpora densify") {
    // the sf100 floor (5) is the third-decade catch: the original ladder
    // bottomed at 15, which carries 105.7 pairs/point there — over budget
    val expected = Map(
      sfDirAt("0.001") -> 240L, sfDirAt("0.01") -> 240L,
      sfDirAt("0.1") -> 240L, "data/sf1" -> 60L, "data/sf10" -> 15L,
      "data/sf100" -> 5L)
    assume(dirs.nonEmpty, "no testdata dirs")
    dirs.foreach { d =>
      val chosen = calRows(d).filter(_._4).map(_._1)
      assert(chosen == Seq(expected(d)),
        s"$d chose $chosen, expected ${expected(d)}")
    }
  }

  test("candidate pairs per point stay within the budget at every scale; the hand dial does not") {
    assume(dirs.nonEmpty, "no testdata dirs")
    dirs.foreach { d =>
      val rows = calRows(d)
      val (eps, cand, n, _) = rows.filter(_._4).head
      assert(cand <= Similarity.DbscanCandBudget * n,
        s"$d: chosen eps=$eps carries $cand pairs for $n points — over budget")
      // ladder monotonicity: candidate volume never decreases with eps
      val byEps = rows.sortBy(_._1).map(_._2)
      assert(byEps == byEps.sorted, s"$d: candidate volume not monotone in eps")
    }
    // the motivation, pinned on the densified corpora: the fixed 240 dial
    // exceeds the budget exactly where the second decade measured q225's
    // per-cell pair volume exploding
    Seq("data/sf1", "data/sf10", "data/sf100")
      .filter(d => new java.io.File(d).isDirectory)
      .foreach { d =>
        val rows = calRows(d)
        val hand = rows.find(_._1 == Similarity.DbscanEpsQ).get
        assert(hand._2 > Similarity.DbscanCandBudget * hand._3,
          s"$d: the hand dial is within budget — calibration unneeded here?")
      }
  }
}
