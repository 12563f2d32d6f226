package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RollingHashSpec extends SparkSpec {
  import spark.implicits._

  private def rh(k: Int) = {
    GraftFunctions.register(spark)
    (c: org.apache.spark.sql.Column) => call_function("graft_rolling_hash", c, lit(k))
  }

  /** Reference implementation: each window's polynomial computed directly. */
  private def direct(s: String, k: Int): Seq[Long] = {
    val b = s.getBytes("UTF-8")
    if (b.length < k) Seq.empty
    else (0 to b.length - k).map { i =>
      var h = 0L
      (0 until k).foreach(j => h = (h * RollingHash.Base + (b(i + j) & 0xff)) % RollingHash.Mod)
      h
    }
  }

  test("rolling pass equals the direct per-window polynomial") {
    val strs = Seq("abcdef", "key agg row scan slow fast table", "aaaaaaaaaa",
      "x", "", "abcabcabcabc")
    for (k <- Seq(3, 5, 16)) {
      val got = strs.toDF("s")
        .select(rh(k)(col("s")).as("h"))
        .collect().map(_.getSeq[Long](0).toSeq)
      strs.zip(got).foreach { case (s, g) =>
        assert(g == direct(s, k), s"k=$k s='$s'")
      }
    }
  }

  test("equal windows collide, different windows (almost surely) do not") {
    val hs = direct("abcabcX", 3)
    assert(hs(0) == hs(3), "identical 'abc' windows must hash equal")
    assert(hs.distinct.length >= 4, s"expected mostly-distinct hashes, got $hs")
  }

  test("short and empty strings yield an empty array; null yields null") {
    val r = Seq(Some("ab"), Some(""), None).toDF("s")
      .select(rh(3)(col("s")).as("h")).collect()
    assert(r(0).getSeq[Long](0).isEmpty)
    assert(r(1).getSeq[Long](0).isEmpty)
    assert(r(2).isNullAt(0))
  }

  test("expression runs inside whole-stage codegen") {
    val df = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(rh(16)(col("text")).as("h"))
      .select(size(col("h")).as("n"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("graft_rolling_hash") && l.contains("*(")),
      plan.take(600))
    assert(df.agg(sum(col("n"))).head().getLong(0) > 0L)
  }
}
