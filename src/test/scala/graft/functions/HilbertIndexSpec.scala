package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class HilbertIndexSpec extends SparkSpec {
  import spark.implicits._

  private def hilbert(bits: Int) = {
    GraftFunctions.register(spark)
    (x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =>
      call_function("graft_hilbert", x, y, lit(bits))
  }

  /** JVM reference: classic xy2d with the full-grid reflection constant —
    * the exact walk the SQL oracle and the old unrolled Column tree use. */
  private def ref(n: Int, x0: Int, y0: Int): Long = {
    var (x, y, d) = (x0, y0, 0L)
    var s = n / 2
    while (s > 0) {
      val rx = if ((x & s) > 0) 1 else 0
      val ry = if ((y & s) > 0) 1 else 0
      d += s.toLong * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = n - 1 - x; y = n - 1 - y }
        val t = x; x = y; y = t
      }
      s /= 2
    }
    d
  }

  test("matches the JVM reference on the full 64x64 grid (bits=6)") {
    val cells = for (x <- 0 until 64; y <- 0 until 64) yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .select(col("x"), col("y"), hilbert(6)(col("x"), col("y")).as("d"))
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toMap
    cells.foreach { case (x, y) =>
      assert(got((x, y)) == ref(64, x.toInt, y.toInt), s"($x,$y)")
    }
    // the walk is a bijection onto [0, 4096)
    assert(got.values.toSeq.sorted == (0L until 4096L))
  }

  test("bits=10 spot grid matches the reference (the layout-family width)") {
    val cells = for (x <- 0 until 1024 by 37; y <- 0 until 1024 by 41)
      yield (x.toLong, y.toLong)
    val got = cells.toDF("x", "y")
      .select(hilbert(10)(col("x"), col("y")).as("d"))
      .collect().map(_.getLong(0))
    cells.zip(got).foreach { case ((x, y), d) =>
      assert(d == ref(1024, x.toInt, y.toInt), s"($x,$y)")
    }
  }

  test("interpreted eval equals codegen") {
    val e = HilbertIndex(
      org.apache.spark.sql.catalyst.expressions.Literal(513L),
      org.apache.spark.sql.catalyst.expressions.Literal(770L), 10)
    assert(e.eval(null) == ref(1024, 513, 770))
  }

  test("null in either child yields null; runs inside whole-stage codegen") {
    val r = Seq((Some(1L), Some(2L)), (None, Some(2L)), (Some(1L), None))
      .toDF("x", "y")
      .select(hilbert(10)(col("x"), col("y")).as("d")).collect()
    assert(r(0).getLong(0) == ref(1024, 1, 2))
    assert(r(1).isNullAt(0) && r(2).isNullAt(0))

    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(hilbert(10)(col("l_orderkey") % 1024, col("l_partkey") % 1024).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.linesIterator.exists(l => l.contains("graft_hilbert") && l.contains("*(")),
      plan.take(600))
    assert(df.agg(sum(col("d"))).head().getLong(0) > 0L)
  }
}
