package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextFns

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  test("graft_dot matches the higher-order-function fold bit-for-bit") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),
      (Seq(0.1, 0.2, 0.7, -0.3), Seq(-0.5, 0.25, 0.125, 2.0))
    ).toDF("a", "b")
    val got = df.select(
      TextFns.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
  }

  test("graft_l2norm matches sqrt-of-fold bit-for-bit") {
    val df = Seq(Seq(3.0, 4.0), Seq(0.1, -0.2, 0.3, 0.044)).toDF("a")
    val got = df.select(
      TextFns.norm(col("a")).as("native"),
      sqrt(aggregate(transform(col("a"), x => x * x),
        lit(0.0), (acc, x) => acc + x)).as("hof"))
      .collect()
    got.foreach { r =>
      assert(java.lang.Double.doubleToLongBits(r.getDouble(0)) ==
        java.lang.Double.doubleToLongBits(r.getDouble(1)))
    }
    assert(got(0).getDouble(0) == 5.0)
  }

  test("length mismatch yields null (zip_with null-padding semantics)") {
    val df = Seq((Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0))).toDF("a", "b")
    val r = df.select(
      TextFns.dot(col("a"), col("b")).as("native"),
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("hof")).collect()
    assert(r(0).isNullAt(0), "native must not truncate to the shorter array")
    assert(r(0).isNullAt(1))
  }

  test("null array yields null, not a crash") {
    val df = Seq((Some(Seq(1.0)), None: Option[Seq[Double]])).toDF("a", "b")
    val r = df.select(TextFns.dot(col("a"), col("b"))).collect()
    assert(r(0).isNullAt(0))
  }

  test("expressions appear inside whole-stage codegen") {
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("embedding").cast("array<double>").as("v"))
      .select(TextFns.dot(col("v"), col("v")).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    // the "*(n)" prefix marks operators inside a WholeStageCodegen stage
    assert(plan.linesIterator.exists(l => l.contains("graft_dot") && l.contains("*(")),
      plan.take(500))
    assert(df.head().getDouble(0) > 0.0)
  }
}
