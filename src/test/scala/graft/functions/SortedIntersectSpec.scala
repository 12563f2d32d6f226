package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.TextFns

class SortedIntersectSpec extends SparkSpec {
  import spark.implicits._

  private def count(a: Seq[String], b: Seq[String]): Int =
    Seq((a, b)).toDF("a", "b")
      .select(TextFns.sortedIntersectCount(col("a"), col("b")))
      .head().getInt(0)

  test("law: equals size(array_intersect) on sorted distinct arrays") {
    // 200 seeded random pairs, checked in ONE Spark job (both formulations
    // as columns over the same rows)
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "b", "c", "dd", "ee", "ff", "g1", "g2", "zz")
    def arr() = Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size)))
      .distinct.sorted
    val pairs = Seq.fill(200)((arr(), arr()))
    val rows = pairs.toDF("a", "b")
      .select(TextFns.sortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
  }

  test("edges: empty, disjoint, identical, subset") {
    assert(count(Nil, Seq("a")) == 0)
    assert(count(Seq("a", "b"), Seq("c", "d")) == 0)
    assert(count(Seq("a", "b", "c"), Seq("a", "b", "c")) == 3)
    assert(count(Seq("b", "c"), Seq("a", "b", "c", "d")) == 2)
  }

  test("null array yields null; null elements (sorting last) are ignored") {
    val r = Seq((null.asInstanceOf[Seq[String]], Seq("a")))
      .toDF("a", "b")
      .select(TextFns.sortedIntersectCount(col("a"), col("b")))
      .head()
    assert(r.isNullAt(0))
    val withNullElem = Seq((Seq("a", "b", null), Seq("a", null)))
      .toDF("a", "b")
      .select(TextFns.sortedIntersectCount(col("a"), col("b")))
      .head().getInt(0)
    assert(withNullElem == 1)
  }

  test("interpreted eval matches codegen") {
    // same expression evaluated via the interpreted path (eval on a literal
    // InternalRow) must agree with the whole-stage-codegen'd column above
    val e = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a", "c", "e"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("b", "c", "d", "e"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
    assert(e.eval(null) == 2)
    assert(count(Seq("a", "c", "e"), Seq("b", "c", "d", "e")) == 2)
  }

  test("q78's verify step planned with the native expression (no array materialization)") {
    val plan = graft.operators.Dedup.queries("q78_containment_dedup")(spark, sfDir)
      .queryExecution.executedPlan.toString
    assert(plan.contains("graft_sorted_intersect_count"),
      "q78 must verify containment via the merge-count expression")
    assert(!plan.contains("array_intersect"),
      "q78 must not materialize intersection arrays")
  }
}
