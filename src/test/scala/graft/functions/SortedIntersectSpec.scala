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

  test("long-element branch: law vs size(array_intersect), edges, null elems, " +
    "interpreted == codegen") {
    val rnd = new scala.util.Random(7)
    def arr() = Seq.fill(rnd.nextInt(12))(rnd.nextInt(20).toLong)
      .distinct.sorted
    val rows = Seq.fill(200)((arr(), arr())).toDF("a", "b")
      .select(TextFns.sortedIntersectCount(col("a"), col("b")).as("native"),
        size(array_intersect(col("a"), col("b"))).as("builtin"))
      .collect()
    rows.foreach(r => assert(r.getInt(0) == r.getInt(1), r.toString))
    def countL(a: Seq[Long], b: Seq[Long]): Int =
      Seq((a, b)).toDF("a", "b")
        .select(TextFns.sortedIntersectCount(col("a"), col("b")))
        .head().getInt(0)
    assert(countL(Nil, Seq(1L)) == 0)
    assert(countL(Seq(1L, 2L, 3L), Seq(1L, 2L, 3L)) == 3)
    assert(countL(Seq(2L, 3L), Seq(1L, 2L, 3L, 4L)) == 2)
    // numeric (not lexicographic) order: 10 > 9 must still match
    assert(countL(Seq(2L, 9L, 10L), Seq(9L, 10L, 11L)) == 2)
    val withNullElem = Seq((Seq[java.lang.Long](1L, 2L, null),
        Seq[java.lang.Long](2L, null)))
      .toDF("a", "b")
      .select(TextFns.sortedIntersectCount(col("a"), col("b")))
      .head().getInt(0)
    assert(withNullElem == 1)
    val e = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L, 3L, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(2L, 3L, 4L, 5L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)))
    assert(e.eval(null) == 2)
  }

  test("mismatched element types are a type-check failure, not a crash") {
    val e = SortedIntersectCount(
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq(1L), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.LongType)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(
        Seq("a"), org.apache.spark.sql.types.ArrayType(
          org.apache.spark.sql.types.StringType)))
    assert(e.checkInputDataTypes()
      .isInstanceOf[org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure])
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
