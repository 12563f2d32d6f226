package graft

import org.apache.spark.sql.functions._

import graft.PlanCheck.shuffles
import graft.Pinned._

/** The layout contract of the partitioning-preserving pin
  * (`PinOps.pinSerKeyed` / `GraftPinBridge`): Spark's own checkpoint
  * path drops the hash layout a memo just paid a shuffle for (pinned as
  * UnknownPartitioning — the first test DOCUMENTS the stock behavior
  * this bridge exists to fix), the keyed pin provably keeps it
  * (key-aligned aggregation over the pinned frame plans with zero
  * exchanges), and an UNPROVABLE layout claim degrades to a plain pin
  * with identical results — never a wrong layout. */
class PinnedLayoutSpec extends SparkSpec {

  private def src = spark.range(1000).toDF("id")
    .withColumn("k", col("id") % 7)
    .repartition(4, col("k"))
    .select(col("k"), col("id"))

  test("stock pin drops the layout (the documented Spark 4.1 behavior)") {
    val pinned = src.pinSer(false)
    val lr = pinned.queryExecution.optimizedPlan
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    assert(lr.outputPartitioning.toString.startsWith("UnknownPartitioning"),
      s"Spark now preserves pin layout (${lr.outputPartitioning}) — " +
        "the bridge may be retired")
    val agg = src.pinSer(false).groupBy(col("k")).count()
    agg.collect()
    assert(shuffles(agg) == 1, "layout-less pin should re-shuffle")
  }

  test("keyed pin keeps the layout: key-aligned agg and join plan with " +
    "zero exchanges on the pinned side, same results") {
    val pinned = src.pinSerKeyed(false, "k")
    val agg = pinned.groupBy(col("k")).agg(sum(col("id")).as("s"))
    val expected = src.groupBy(col("k")).agg(sum(col("id")).as("s"))
      .collect().map(_.toString).sorted.toSeq
    val got = agg.collect().map(_.toString).sorted.toSeq
    assert(got == expected)
    assert(shuffles(agg) == 0,
      "key-aligned agg over the keyed pin still shuffled")
    // superset grouping rides the subset layout too
    val agg2 = pinned.groupBy(col("k"), col("id")).count()
    agg2.collect()
    assert(shuffles(agg2) == 0)
  }

  test("reliable mode keeps the layout through a real checkpoint too") {
    spark.conf.set(Pinned.ModeConf, "reliable")
    try {
      val pinned = src.pinSerKeyed(true, "k")
      val agg = pinned.groupBy(col("k")).agg(sum(col("id")).as("s"))
      val expected = src.groupBy(col("k")).agg(sum(col("id")).as("s"))
        .collect().map(_.toString).sorted.toSeq
      assert(agg.collect().map(_.toString).sorted.toSeq == expected)
      assert(shuffles(agg) == 0,
        "key-aligned agg over a reliable keyed pin still shuffled")
    } finally spark.conf.unset(Pinned.ModeConf)
  }

  test("an unprovable layout claim degrades to a plain pin — results " +
    "right, no layout invented") {
    // no repartition in the lineage: the claim must be refused. (Stock
    // Spark may still record the scan's own layout — rangepartitioning
    // on id for a non-adaptive range plan — which is fine: the assert is
    // that no HASH layout on k was INVENTED.)
    val plain = spark.range(100).toDF("id").withColumn("k", col("id") % 3)
      .pinSerKeyed(false, "k")
    val lr = plain.queryExecution.optimizedPlan
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    assert(!lr.outputPartitioning.toString.contains("hashpartitioning(k"),
      s"bridge claimed ${lr.outputPartitioning} without a proving lineage")
    // key recomputed between repartition and pin: exprId changes, refuse
    val reKeyed = spark.range(100).toDF("id")
      .withColumn("k", col("id") % 3)
      .repartition(4, col("k"))
      .withColumn("k", col("k") + 0) // new exprId for k
      .pinSerKeyed(false, "k")
    val lr2 = reKeyed.queryExecution.optimizedPlan
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    assert(!lr2.outputPartitioning.toString.contains("hashpartitioning(k"),
      s"bridge claimed ${lr2.outputPartitioning} through a key-rewriting " +
        "projection")
    assert(plain.count() == 100 && reKeyed.count() == 100)
  }

  test("multi-key pin: same-order keys keep the layout, a PERMUTED key " +
    "request degrades to a plain pin (hash is order-sensitive)") {
    val two = spark.range(1000).toDF("id")
      .withColumn("a", col("id") % 7)
      .withColumn("b", col("id") % 11)
      .repartition(4, col("a"), col("b"))
      .select(col("a"), col("b"), col("id"))
    // exact order: layout provable, key-aligned agg plans exchange-free
    val kept = two.pinSerKeyed(false, "a", "b")
    val agg = kept.groupBy(col("a"), col("b")).agg(sum(col("id")).as("s"))
    val expected = two.groupBy(col("a"), col("b"))
      .agg(sum(col("id")).as("s")).collect().map(_.toString).sorted.toSeq
    assert(agg.collect().map(_.toString).sorted.toSeq == expected)
    assert(shuffles(agg) == 0,
      "same-order multi-key pin still shuffled a key-aligned agg")
    // permuted order: HashPartitioning(b, a) hashes differently from the
    // physical repartition(a, b) placement — the bridge must refuse the
    // claim rather than let a downstream join skip a required exchange
    val permuted = two.pinSerKeyed(false, "b", "a")
    val lrP = permuted.queryExecution.optimizedPlan
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    assert(!lrP.outputPartitioning.toString.contains("hashpartitioning"),
      s"bridge claimed ${lrP.outputPartitioning} for permuted keys — " +
        "an untrue layout (murmur3 over a different expression order)")
    val aggP = permuted.groupBy(col("a"), col("b"))
      .agg(sum(col("id")).as("s"))
    assert(aggP.collect().map(_.toString).sorted.toSeq == expected)
    assert(shuffles(aggP) == 1, "permuted pin must re-shuffle (plain pin)")
  }

  test("duplicated repartition expressions never match a shorter key " +
    "request (multiplicity-exact check)") {
    val dup = spark.range(100).toDF("id")
      .withColumn("k", col("id") % 3)
      .repartition(4, col("k"), col("k"))
      .pinSerKeyed(false, "k")
    val lr = dup.queryExecution.optimizedPlan
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    assert(!lr.outputPartitioning.toString.contains("hashpartitioning"),
      s"bridge claimed ${lr.outputPartitioning} for repartition(k, k) " +
        "against keys=[k] — hash over (k) differs from hash over (k, k)")
    assert(dup.count() == 100)
  }

  test("duplicate output NAMES remap positionally, not by last-name-wins") {
    // select(k, id AS k): two output columns both named "k". The layout
    // was established on the FIRST (the real key); a by-name remap onto
    // the pinned output would attach the partitioning to the LAST — a
    // false claim over the id-valued column.
    val dupNames = spark.range(1000).toDF("id")
      .withColumn("k", col("id") % 7)
      .repartition(4, col("k"))
      .select(col("k"), col("id").as("k"))
    val pinned = dupNames.pinSerKeyed(false, "k")
    val lr = pinned.queryExecution.optimizedPlan
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD]
    lr.outputPartitioning match {
      case hp: org.apache.spark.sql.catalyst.plans.physical.HashPartitioning =>
        val claimed = hp.expressions.collect {
          case a: org.apache.spark.sql.catalyst.expressions.AttributeReference =>
            a.exprId
        }
        assert(claimed == Seq(lr.output.head.exprId),
          s"layout attached to ${hp.expressions} but the repartition key " +
            s"is positionally output(0)=${lr.output.head}")
      case other => fail(s"expected a kept HashPartitioning, got $other")
    }
    assert(pinned.count() == 1000)
  }
}
