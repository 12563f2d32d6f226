package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Plan-shape and semantics checks for the relational catalog: the DuckDB
  * oracle proves values; these prove the PLANS are the ones that survive
  * scale — filters reach the parquet scan, projections prune the read
  * schema, small dimensions broadcast. */
class RelationalSpec extends SparkSpec {

  private def plan(name: String): String =
    Relational.queries(name)(spark, sfDir).queryExecution.executedPlan.toString

  test("q01: predicates are pushed to the parquet scan, columns pruned") {
    val p = plan("q01_filter_project")
    // (the toString truncates the filter list; assert on the visible prefix)
    assert(p.contains("PushedFilters: [IsNotNull"), p.take(800))
    assert(p.contains("LessThan(l_shipdate"), p.take(800))
    // projection pruning: the scan must not read all 16 lineitem columns
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_suppkey"),
      readSchema)
  }

  test("q03: small dimension join is a broadcast join") {
    assert(plan("q03_join_broadcast").contains("BroadcastHashJoin"))
  }

  test("q05: star-schema multi-join broadcasts nation and region") {
    val p = plan("q05_multi_join")
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2, p.take(1200))
  }

  test("q06/q07: semi and anti joins plan as such") {
    assert(plan("q06_semi_join").contains("LeftSemi"))
    assert(plan("q07_anti_join").contains("LeftAnti"))
  }

  test("q26: HLL sketch holds its 10% bound (approx_ok all true) and raw value within 5%") {
    // The query's output asserts the bound itself (approx_ok vs the oracle's
    // literal TRUE); here also bound the raw sketch value more tightly.
    val rows = Relational.queries("q26_approx_distinct")(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getBoolean(2), s"flag=${r.getString(0)} approx_ok=false")
    }
    val raw = graft.Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey")).as("approx"),
        countDistinct(col("l_partkey")).as("exact"))
      .collect()
    raw.foreach { r =>
      val approx = r.getLong(1).toDouble
      val exact = r.getLong(2).toDouble
      assert(math.abs(approx - exact) / exact < 0.05,
        s"flag=${r.getString(0)} approx=$approx exact=$exact")
    }
  }

  test("q25: session windows partition all events, ends = start-of-next gap") {
    val sess = Relational.queries("q25_session_window")(spark, sfDir)
    val total = sess.agg(sum(col("n_events"))).head().getLong(0)
    val nEvents = graft.Tables.load(spark, sfDir, "events").count()
    assert(total == nEvents, s"sessions must cover every event: $total vs $nEvents")
    // no two sessions of one user may overlap
    val overlapping = sess.as("a").join(sess.as("b"),
        col("a.user_id") === col("b.user_id") &&
          col("a.session_start") < col("b.session_start") &&
          col("b.session_start") < col("a.session_end"))
      .count()
    assert(overlapping == 0L)
  }
}
