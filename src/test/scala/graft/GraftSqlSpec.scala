package graft

import org.apache.spark.sql.functions._

/** The SQL surface must be the SAME engine, not a parallel one: every TVF
  * spelling returns row-identical results to its DataFrame path, and the
  * native as-of TVF still plans the custom merge-join operator. */
class GraftSqlSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case null => "∅"
      case x => x
    }).map(_.toSeq).sortBy(_.mkString("|")).toSeq

  test("graft_q TVF returns row-identical results to the DataFrame path") {
    GraftSql.register(spark, sfDir)
    // seven operators across the families: join, agg, dedup, ANN, layout,
    // graph fixpoint, clustering
    Seq("q03_join_broadcast", "q02_agg_groupby", "q78_containment_dedup",
      "q117_ivf_pq", "q189_hilbert_layout", "q201_bipartite_pagerank",
      "q203_kmeans_lloyd").foreach { name =>
      val viaSql = rows(spark.sql(s"SELECT * FROM graft_q('$name')"))
      val viaDf = rows(SparkEntry.queries(name)(spark, sfDir))
      assert(viaSql == viaDf, s"$name: SQL and DataFrame paths diverge")
    }
  }

  test("SQL over the registered views composes with graft scalar functions") {
    GraftSql.register(spark, sfDir)
    val viaSql = rows(spark.sql(
      """SELECT l_returnflag, COUNT(1) AS n,
           SUM(graft_hilbert(l_orderkey % 1024, l_partkey % 1024, 10)) AS hsum
         FROM lineitem GROUP BY l_returnflag"""))
    val viaDf = rows(Tables.load(spark, sfDir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(call_function("graft_hilbert",
          col("l_orderkey") % 1024, col("l_partkey") % 1024, lit(10)))
          .as("hsum")))
    assert(viaSql == viaDf)
  }

  test("asof_join TVF equals the DataFrame asofJoin and plans the native operator") {
    GraftSql.register(spark, sfDir)
    spark.sql(
      """CREATE OR REPLACE TEMP VIEW asof_cal AS
         SELECT user_id AS cal_user, ts AS cal_ts, MAX(value) AS cal_value
         FROM events WHERE value > 190 GROUP BY user_id, ts""")
    val sqlDf = spark.sql(
      """SELECT * FROM asof_join('events', 'asof_cal',
                                 'user_id', 'cal_user', 'ts', 'cal_ts')""")
    // the SQL spelling must still hit the custom physical operator
    assert(sqlDf.queryExecution.executedPlan.toString.contains("AsOfJoin"),
      sqlDf.queryExecution.executedPlan.toString.take(500))
    val dfDf = plans.AsOfJoinPlan.asofJoin(
      Tables.load(spark, sfDir, "events"),
      spark.table("asof_cal"),
      "user_id", "cal_user", "ts", "cal_ts")
    assert(rows(sqlDf) == rows(dfDf))
    assert(sqlDf.count() == Tables.load(spark, sfDir, "events").count())
  }

  test("unknown query name fails analysis with a catalog hint") {
    GraftSql.register(spark, sfDir)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_q('q999_nope')").collect())
    assert(e.getMessage.contains("q999_nope"))
  }
}
