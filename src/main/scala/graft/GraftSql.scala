package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.unsafe.types.UTF8String

/** The pure-SQL surface of the catalog — the last inch a SQL-first user
  * reaches for: after [[register]], every testdata table is a temp view,
  * every `graft_*` scalar Expression is callable, and the engine's
  * operators are reachable as TABLE-VALUED functions in `FROM` position:
  *
  *   SELECT * FROM graft_q('q78_containment_dedup')        -- any catalog op
  *   SELECT * FROM asof_join('trades', 'quotes',           -- native as-of
  *                           'user_id', 'user_id', 'ts', 'ts')
  *
  * TVFs register through the session's `tableFunctionRegistry` — the same
  * analyzer hook Spark's own `range(...)` uses — so they resolve, optimize,
  * and plan exactly like built-in relations (the as-of TVF still hits
  * [[graft.plans.AsOfJoinStrategy]] and its merge-join physical operator;
  * `graft_q` plans are the identical DataFrame plans, so every plan-shape
  * guarantee the catalog carries holds under the SQL spelling too —
  * spec-pinned by `GraftSqlSpec` row equality). */
object GraftSql {

  /** Memoizes `graft_q` TVF frame construction per (session, query, dir) so
    * re-analysis never re-runs a construction-time side effect. */
  private val tvfMemo = SessionMemo.ofFrames()

  /** Views + scalar functions + TVFs, one call. `dir` is the scale-factor
    * directory the views and dir-defaulting TVFs read. */
  def register(spark: SparkSession, dir: String): Unit = {
    Tables.registerAll(spark, dir)
    functions.GraftFunctions.register(spark)
    registerTableFunctions(spark, dir)
  }

  private def strArg(args: Seq[Expression], i: Int, fn: String): String = {
    // Foldable-first: eval() on a non-foldable expression (a column
    // reference, say) would surface as an opaque analyzer exception — check
    // before evaluating so the user sees the intended contract instead.
    if (i >= args.length || !args(i).foldable)
      throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string LITERAL" +
          (if (i < args.length) s", got non-foldable ${args(i).sql}" else " (missing)"))
    args(i).eval() match {
      case s: UTF8String => s.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$fn: argument ${i + 1} must be a string literal, got $other")
    }
  }

  /** Registers the TVFs (idempotent — re-registration replaces, so a later
    * call rebinds the default dir). */
  def registerTableFunctions(spark: SparkSession, defaultDir: String): Unit = {
    val reg = spark.sessionState.tableFunctionRegistry
    def put(name: String, usage: String)(
        builder: Seq[Expression] => LogicalPlan): Unit =
      reg.registerFunction(FunctionIdentifier(name),
        new ExpressionInfo(getClass.getName, name, usage), builder)

    // graft_q('<query>'[, '<sf dir>']): any of the ~200 catalog operators
    // as a relation. The builder returns the operator's ANALYZED DataFrame
    // plan, so the SQL spelling shares plan shape (and the plan-shape
    // manifest) with the DataFrame path by construction.
    //
    // TVF builders run at SQL ANALYSIS time, and re-run whenever the plan
    // is re-analyzed (explain, view re-resolution). For most catalog
    // queries construction is pure plan-building; a few are eager at
    // construction (q175 writes the clustered table; memoized stages
    // checkpoint). Construction is therefore memoized per
    // (session, query, dir) — re-analysis returns the already-built frame,
    // so any construction-time side effect runs at most once per session.
    put("graft_q", "graft_q(query_name[, sf_dir])") { args =>
      val name = strArg(args, 0, "graft_q")
      val dir = if (args.length > 1) strArg(args, 1, "graft_q") else defaultDir
      val fn = SparkEntry.queries.getOrElse(name,
        throw new IllegalArgumentException(
          s"graft_q: unknown query '$name' (see SparkEntry.queries.keys)"))
      val sess = SparkSession.active
      tvfMemo.getOrCompute(sess, s"graft_q|$name|$dir")(fn(sess, dir))
        .queryExecution.analyzed
    }

    // asof_join('left', 'right', left_key, right_key, left_time, right_time):
    // the native backward as-of join over two registered views/tables.
    put("asof_join",
      "asof_join(left_table, right_table, left_key, right_key, left_time, right_time)") { args =>
      val sess = SparkSession.active
      val left = sess.table(strArg(args, 0, "asof_join"))
      val right = sess.table(strArg(args, 1, "asof_join"))
      plans.AsOfJoinPlan.asofJoin(left, right,
        strArg(args, 2, "asof_join"), strArg(args, 3, "asof_join"),
        strArg(args, 4, "asof_join"), strArg(args, 5, "asof_join"))
        .queryExecution.analyzed
    }
  }
}
