package graft

import java.nio.file.{Files, Paths}

/** Evidence harness for the graph family's cross-session amortization
  * (`Graph.writeBucketedEdges`): in ONE JVM, time q201 three ways against
  * the same dir —
  *
  *   1. `cold_sec`      — a fresh session pays the orders⋈lineitem edge
  *                        build plus the fixpoint (today's per-session cost);
  *   2. `write_sec`     — the one-time bucketed-table publish;
  *   3. `bucketed_sec`  — a NEW session (fresh memo, shared catalog) opts
  *                        in and runs the same query reading the bucketed
  *                        table: src-keyed joins/aggs start exchange-free
  *                        and the join cost is gone.
  *
  * The three legs run in the same JVM on purpose: same JIT state, same
  * page cache, so the delta isolates the PLAN difference, not process
  * warm-up (the honest cold floors live in BENCH_sf*.json; this artifact
  * answers "what does the second session save", which is a same-process
  * question on a notebook server and a same-metastore question on a
  * cluster). Results are asserted bit-equal across legs before timing is
  * trusted.
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.BucketCurve out.json data/sf10"
  */
object BucketCurve {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("BENCH_bucketed.json")
    val dir = if (args.length > 1) args(1) else "data/sf10"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val q = "q201_bipartite_pagerank"

    val root = GraftSession.local(cpus)
    root.sparkContext.setLogLevel("WARN")
    // absorb codegen/JIT so leg 1 is not paying first-query compilation
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      try { SparkEntry.queries(q)(root.newSession(), warmDir).count(); () }
      catch { case _: Throwable => }

    def timed[T](f: => T): (T, Double) = {
      val t0 = System.nanoTime()
      val v = f
      (v, (System.nanoTime() - t0) / 1e9)
    }
    def rows(s: org.apache.spark.sql.SparkSession): (Seq[String], Double) = {
      val (df, t) = timed(SparkEntry.queries(q)(s, dir))
      val (r, t2) = timed(df.collect().map(_.toString).sorted.toSeq)
      (r, t + t2)
    }

    val (coldRows, coldSec) = rows(root.newSession())
    val (table, writeSec) =
      timed(graft.operators.Graph.writeBucketedEdges(root, dir))
    val reader = root.newSession()
    reader.conf.set(graft.operators.Graph.BucketedEdgesConf, "true")
    val (bucketRows, bucketSec) = rows(reader)
    val ok = coldRows == bucketRows
    root.sql(s"DROP TABLE IF EXISTS $table")

    val json =
      f"""{"metric":"bucketed_edges","query":"$q","dir":"$dir","cpus":$cpus,
         |"cold_sec":$coldSec%.4f,"write_sec":$writeSec%.4f,
         |"bucketed_sec":$bucketSec%.4f,"rows_match":$ok,
         |"note":"same-JVM legs: the delta isolates the plan difference (edge build paid once at write time; bucketed scan starts src-partitioned)"}"""
        .stripMargin.replaceAll("\n", "")
    Files.write(Paths.get(out), json.getBytes("UTF-8"))
    println(json)
    require(ok, "bucketed-table q201 diverged from the cold build")
    root.stop()
  }
}
