package graft
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Measured scaling-curve harness: times a query list at TWO scale-factor
  * dirs under the SAME protocol as [[Bench]] (warm-up pass at sf0.001 to
  * absorb codegen/JIT, then min-of-[[Bench.Runs]] with a different seeded
  * query order per pass so a contended window on this shared host lands on
  * different queries in different passes) and writes one JSON file with
  * per-query seconds at both SFs plus the time ratio. This is the
  * sf0.1 → sf1 evidence leg of SCALE.md: a decade of measured scaling for
  * the most expensive queries, same JVM, same session, same partitioning
  * config — only the data volume changes.
  *
  * Usage:
  *   SPARK_GRAFT_SF_A=/root/testdata/sf0.1 SPARK_GRAFT_SF_B=data/sf1 \
  *     sbt "runMain graft.ScaleCurve BENCH_sf1.json q78_containment_dedup ..."
  * With no query args, times the whole board.
  *
  * SPARK_GRAFT_SCALE_ISOLATED=1 runs each (query, dir) leg in a FRESH
  * SparkContext instead of one shared session — the [[Bench.isolatedFloors]]
  * discipline applied to the decade. Past sf10 this is not an option but a
  * requirement on one box: a shared session accumulates every query's
  * pinned memo blocks (localCheckpoint spill) in ONE block-manager dir for
  * the session's lifetime, and the sf100 attempt filled the disk mid-run
  * (36 GB of foreign blocks before the measured query even started).
  * Fresh contexts free each leg's blocks at stop, so peak disk is one
  * query's own footprint — which is also the honest per-query floor.
  */
object ScaleCurve {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("BENCH_sf1.json")
    val names =
      if (args.length > 1) args.drop(1).toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    val dirA = sys.env.getOrElse("SPARK_GRAFT_SF_A", "/root/testdata/sf0.1")
    val dirB = sys.env.getOrElse("SPARK_GRAFT_SF_B", "data/sf1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Spot decades at the largest corpora (sf100: minutes per query) can
    // drop to min-of-2/1 via SPARK_GRAFT_SCALE_RUNS; the artifact records
    // the protocol actually used, so a reader never has to guess.
    val runs = sys.env.get("SPARK_GRAFT_SCALE_RUNS").map(_.toInt)
      .getOrElse(Bench.Runs)
    // fail at config time, not with an opaque ts.min crash after the
    // (possibly hours-long) run loop silently did nothing
    require(runs >= 1, s"SPARK_GRAFT_SCALE_RUNS must be >= 1, got $runs")
    val isolated = sys.env.getOrElse("SPARK_GRAFT_SCALE_ISOLATED", "0") == "1"
    val warmDir = "/root/testdata/sf0.001"

    val samples = scala.collection.mutable.Map
      .empty[(String, String), Vector[Double]].withDefaultValue(Vector.empty)

    def timeIn(spark: SparkSession, name: String, dir: String): Double = {
      val t0 = System.nanoTime()
      try { SparkEntry.queries(name)(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
      catch { case e: Throwable =>
        System.err.println(s"[scale] $name@$dir failed: ${e.getMessage}"); -1.0 }
    }

    if (isolated) {
      // one fresh context per (query, dir, run): warm-up at sf0.001 inside
      // each context (codegen/JIT), ONE cold timed run, stop() frees the
      // blocks. A second run inside the same context would hit the session
      // memos (q41's signature memo turned 9.2 s into 0.2 s) — min across
      // COLD contexts measures the plan, not the cache.
      names.foreach { name =>
        Seq(dirA, dirB).foreach { dir =>
          (1 to runs).foreach { _ =>
            SparkSession.clearActiveSession()
            SparkSession.clearDefaultSession()
            val spark = GraftSession.local(cpus)
            spark.sparkContext.setLogLevel("WARN")
            GraftSession.muteExpectedWarnings()
            try {
              if (new java.io.File(warmDir).isDirectory)
                try { SparkEntry.queries(name)(spark, warmDir).count(); () }
                catch { case _: Throwable => }
              samples((name, dir)) = samples((name, dir)) :+ timeIn(spark, name, dir)
            } finally spark.stop()
          }
          System.err.println(s"[scale-done] $name@$dir " +
            samples((name, dir)).map(t => f"$t%.1f").mkString(","))
        }
      }
    } else {
      val spark = GraftSession.local(cpus)
      spark.sparkContext.setLogLevel("WARN")
      GraftSession.muteExpectedWarnings()
      if (new java.io.File(warmDir).isDirectory)
        names.foreach { n =>
          try { SparkEntry.queries(n)(spark, warmDir).count(); () }
          catch { case _: Throwable => }
        }
      (1 to runs).foreach { run =>
        Seq(dirA, dirB).foreach { dir =>
          new scala.util.Random(run).shuffle(names).foreach { name =>
            samples((name, dir)) = samples((name, dir)) :+ timeIn(spark, name, dir)
          }
        }
      }
      spark.stop()
    }

    def minOf(name: String, dir: String): Double = {
      val ts = samples((name, dir))
      if (ts.contains(-1.0)) -1.0 else ts.min
    }
    val rows = names.map { n =>
      val a = minOf(n, dirA); val b = minOf(n, dirB)
      val ratio = if (a > 0 && b > 0) b / a else -1.0
      f"""    "$n": {"sf_a_sec": $a%.4f, "sf_b_sec": $b%.4f, "ratio": $ratio%.3f}"""
    }.mkString(",\n")
    val proto = s"min-of-$runs, " +
      (if (isolated) "fresh SparkContext per (query, dir, run) — cold runs only"
       else "seeded shuffled order per pass, one shared session") +
      ", warm-up at sf0.001"
    val json =
      s"""{
         |  "metric": "scale_curve",
         |  "unit": "sec",
         |  "protocol": "$proto",
         |  "cpus": $cpus,
         |  "sf_a": "$dirA",
         |  "sf_b": "$dirB",
         |  "data_ratio": 10,
         |  "queries": {
         |$rows
         |  }
         |}
         |""".stripMargin
    Files.write(Paths.get(out), json.getBytes("UTF-8"))
    println(s"SCALE_CURVE_WRITTEN $out")
    println(json)
  }
}
