package graft
import java.nio.file.{Files, Paths}

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
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.muteExpectedWarnings()

    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      names.foreach { n =>
        try { SparkEntry.queries(n)(spark, warmDir).count(); () }
        catch { case _: Throwable => }
      }

    val samples = scala.collection.mutable.Map
      .empty[(String, String), Vector[Double]].withDefaultValue(Vector.empty)
    (1 to Bench.Runs).foreach { run =>
      Seq(dirA, dirB).foreach { dir =>
        new scala.util.Random(run).shuffle(names).foreach { name =>
          val t0 = System.nanoTime()
          val t =
            try { SparkEntry.queries(name)(spark, dir).count(); (System.nanoTime() - t0) / 1e9 }
            catch { case e: Throwable =>
              System.err.println(s"[scale] $name@$dir failed: ${e.getMessage}"); -1.0 }
          samples((name, dir)) = samples((name, dir)) :+ t
        }
      }
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
    val json =
      s"""{
         |  "metric": "scale_curve",
         |  "unit": "sec",
         |  "protocol": "min-of-${Bench.Runs}, seeded shuffled order per pass, warm-up at sf0.001",
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
    spark.stop()
  }
}
