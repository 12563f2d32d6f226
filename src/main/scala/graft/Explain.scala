package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time one or more queries (warm, N reps) and optionally dump
  * the formatted physical plan — to stdout (`-p`) or one file per query
  * (`-o <dir>`, written as `<dir>/<name>.txt`). Usage:
  *   runMain graft.Explain <sfDir> <reps> [-p] [-o <dir>] <query names...>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val showPlan = args.contains("-p")
    val outDir = args.sliding(2).collectFirst {
      case Array("-o", d) => d
    }
    val names = args.drop(2).filterNot(_ == "-p")
      .filterNot(a => a == "-o" || outDir.contains(a))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (showPlan) fn(spark, sfDir).explain("formatted")
      outDir.foreach { dir =>
        val planStr = fn(spark, sfDir).queryExecution
          .explainString(org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.createDirectories(java.nio.file.Paths.get(dir))
        java.nio.file.Files.write(
          java.nio.file.Paths.get(dir, s"$name.txt"),
          planStr.getBytes("UTF-8"))
        println(s"PLAN $name -> $dir/$name.txt")
      }
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"TIME $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
