package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: time one or more queries (warm, N reps) and optionally dump
  * the formatted physical plan. Usage:
  *   runMain graft.Explain <sfDir> <reps> [-p] <query names...>
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val reps = args(1).toInt
    val showPlan = args.contains("-p")
    val names = args.drop(2).filterNot(_ == "-p")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      if (showPlan) fn(spark, sfDir).explain("formatted")
      (1 to reps).foreach { r =>
        val t0 = System.nanoTime()
        val n = fn(spark, sfDir).count()
        println(f"TIME $name rep$r ${(System.nanoTime() - t0) / 1e9}%.2f s ($n rows)")
      }
    }
    spark.stop()
  }
}
