package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time a subset of SparkEntry.queries (same harness shape as
  * [[Bench]] — warm-up at sf0.001, then min-of-3 at the target SF) without
  * paying for the whole board. Usage:
  *   sbt "runMain graft.TimeQ q78_containment_dedup q70_curation_pipeline"
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      if (new java.io.File(warmDir).isDirectory)
        try { SparkEntry.queries(n)(spark, warmDir).count(); () }
        catch { case _: Throwable => }
      val times = (1 to Bench.Runs).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMEQ $n%-28s min=${times.min}%7.3f  runs=${times.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
