package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm-up: run every query once at the smallest SF. Generated code is
    // identical across SF dirs (only file paths differ), so this JIT-compiles
    // and janino-caches each plan's codegen classes for ~free; the timed run
    // below then measures data processing, not one-time compilation.
    val warmDir = "/root/testdata/sf0.001"
    if (new java.io.File(warmDir).isDirectory)
      SparkEntry.queries.foreach { case (_, fn) =>
        try { fn(spark, warmDir).count(); () } catch { case _: Throwable => }
      }
    // Per-query time = min of 2 runs: the host shows 3-5x run-to-run noise
    // (shared VM), and min-of-N is the standard estimator for the code's
    // actual cost under external interference. A query that throws reports
    // -1 (NOT its time-to-exception, which would read as a speedup).
    val results = SparkEntry.queries.map { case (name, fn) =>
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        try { fn(spark, sfDir).count(); (System.nanoTime() - t0) / 1e9 }
        catch { case _: Throwable => -1.0 }
      }
      name -> (if (times.contains(-1.0)) -1.0 else times.min)
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    // total sums only successful queries; a -1 failure marker must not
    // subtract from (i.e. "speed up") the aggregate
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
