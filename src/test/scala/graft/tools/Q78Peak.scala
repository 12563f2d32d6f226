package graft

/** Dev diagnostic (test scope — not part of the shipped engine): one
  * COLD q78 run against a dir with the containment verify shard count
  * forced, so the sharded-verify scratch claim can be A/B-profiled
  * (pair with a timestamped `df` sampler on the side).
  * Usage: sbt "Test/runMain graft.Q78Peak data/sf100 4"
  */
object Q78Peak {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf100")
    val shards = if (args.length > 1) args(1) else "0"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    if (shards != "0")
      spark.conf.set(graft.operators.Dedup.VerifyShardsConf, shards)
    val t0 = System.nanoTime()
    val n = SparkEntry.queries("q78_containment_dedup")(spark, dir).count()
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"Q78PEAK dir=$dir shards=$shards rows=$n sec=$sec%.1f")
    spark.stop()
  }
}
