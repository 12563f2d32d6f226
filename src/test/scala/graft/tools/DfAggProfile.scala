package graft

import org.apache.spark.sql.functions._

/** Dev diagnostic (test scope): isolate the cost of q78's ONE remaining
  * corpus-scale shuffle — the df aggregate feeding the rarity gate
  * (`Dedup.containmentFromDigests`'s `ex.groupBy(h).count`) — so the
  * round-15 decision "fold the block-key join into that shuffle with a
  * bounded posting-list aggregator" is measured, not guessed (VERDICT
  * r14 Next #6: build only if the profile shows >= 10 s at sf100).
  *
  * Protocol: build + materialize the digest memo first (its cost is
  * shared by every consumer and NOT attributable to the df agg), then
  * time the exploded-postings aggregate + heavy-set reduction alone.
  * Usage: sbt "Test/runMain graft.DfAggProfile data/sf100"
  */
object DfAggProfile {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("data/sf100")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.local(cpus)
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.{Dedup, TextFns}

    // the exact q78 digest-memo input (Dedup.scala q78 entry): trigram
    // shingles off the raw documents scan, cpu-spread by doc_id
    val docs = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), col("text"))
      .filter(size(TextFns.toks(col("text"))) >= 3)
      .repartition(TextFns.cpuPartitions, col("doc_id"))
      .select(col("doc_id"),
        TextFns.shingles(TextFns.toks(col("text")), 3).as("sh"))
    val t0 = System.nanoTime()
    val memo = Dedup.containmentDigests(docs)
    val nDocs = memo.count() // materializes the pin
    val tMemo = (System.nanoTime() - t0) / 1e9

    val ex = memo.select(col("doc_id"), size(col("sh")).as("n"),
      explode(col("sh")).as("h"))
    val t1 = System.nanoTime()
    val heavy = ex.groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > Dedup.ContainmentDfCap).count()
    val tDfAgg = (System.nanoTime() - t1) / 1e9
    println(f"""DFAGG {"dir":"$dir","docs":$nDocs,"heavy_digests":$heavy,"memo_sec":$tMemo%.1f,"df_agg_sec":$tDfAgg%.1f}""")
    spark.stop()
  }
}
