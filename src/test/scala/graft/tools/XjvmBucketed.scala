package graft.operators

import org.apache.spark.sql.functions._

/** One leg of the CROSS-JVM bucketed-table proof (test scope — driven by
  * `GraphBucketedXjvmSpec`, which forks this main twice as separate java
  * processes sharing a Derby-backed Hive metastore): `write` publishes
  * the dir's bucketed edge table from one driver JVM; `read` — a
  * different JVM, after the first exited — must resolve the table
  * through the PERSISTENT catalog, see its HashPartitioning(src) layout
  * (zero-exchange src-keyed aggregation), and produce a pagerank
  * fixpoint bit-equal to a cold in-JVM edge build. This is the
  * within-JVM `GraphBucketedSpec` contract carried across the process
  * boundary — the deployment shape (HMS/Glue on a real cluster) the
  * round-14 caveat said the sandbox couldn't prove.
  */
object XjvmBucketed {

  import graft.PlanCheck.{isCatalogRead, shuffles}

  def main(args: Array[String]): Unit = {
    val Array(mode, sfDir, warehouse, metastore) = args.take(4)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-xjvm-$mode")
      .config("spark.sql.warehouse.dir", warehouse)
      .config("javax.jdo.option.ConnectionURL",
        s"jdbc:derby:;databaseName=$metastore;create=true")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .enableHiveSupport()
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)
    try {
      mode match {
        case "write" =>
          val t = Graph.writeBucketedEdges(spark, sfDir)
          val tp = Dedup.writeBucketedPairs(spark, sfDir)
          println(s"XJVM-WROTE $t rows=${spark.table(t).count()} " +
            s"$tp pairs=${spark.table(tp).count()}")
        case "read" =>
          val t = Graph.bucketedEdgeTable(sfDir)
          require(spark.catalog.tableExists(t),
            s"table $t not visible through the persistent metastore")
          spark.conf.set(Graph.BucketedEdgesConf, "true")
          val src = Graph.edgeSource(spark, sfDir)
          require(isCatalogRead(src, t),
            "edgeSource did not read the catalog table")
          val agg = src.groupBy(col("src")).agg(count(lit(1)).as("deg"))
          agg.collect()
          require(shuffles(agg) == 0,
            "src-keyed agg over the cross-JVM bucketed scan still shuffled")
          val viaTable = Graph.pagerankOn(src)
            .collect().map(_.toString).sorted.toSeq
          val viaCold = Graph.pagerankOn(Graph.buildEdges(spark, sfDir))
            .collect().map(_.toString).sorted.toSeq
          require(viaTable == viaCold,
            "pagerank over the cross-JVM table diverged from a cold build")
          // the pair-table twin: resolved through the metastore, CC
          // labels bit-equal to a cold in-process LSH derivation
          val tp = Dedup.bucketedPairTable(sfDir)
          require(spark.catalog.tableExists(tp),
            s"pair table $tp not visible through the persistent metastore")
          spark.conf.set(Dedup.BucketedPairsConf, "true")
          val ps = Dedup.pairSource(spark, sfDir)
          require(isCatalogRead(ps, tp),
            "pairSource did not read the catalog table")
          val coldPairs = Dedup.lshNearDupPairs(
            graft.Tables.load(spark, sfDir, "documents")
              .select(col("doc_id"), col("text")),
            n = 3, numHashes = Dedup.NumHashes, bandSize = Dedup.BandSize,
            seedBase = 0, tNum = Dedup.TrigramTNum, tDen = Dedup.TrigramTDen)
          val labT = Dedup.connectedComponents(ps.select(col("i"), col("j")))
            .collect().map(_.toString).sorted.toSeq
          val labC = Dedup.connectedComponents(
              coldPairs.select(col("i"), col("j")))
            .collect().map(_.toString).sorted.toSeq
          require(labT.nonEmpty && labT == labC,
            "CC labels over the cross-JVM pair table diverged")
          println(s"XJVM-READ-OK rows=${viaTable.length} labels=${labT.length}")
        case other => sys.error(s"unknown mode $other")
      }
    } finally spark.stop()
  }
}
