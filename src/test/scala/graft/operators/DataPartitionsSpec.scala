package graft.operators

import org.apache.spark.sql.functions.col

import graft.SparkSpec

/** Pins the data-proportional partition helper the graph edge memos use
  * (the sf10→sf100 decade's q201 catch: a cpuPartitions-pinned edge
  * layout means the shuffle-hash build side grows linearly with the
  * corpus on a fixed heap). The helper must floor at defaultParallelism
  * for small inputs (the AQE-must-not-coalesce-to-one-task rationale),
  * scale with plan-statistics bytes WITHOUT running a job, and stay
  * deterministic. */
class DataPartitionsSpec extends SparkSpec {

  test("small inputs floor at defaultParallelism") {
    val small = spark.range(0, 1000).toDF() // stats: 8 KB
    assert(TextFns.dataPartitions(small) ==
      spark.sparkContext.defaultParallelism)
  }

  test("large inputs get one partition per 32 MB of source bytes, no job runs") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    // range stats are exact (8 B/row): 2^30 rows = 8 GiB -> 256 partitions
    val big = spark.range(0, 1L << 30).toDF()
    val n = TextFns.dataPartitions(big)
    assert(n == 256, s"expected 256 partitions for 8 GiB of stats, got $n")
    assert(sc.statusTracker.getJobIdsForGroup(null).length == before,
      "dataPartitions scheduled a job — it must price from plan statistics")
  }

  test("a statistics-less source falls back to cpuPartitions instead of " +
    "trusting the defaultSizeInBytes sentinel") {
    // LogicalRDD has no real statistics: its sizeInBytes is the
    // spark.sql.defaultSizeInBytes sentinel (Long.MaxValue by default),
    // which naively priced would pin 32768 partitions on 3 rows
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("id",
        org.apache.spark.sql.types.LongType)))
    val rdd = spark.sparkContext.parallelize(
      Seq(1L, 2L, 3L).map(org.apache.spark.sql.Row(_)))
    val statless = spark.createDataFrame(rdd, schema)
    assert(statless.queryExecution.optimizedPlan.stats.sizeInBytes >=
      BigInt(org.apache.spark.sql.internal.SQLConf.get.defaultSizeInBytes),
      "fixture no longer statistics-less — pick a different plan shape")
    assert(TextFns.dataPartitions(statless) ==
      spark.sparkContext.defaultParallelism)
    // an unknown source is DROPPED, not poisoning: mixed with a real
    // 8 GiB scan the call must still price the known bytes (a stat-less
    // side frame must not collapse a huge scan to cpuPartitions)
    val big = spark.range(0, 1L << 30).toDF()
    assert(TextFns.dataPartitions(big, statless) == 256)
  }

  /** Recursive on-disk size: driver testdata tables are single files,
    * the generated sf1/sf10 dirs may be parquet directories. */
  private def diskBytes(path: java.io.File): Long =
    if (path.isFile) path.length()
    else Option(path.listFiles()).getOrElse(Array.empty).map(diskBytes).sum

  test("graph-family pricing stays within a band of ACTUAL on-disk bytes " +
    "across the available decades (plan stats are an estimate, not gospel)") {
    val dirs = Seq(sfDirAt("0.1"), s"${sys.props("user.dir")}/data/sf1")
      .filter(d => new java.io.File(d, "orders.parquet").exists())
    assert(dirs.nonEmpty, "no measured dirs available")
    dirs.foreach { d =>
      val orders = graft.Tables.load(spark, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
      val items = graft.Tables.load(spark, d, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"))
      val n = TextFns.dataPartitions(orders, items)
      val actual = diskBytes(new java.io.File(d, "orders.parquet")) +
        diskBytes(new java.io.File(d, "lineitem.parquet"))
      val floor = spark.sparkContext.defaultParallelism
      val fromActual = (actual / (32L << 20)).toInt
      // plan stats scale the file size by the projected-column width
      // ratio, so the priced count may sit BELOW whole-file pricing —
      // but never above it (pruning only shrinks), and never more than
      // ~8x below (the graph projections keep 2 of <=16 columns)
      assert(n <= math.max(floor, fromActual) * 2,
        s"$d: priced $n partitions for $actual actual bytes — over-priced")
      assert(n >= math.max(floor, fromActual / 8),
        s"$d: priced $n partitions for $actual actual bytes — under-priced")
    }
  }

  test("the MATERIALIZED edge memo's per-partition footprint is bounded " +
    "(the sf100 OOM class: build-side bytes per task must not grow with " +
    "the corpus)") {
    val d = s"${sys.props("user.dir")}/data/sf1"
    assume(new java.io.File(d, "orders.parquet").exists(), s"no sf1 at $d")
    val e = Graph.buildEdges(spark, d)
    val total = e.count()
    assert(total > 0)
    val rddId = e.queryExecution.analyzed
      .asInstanceOf[org.apache.spark.sql.execution.LogicalRDD].rdd.id
    val info = spark.sparkContext.getRDDStorageInfo.find(_.id == rddId)
      .getOrElse(fail("pinned edge memo not in storage"))
    val bytes = info.memSize + info.diskSize
    assert(info.numPartitions > 0 && bytes > 0)
    val perPartition = bytes / info.numPartitions
    // one partition per 32 MB of compressed INPUT FILES (whole-file
    // pricing — see linkedBoth): the derived 2-long edge rows amplify
    // ~2-3x over the compressed input, so ~80 MB/partition is the
    // measured steady state and 128 MB the regression ceiling. (The
    // column-pruned pricing this spec caught in round 13 sat 8x higher,
    // growing with the corpus.)
    assert(perPartition < (128L << 20),
      s"edge memo averages $perPartition bytes/partition over " +
        s"${info.numPartitions} partitions — per-task footprint regressed")
    graft.FrameBlocks.release(e)
  }

  test("multiple sources sum; the cap holds") {
    val a = spark.range(0, 1L << 30).toDF() // 8 GiB
    val b = spark.range(0, 1L << 30).toDF() // 8 GiB
    assert(TextFns.dataPartitions(a, b) == 512)
    val huge = spark.range(0, 1L << 42).toDF() // 32 TiB of stats -> capped
    assert(TextFns.dataPartitions(huge) == 32768)
  }
}
