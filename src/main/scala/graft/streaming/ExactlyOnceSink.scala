package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}

import org.apache.spark.sql.DataFrame

/** Exactly-once parquet sink for `foreachBatch`.
  *
  * Structured Streaming's `foreachBatch` contract is AT-LEAST-once: after a
  * failure the restarted query re-delivers the last unacknowledged batch
  * with the SAME batchId. A sink that blindly appends therefore duplicates
  * rows on every recovery. This sink makes the write idempotent with the
  * standard transaction-log pattern (the same write-then-commit discipline
  * Delta/Iceberg commit protocols use):
  *
  *   1. a batchId already present in the commit log is skipped entirely —
  *      replays become no-ops;
  *   2. data lands in a per-batch directory written with overwrite mode, so
  *      a crash BETWEEN data write and commit re-runs cleanly;
  *   3. the commit marker is created only after the data write returns, via
  *      an atomic rename — readers that list the commit log never observe a
  *      half-written batch.
  *
  * Scale: the log holds one empty marker file per micro-batch (list + set
  * membership, no data reads); data files are partitioned by batch id so
  * the sink never rewrites history. At cluster scale point the root at a
  * shared filesystem/object store with atomic rename (HDFS, ABFS; on S3 use
  * a DynamoDB-style log — the protocol is unchanged).
  */
object ExactlyOnceSink {

  /** The `foreachBatch` function: `.foreachBatch(ExactlyOnceSink.writer(root))`. */
  def writer(root: String): (DataFrame, Long) => Unit = { (df, batchId) =>
    if (!isCommitted(root, batchId)) {
      df.write.mode("overwrite").parquet(s"$root/data/batch=$batchId")
      commit(root, batchId)
    }
  }

  def isCommitted(root: String, batchId: Long): Boolean =
    Files.exists(Paths.get(s"$root/_commits/$batchId"))

  private def commit(root: String, batchId: Long): Unit = {
    val dir = Paths.get(s"$root/_commits")
    Files.createDirectories(dir)
    val tmp = dir.resolve(s".$batchId.inprogress")
    Files.write(tmp, Array.emptyByteArray)
    Files.move(tmp, dir.resolve(batchId.toString),
      StandardCopyOption.ATOMIC_MOVE)
  }

  /** Committed rows only: batches with data on disk but no commit marker
    * (a crash between steps 1 and 2) are invisible — they will be
    * rewritten when the batch replays. */
  def read(spark: org.apache.spark.sql.SparkSession, root: String): DataFrame = {
    val committed = {
      val dir = Paths.get(s"$root/_commits")
      if (!Files.exists(dir)) Seq.empty[String]
      else {
        val s = Files.list(dir)
        try {
          import scala.jdk.CollectionConverters._
          s.iterator().asScala.map(_.getFileName.toString)
            .filterNot(_.startsWith(".")).toList
        } finally s.close()
      }
    }
    val paths = committed.map(id => s"$root/data/batch=$id")
    if (paths.isEmpty)
      spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
  }
}
