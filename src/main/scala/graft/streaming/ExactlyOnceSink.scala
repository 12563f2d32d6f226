package graft.streaming

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SparkSession}

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
  * The commit log goes through `org.apache.hadoop.fs.FileSystem` — the SAME
  * layer the data write uses — so the root may be any Hadoop-addressable
  * URI (local path, hdfs://, abfs://): rename-based commit is atomic on
  * HDFS/ABFS exactly as on a local filesystem. (On S3, rename is
  * copy+delete — use a DynamoDB-style external log there; the protocol is
  * unchanged.)
  *
  * Scale: the log holds one empty marker file per micro-batch (list + set
  * membership, no data reads); data files are partitioned by batch id so
  * the sink never rewrites history.
  */
object ExactlyOnceSink {

  private def hadoopConf(): Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsFor(p: Path): FileSystem = p.getFileSystem(hadoopConf())

  /** The `foreachBatch` function: `.foreachBatch(ExactlyOnceSink.writer(root))`. */
  def writer(root: String): (DataFrame, Long) => Unit = { (df, batchId) =>
    if (!isCommitted(root, batchId)) {
      df.write.mode("overwrite").parquet(s"$root/data/batch=$batchId")
      commit(root, batchId)
    }
  }

  def isCommitted(root: String, batchId: Long): Boolean = {
    val marker = new Path(s"$root/_commits/$batchId")
    fsFor(marker).exists(marker)
  }

  private def commit(root: String, batchId: Long): Unit = {
    val dir = new Path(s"$root/_commits")
    val fs = fsFor(dir)
    fs.mkdirs(dir)
    val tmp = new Path(dir, s".$batchId.inprogress")
    fs.create(tmp, true).close()
    if (!fs.rename(tmp, new Path(dir, batchId.toString))) {
      // a concurrent committer of the same batch won the rename — the
      // marker exists either way, so the commit is in effect; only a
      // genuinely absent marker is an error
      if (!isCommitted(root, batchId))
        throw new java.io.IOException(
          s"ExactlyOnceSink: commit rename failed for batch $batchId under $root")
      fs.delete(tmp, false)
      ()
    }
  }

  /** Committed rows only: batches with data on disk but no commit marker
    * (a crash between steps 1 and 2) are invisible — they will be
    * rewritten when the batch replays. */
  def read(spark: SparkSession, root: String): DataFrame = {
    val dir = new Path(s"$root/_commits")
    val fs = fsFor(dir)
    val committed =
      if (!fs.exists(dir)) Seq.empty[String]
      else fs.listStatus(dir).toSeq.map(_.getPath.getName)
        .filterNot(_.startsWith("."))
    val paths = committed.map(id => s"$root/data/batch=$id")
    if (paths.isEmpty)
      spark.emptyDataFrame
    else spark.read.parquet(paths: _*)
  }
}
