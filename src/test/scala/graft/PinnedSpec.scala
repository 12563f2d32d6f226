package graft

import graft.Pinned._

/** Mode semantics of the pin helper (the fault-tolerance dial every
  * memo/iteration path routes through). The executor-kill proof lives in
  * LocalClusterSpec; this spec pins the cheap invariants in-process. */
class PinnedSpec extends SparkSpec {

  test("default mode pins via localCheckpoint: no checkpoint files, values intact") {
    val df = spark.range(0, 100).selectExpr("id", "id * 3 AS v").pin(true)
    assert(!Pinned.reliable(spark))
    // localCheckpoint result scans an RDD, not the original range
    assert(df.queryExecution.analyzed.isInstanceOf[
      org.apache.spark.sql.execution.LogicalRDD])
    assert(df.selectExpr("sum(v)").collect()(0).getLong(0) == 3L * 4950)
    FrameBlocks.release(df)
  }

  test("reliable mode writes checkpoint FILES under the configured dir") {
    // session-scoped conf on a cloned session: the shared session keeps
    // its default mode (other suites' pins must stay localCheckpoint)
    val s2 = spark.newSession()
    graft.functions.GraftFunctions.register(s2)
    val dir = java.nio.file.Files.createTempDirectory("graft-ckpt-spec")
    s2.conf.set(Pinned.ModeConf, "reliable")
    s2.conf.set(Pinned.DirConf, dir.toString)
    assert(Pinned.reliable(s2) && !Pinned.reliable(spark))
    val df = s2.range(0, 100).selectExpr("id", "id * 7 AS v").pin(true)
    assert(df.selectExpr("sum(v)").collect()(0).getLong(0) == 7L * 4950)
    // the pin must have produced real files a retried task can re-read
    def filesUnder(p: java.io.File): Seq[java.io.File] = {
      val kids = Option(p.listFiles()).getOrElse(Array.empty).toSeq
      kids.filter(_.isFile) ++ kids.filter(_.isDirectory).flatMap(filesUnder)
    }
    val parts = filesUnder(dir.toFile).filter(_.getName.startsWith("part-"))
    assert(parts.nonEmpty, s"no checkpoint part files under $dir")
    // NOTE: the checkpoint dir is SparkContext-global; later suites that
    // pin reliably in this JVM would inherit it, which is fine (fresh
    // contexts in LocalClusterSpec set their own).
  }

  test("lazy pin stays plan-only at construction (no job until an action)") {
    val sc = spark.sparkContext
    val before = sc.statusTracker.getJobIdsForGroup(null).length
    val df = spark.range(0, 10).selectExpr("id * 2 AS v").pin(false)
    val mid = sc.statusTracker.getJobIdsForGroup(null).length
    assert(mid == before, "constructing a lazy pin scheduled a job")
    assert(df.selectExpr("sum(v)").collect()(0).getLong(0) == 90L)
  }
}
