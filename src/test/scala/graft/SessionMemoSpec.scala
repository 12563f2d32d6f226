package graft

import org.apache.spark.sql.functions._

class SessionMemoSpec extends SparkSpec {

  test("memoizes per (session, dir); evict drops the session's entries and recomputes") {
    import spark.implicits._
    var computes = 0
    val memo = SessionMemo.ofFrames()
    def frame() = memo.getOrCompute(spark, "dirA") {
      computes += 1
      Seq(1L, 2L, 3L).toDF("v").localCheckpoint(false)
    }
    val a = frame()
    val b = frame()
    assert(computes == 1 && (a eq b))
    memo.getOrCompute(spark, "dirB")(Seq(9L).toDF("v").localCheckpoint(false))
    assert(memo.size == 2)

    memo.evict(spark)
    assert(memo.size == 0)
    frame()
    assert(computes == 2, "post-evict access must recompute")
    // the recomputed frame still answers correctly
    assert(frame().agg(sum(col("v"))).head().getLong(0) == 6L)
  }

  test("multi-frame values unpersist through framesOf") {
    import spark.implicits._
    val memo = new SessionMemo[Seq[org.apache.spark.sql.DataFrame]](identity)
    val v = memo.getOrCompute(spark, "x") {
      Seq(Seq(1L).toDF("v").localCheckpoint(false),
        Seq(2L).toDF("v").localCheckpoint(false))
    }
    assert(v.length == 2 && memo.size == 1)
    memo.evict(spark)
    assert(memo.size == 0)
  }
}
