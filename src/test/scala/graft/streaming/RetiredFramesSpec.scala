package graft.streaming

import org.apache.spark.sql.DataFrame

import graft.SparkSpec

/** Pins the bounded-retirement contract the three cumulative streams rely
  * on — against the REAL release signal. `Dataset.unpersist` is a no-op
  * for localCheckpointed frames on this Spark (it only clears the
  * CacheManager entry; `sc.getPersistentRDDs` keeps the checkpoint RDD),
  * so the assertions watch each frame's OWN checkpoint-RDD id in the
  * persistence registry (membership is immune to the ContextCleaner
  * concurrently collecting unrelated suites' dereferenced RDDs): a
  * retired checkpoint stays registered and actionable for `keep`
  * subsequent retirements, aged-out generations actually leave the
  * registry (storage O(keep), not O(batches)), and closeAll drains the
  * rest. */
class RetiredFramesSpec extends SparkSpec {
  import spark.implicits._

  private def rddId(df: DataFrame): Int =
    df.queryExecution.analyzed match {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
      case other => fail(s"not a checkpoint frame: ${other.getClass}")
    }

  private def registered(id: Int): Boolean =
    spark.sparkContext.getPersistentRDDs.contains(id)

  private def ckpt(n: Int) =
    (1 to n).toDF("x").localCheckpoint(true)

  test("frames stay actionable for `keep` retirements; older RDDs really release") {
    val rf = new RetiredFrames(keep = 2)
    val g1 = ckpt(1); val g2 = ckpt(2); val g3 = ckpt(3); val g4 = ckpt(4)
    val ids = Seq(g1, g2, g3, g4).map(rddId)
    assert(ids.forall(registered))
    rf.retire(g1)
    rf.retire(g2)
    // both within the window: still registered and actionable
    assert(registered(ids(0)) && registered(ids(1)))
    assert(g1.count() == 1L && g2.count() == 2L)
    rf.retire(g3)
    // g1 aged out: its checkpoint RDD left the persistence registry
    // (Dataset.unpersist alone would have left it registered)
    assert(!registered(ids(0)))
    assert(registered(ids(1)) && registered(ids(2)))
    assert(g2.count() == 2L && g3.count() == 3L)
    rf.closeAll(g4)
    assert(ids.forall(id => !registered(id)))
    // released frames are genuinely invalid, not lazily recomputable
    intercept[Exception] { g4.count() }
  }
}
