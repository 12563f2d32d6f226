package graft.streaming

import graft.SparkSpec

/** Pins the bounded-retirement contract the three cumulative streams rely
  * on — against the REAL release signal. `Dataset.unpersist` is a no-op
  * for localCheckpointed frames on this Spark (it only clears the
  * CacheManager entry; `sc.getPersistentRDDs` keeps the checkpoint RDD),
  * so the assertions here watch the persistent-RDD count and actionability
  * directly: a retired checkpoint stays actionable for `keep` subsequent
  * retirements, aged-out generations actually drop their RDD from the
  * persistence registry (storage O(keep), not O(batches)), and closeAll
  * drains the rest. */
class RetiredFramesSpec extends SparkSpec {
  import spark.implicits._

  private def persistentCount: Int = spark.sparkContext.getPersistentRDDs.size

  private def ckpt(n: Int) =
    (1 to n).toDF("x").localCheckpoint(true)

  test("frames stay actionable for `keep` retirements; older RDDs really release") {
    val before = persistentCount
    val rf = new RetiredFrames(keep = 2)
    val g1 = ckpt(1); val g2 = ckpt(2); val g3 = ckpt(3); val g4 = ckpt(4)
    assert(persistentCount == before + 4)
    rf.retire(g1)
    rf.retire(g2)
    // both within the window: still actionable, nothing released
    assert(g1.count() == 1L && g2.count() == 2L)
    assert(persistentCount == before + 4)
    rf.retire(g3)
    // g1 aged out: its checkpoint RDD left the persistence registry
    // (Dataset.unpersist alone would leave the count at +4)
    assert(persistentCount == before + 3)
    assert(g2.count() == 2L && g3.count() == 3L)
    rf.closeAll(g4)
    assert(persistentCount == before)
    // released frames are genuinely invalid, not lazily recomputable
    intercept[Exception] { g4.count() }
  }
}
