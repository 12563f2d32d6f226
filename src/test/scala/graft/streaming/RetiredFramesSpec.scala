package graft.streaming

import graft.SparkSpec

/** Pins the bounded-retirement contract the three cumulative streams rely
  * on: a retired checkpoint stays actionable for `keep` subsequent
  * retirements (reader safety), older generations actually release their
  * blocks (storage stays O(keep), not O(batches)), and closeAll releases
  * the rest. */
class RetiredFramesSpec extends SparkSpec {
  import spark.implicits._

  private def ckpt(n: Int) =
    (1 to n).toDF("x").localCheckpoint(true)

  test("frames stay valid for `keep` retirements, then release; closeAll drains") {
    val rf = new RetiredFrames(keep = 2)
    val g1 = ckpt(1); val g2 = ckpt(2); val g3 = ckpt(3); val g4 = ckpt(4)
    rf.retire(g1)
    rf.retire(g2)
    // both within the window: still actionable
    assert(g1.count() == 1L && g2.count() == 2L)
    rf.retire(g3)
    // g1 aged out: its blocks are released (unpersist is async-visible via
    // the storage level dropping; an action may still replay from lineage
    // for a plain localCheckpoint, so assert the release signal itself)
    assert(g1.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    assert(g2.count() == 2L && g3.count() == 3L)
    rf.closeAll(g4)
    Seq(g2, g3, g4).foreach { g =>
      assert(g.storageLevel == org.apache.spark.storage.StorageLevel.NONE)
    }
  }
}
