package graft

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerApplicationEnd}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** (SparkSession, dir)-keyed memo of lazily-checkpointed frames — the
  * materialize-once discipline the Dedup/Similarity/TextAnalysis stage
  * caches share — with EVICTION: the first compute for a session hooks a
  * SparkListener, and when that session's application ends every entry it
  * owns is dropped and its frames unpersisted. Without this, the static
  * maps pinned localCheckpoint blocks and SparkSession references for the
  * JVM lifetime — harmless in one-shot mains, a real leak in any
  * long-lived multi-session process (notebook servers, large test suites).
  *
  * `framesOf` extracts the checkpointed frames inside a value so eviction
  * can unpersist them (a value may carry several, e.g. the BPE ladder's
  * per-round stages). [[evict]] is also callable directly for deterministic
  * mid-life cleanup. */
final class SessionMemo[V](framesOf: V => Seq[DataFrame]) {
  private val entries = new ConcurrentHashMap[(SparkSession, String), V]
  private val hooked = ConcurrentHashMap.newKeySet[SparkSession]()

  def getOrCompute(s: SparkSession, d: String)(compute: => V): V = {
    if (hooked.add(s)) {
      s.sparkContext.addSparkListener(new SparkListener {
        override def onApplicationEnd(e: SparkListenerApplicationEnd): Unit =
          evict(s)
      })
    }
    entries.computeIfAbsent((s, d), _ => compute)
  }

  /** Drops every entry owned by `s`, best-effort unpersisting its frames. */
  def evict(s: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    entries.keySet.asScala.toSeq.filter(_._1 eq s).foreach { k =>
      Option(entries.remove(k)).foreach { v =>
        framesOf(v).foreach { df =>
          try { df.unpersist(); () } catch { case _: Throwable => () }
        }
      }
    }
    hooked.remove(s)
    ()
  }

  /** Live entry count (spec observability). */
  def size: Int = entries.size
}

object SessionMemo {
  /** The common single-frame case. */
  def ofFrames(): SessionMemo[DataFrame] = new SessionMemo[DataFrame](Seq(_))
}
