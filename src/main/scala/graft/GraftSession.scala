package graft

import org.apache.spark.sql.SparkSession

/** Single construction point for every graft driver/dev session.
  *
  * Centralized so the invariant [[Tables.normalizeTimestamps]] relies on —
  * `spark.sql.session.timeZone=UTC`, which makes the NTZ→TIMESTAMP cast
  * preserve naive wall-clock values as the same epoch instants DuckDB's
  * oracle computes — holds in EVERY main (Bench, TimeQ, Smoke, Verify,
  * Explain), not just the ones that remembered the config line. A session
  * built elsewhere with a different zone would silently time/verify a
  * different workload on a non-UTC host.
  */
object GraftSession {
  def local(cpus: String): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    muteExpectedWarnings()
    s
  }

  /** FrameBlocks.release unpersists localCheckpoint RDDs on purpose —
    * that is the whole release discipline (RetiredFramesSpec pins it) —
    * but Spark logs a WARN ("lineage has been truncated and cannot be
    * recomputed after unpersisting") for every single release. Thousands
    * of identical expected lines buried the per-query timing JSON at the
    * tail of the round-9 bench artifact and would hide any genuinely
    * novel warning. Narrow, named suppression of exactly that logger;
    * everything else stays at the session default. */
  def muteExpectedWarnings(): Unit =
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.rdd.MapPartitionsRDD",
      org.apache.logging.log4j.Level.ERROR)
}
