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
  def local(cpus: String): SparkSession = SparkSession.builder()
    .master(s"local[$cpus]")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
