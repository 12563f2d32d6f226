package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE mechanism behind the cross-session bucketed memo tables
  * (the graph edge table, the dedup trigram pair table, and whatever
  * family adopts the pattern next): deterministic digest-embedded table
  * naming for arbitrary dir paths, and the opt-in read-or-build switch
  * whose default is staleness REFUSAL — the oracle-gated queries must
  * never silently serve a table written against older files, so reading
  * the catalog requires both the session conf and the table, and opting
  * in is the operator's assertion that the corpus hasn't changed since
  * the write. Factored so a fix to the switch (or the naming) lands in
  * one place instead of drifting per family. */
private[operators] object BucketedMemo {

  /** Deterministic catalog name for `prefix` + dir `d` (dirs are
    * arbitrary paths; the name embeds a digest, not the path). */
  def tableName(prefix: String, d: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"${prefix}_$h"
  }

  /** Catalog table when `conf` is `true` AND `table` exists; `build`
    * otherwise. */
  def readOrBuild(s: SparkSession, conf: String, table: String)(
      build: => DataFrame): DataFrame =
    if (s.conf.getOption(conf).exists(_.toBoolean) &&
        s.catalog.tableExists(table)) s.table(table)
    else build
}
