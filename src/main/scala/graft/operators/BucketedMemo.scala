package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The ONE mechanism behind the cross-session bucketed memo tables
  * (the graph edge table, the dedup trigram pair table, and whatever
  * family adopts the pattern next): deterministic digest-embedded table
  * naming for arbitrary dir paths, and the opt-in read-or-build switch
  * whose default is staleness REFUSAL — the oracle-gated queries must
  * never silently serve a table written against older files, so reading
  * the catalog requires the session conf, the table, AND a matching
  * corpus fingerprint. The fingerprint (file names + lengths + mtimes of
  * the inputs the build read, recorded as a table property at write
  * time) converts "opting in asserts the corpus hasn't changed" from a
  * documented trap into a loud failure: an opted-in session over a
  * mutated corpus gets an exception naming both fingerprints, never a
  * stale answer. Factored so a fix to the switch (or the naming, or the
  * fingerprint) lands in one place instead of drifting per family. */
private[operators] object BucketedMemo {

  /** Table property carrying the corpus fingerprint of the inputs the
    * memoized build consumed. */
  val FingerprintProp = "graft.corpus.fingerprint"

  /** Deterministic catalog name for `prefix` + dir `d` (dirs are
    * arbitrary paths; the name embeds a digest, not the path). */
  def tableName(prefix: String, d: String): String = {
    val h = java.security.MessageDigest.getInstance("MD5")
      .digest(d.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
    s"${prefix}_$h"
  }

  /** Cheap, deterministic corpus fingerprint: an MD5 fold over
    * (file name, length, mtime) of every file under `inputs` (each a
    * parquet file or directory), in sorted order. O(file metadata), no
    * data read — the same class of check Spark's own file index uses for
    * cache invalidation, and strong enough that any rewrite, append, or
    * touch of an input flips it. Cross-process stable (names, sizes,
    * and mtimes come from the filesystem), which the two-JVM metastore
    * topology relies on. */
  def fingerprint(inputs: Seq[String]): String = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def walk(f: java.io.File): Unit =
      if (f.isDirectory)
        Option(f.listFiles()).getOrElse(Array.empty)
          .sortBy(_.getName).foreach(walk)
      else
        md.update(
          s"${f.getName}|${f.length}|${f.lastModified}\n".getBytes("UTF-8"))
    inputs.sorted.foreach(p => walk(new java.io.File(p)))
    md.digest().map("%02x".format(_)).mkString
  }

  /** WRITE-side half of the staleness check: stamp `table` with the
    * current fingerprint of `inputs` (call right after `saveAsTable`,
    * with the same input list the read side will pass). */
  def stampFingerprint(s: SparkSession, table: String,
                       inputs: Seq[String]): Unit =
    s.sql(s"ALTER TABLE $table SET TBLPROPERTIES " +
      s"('$FingerprintProp' = '${fingerprint(inputs)}')")

  private def storedFingerprint(s: SparkSession, table: String): Option[String] =
    s.sql(s"SHOW TBLPROPERTIES $table").collect()
      .find(_.getString(0) == FingerprintProp).map(_.getString(1))

  /** Catalog table when `conf` is `true` AND `table` exists AND the
    * stored fingerprint matches the current state of `inputs`; `build`
    * otherwise. A fingerprint MISMATCH (or a table stamped by nothing —
    * pre-fingerprint or hand-written) throws rather than falling back:
    * an opted-in session believes the table is current, and silently
    * cold-building would hide that the corpus changed under a
    * deployment that planned to amortize the write. */
  def readOrBuild(s: SparkSession, conf: String, table: String,
                  inputs: Seq[String])(build: => DataFrame): DataFrame =
    if (s.conf.getOption(conf).exists(_.toBoolean) &&
        s.catalog.tableExists(table)) {
      val stored = storedFingerprint(s, table)
      val current = fingerprint(inputs)
      if (!stored.contains(current))
        throw new IllegalStateException(
          s"bucketed memo table $table is STALE: corpus fingerprint is " +
            s"$current but the table was written against " +
            s"${stored.getOrElse("<no fingerprint recorded>")} — the input " +
            s"files under ${inputs.mkString(", ")} changed since the write " +
            s"(or the table predates fingerprinting). Re-run the write " +
            s"(writeBucketedEdges/writeBucketedPairs) or drop $table; " +
            s"refusing to serve stale derived data with $conf=true.")
      s.table(table)
    } else build
}
