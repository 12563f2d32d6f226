package graft.operators

import org.apache.spark.sql.functions._

import graft.PlanCheck.{isCatalogRead, shuffles}
import graft.SparkSpec

/** The cross-session amortization contract for the dedup family's
  * trigram pair memo (`Dedup.writeBucketedPairs` / `Dedup.pairSource`) —
  * the `GraphBucketedSpec` pattern applied to the q42/q46/q47/q77/q96/
  * q99/q103/q106 family: write the verified (i, j, jac) pair list ONCE
  * as a parquet table bucketed by i, and a later session skips the
  * corpus-scale shingle→minhash→band→verify derivation entirely. Four
  * pins: an i-keyed aggregation over the bucketed scan is exchange-free,
  * the pair rows and the CC labels over the table bit-match the cold
  * derivation, and the read-or-build switch only reads when opted in AND
  * the table exists (off-by-default staleness refusal). */
class DedupBucketedPairsSpec extends SparkSpec {

  private def coldPairs(d: String): org.apache.spark.sql.DataFrame =
    Dedup.lshNearDupPairs(
      graft.Tables.load(spark, d, "documents").select(col("doc_id"), col("text")),
      n = 3, numHashes = Dedup.NumHashes, bandSize = Dedup.BandSize,
      seedBase = 0, tNum = Dedup.TrigramTNum, tDen = Dedup.TrigramTDen)

  test("bucketed pair table: i-keyed aggregation plans with no exchange, " +
    "pairs and CC labels bit-match the cold derivation, and the opt-in " +
    "switch holds") {
    val d = sfDir
    val t = Dedup.writeBucketedPairs(spark, d)
    try {
      assert(spark.catalog.tableExists(t))
      val bucketed = spark.table(t)

      // 1. the whole point: an i-keyed agg over the bucketed scan rides
      // the scan's HashPartitioning(i) — no exchange — where the cold
      // pair pipeline pays its banding/verify shuffles every session
      val byI = bucketed.groupBy(col("i")).agg(count(lit(1)).as("deg"))
      byI.collect()
      assert(shuffles(byI) == 0,
        "i-keyed agg over the bucketed pair table still shuffled")

      // 2. the table IS the pair list: rows bit-match the cold derivation
      val viaTable = bucketed.collect().map(_.toString).sorted.toSeq
      val viaBuild = coldPairs(d).collect().map(_.toString).sorted.toSeq
      assert(viaTable.nonEmpty, "fixture corpus must contain near-dup pairs")
      assert(viaTable == viaBuild,
        "bucketed pair table diverged from the cold LSH derivation")

      // 3. downstream labels bit-match too (the q46 family's consumer)
      val labelsTable = Dedup.connectedComponents(
          bucketed.select(col("i"), col("j")))
        .collect().map(_.toString).sorted.toSeq
      val labelsBuild = Dedup.connectedComponents(
          coldPairs(d).select(col("i"), col("j")))
        .collect().map(_.toString).sorted.toSeq
      assert(labelsTable == labelsBuild,
        "CC labels over the bucketed table diverged from the cold build")

      // 4. the switch: reads the table only when opted in AND present
      assert(!isCatalogRead(Dedup.pairSource(spark, d), t),
        "pairSource read the catalog table without the opt-in conf")
      spark.conf.set(Dedup.BucketedPairsConf, "true")
      try {
        assert(isCatalogRead(Dedup.pairSource(spark, d), t),
          "pairSource ignored the opt-in conf with the table present")
        // opted in but table absent for a DIFFERENT dir → cold build
        assert(!isCatalogRead(Dedup.pairSource(spark, sfDirAt("0.01")), t),
          "pairSource must cold-build when the dir has no table")
      } finally spark.conf.unset(Dedup.BucketedPairsConf)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("stale bucketed pair table: a mutated corpus dir REFUSES the " +
    "opted-in read instead of serving stale pairs") {
    // same contract as GraphBucketedSpec's stale case, on the dedup
    // family's table: fingerprint mismatch throws, re-write recovers
    val tmp = java.nio.file.Files.createTempDirectory("graft_stale_pairs")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/documents.parquet"),
      tmp.resolve("documents.parquet"))
    val d = tmp.toString
    val t = Dedup.writeBucketedPairs(spark, d)
    try {
      spark.conf.set(Dedup.BucketedPairsConf, "true")
      try {
        assert(isCatalogRead(Dedup.pairSource(spark, d), t))
        val f = tmp.resolve("documents.parquet").toFile
        assert(f.setLastModified(f.lastModified() + 5000L))
        val ex = intercept[IllegalStateException](Dedup.pairSource(spark, d))
        assert(ex.getMessage.contains("STALE"), ex.getMessage)
      } finally spark.conf.unset(Dedup.BucketedPairsConf)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
