package graft.operators

import org.apache.spark.sql.functions._

import graft.PlanCheck.{isCatalogRead, shuffles}
import graft.SparkSpec

/** The cross-session amortization contract for the graph family's edge
  * table (`Graph.writeBucketedEdges` / `Graph.edgeSource`): write the
  * deduped both-directions edge list ONCE as a parquet table bucketed by
  * src, and every later consumer keyed on src starts exchange-free —
  * q201's cold-cost owner (the orders⋈lineitem edge build, 500 s at
  * sf100) becomes a once-per-corpus-version cost instead of a
  * once-per-session one. Three pins: the bucketed scan really eliminates
  * the src-keyed exchange, the fixpoint over the table bit-matches the
  * cold-built edges, and the read-or-build switch only reads when opted
  * in AND the table exists. */
class GraphBucketedSpec extends SparkSpec {

  test("bucketed edge table: src-keyed aggregation plans with no exchange, " +
    "the fixpoint bit-matches the cold build, and the opt-in switch holds") {
    val d = sfDir
    val t = Graph.writeBucketedEdges(spark, d)
    try {
      assert(spark.catalog.tableExists(t))
      val bucketed = spark.table(t)

      // 1. the whole point: a groupBy on the bucket column needs NO
      // shuffle (partial+final agg ride the scan's HashPartitioning),
      // where the cold-built edge stream pays a repartition exchange
      val byBucketed = bucketed.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      byBucketed.collect()
      assert(shuffles(byBucketed) == 0,
        "src-keyed agg over the bucketed table still shuffled")

      // 2. the fixpoint over the bucketed table bit-matches the cold
      // build (same rows, same integer ranks)
      val viaTable = Graph.pagerankOn(bucketed)
        .collect().map(_.toString).sorted.toSeq
      val viaBuild = Graph.pagerankOn(Graph.buildEdges(spark, d))
        .collect().map(_.toString).sorted.toSeq
      assert(viaTable == viaBuild,
        "pagerank over the bucketed table diverged from the cold build")

      // 3. the switch: reads the table only when opted in AND present
      assert(!isCatalogRead(Graph.edgeSource(spark, d), t),
        "edgeSource read the catalog table without the opt-in conf")
      spark.conf.set(Graph.BucketedEdgesConf, "true")
      try {
        assert(isCatalogRead(Graph.edgeSource(spark, d), t),
          "edgeSource ignored the opt-in conf with the table present")
        // opted in but table absent for a DIFFERENT dir → cold build
        assert(!isCatalogRead(Graph.edgeSource(spark, sfDirAt("0.01")), t),
          "edgeSource must cold-build when the dir has no table")
      } finally spark.conf.unset(Graph.BucketedEdgesConf)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }

  test("stale bucketed table: a mutated corpus dir REFUSES the opted-in " +
    "read instead of serving stale edges") {
    // the opt-in conf used to be a blind assertion that the corpus hadn't
    // changed since the write; the fingerprint stamp turns a wrong
    // assertion into a loud failure. Work on a COPY of the fixture dir
    // (testdata is read-only and must stay byte-identical for the gates).
    val tmp = java.nio.file.Files.createTempDirectory("graft_stale_edges")
    Seq("orders.parquet", "lineitem.parquet").foreach { f =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$sfDir/$f"), tmp.resolve(f))
    }
    val d = tmp.toString
    val t = Graph.writeBucketedEdges(spark, d)
    try {
      spark.conf.set(Graph.BucketedEdgesConf, "true")
      try {
        // unchanged corpus: the stamped fingerprint matches, table serves
        assert(graft.PlanCheck.isCatalogRead(Graph.edgeSource(spark, d), t))
        // mutate one input (mtime bump is the cheapest corpus change a
        // rewrite-in-place leaves behind) → the read must throw, naming
        // the staleness, never fall back silently
        val f = tmp.resolve("orders.parquet").toFile
        assert(f.setLastModified(f.lastModified() + 5000L))
        val ex = intercept[IllegalStateException](Graph.edgeSource(spark, d))
        assert(ex.getMessage.contains("STALE"), ex.getMessage)
        // re-running the write against the mutated corpus re-stamps and
        // the opted-in read works again — the documented recovery path
        Graph.writeBucketedEdges(spark, d)
        assert(graft.PlanCheck.isCatalogRead(Graph.edgeSource(spark, d), t))
      } finally spark.conf.unset(Graph.BucketedEdgesConf)
    } finally spark.sql(s"DROP TABLE IF EXISTS $t")
  }
}
