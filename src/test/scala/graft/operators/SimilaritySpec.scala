package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  test("brute-force knn ranks by cosine then vec_id, excludes self") {
    val out = Similarity.queries("q50_knn_brute")(spark, sfDir)
    val byQuery = out.collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .groupBy(_._1)
    assert(byQuery.keySet == (0L until Similarity.NumQueries).toSet)
    byQuery.foreach { case (q, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to Similarity.TopK).toSeq)
      // sims non-increasing with rank; no self-matches
      assert(sorted.sliding(2).forall { case Array(a, b) => a._4 >= b._4; case _ => true })
      assert(rows.forall(_._3 != q))
    }
  }

  test("LSH knn results are a subset of each query's bucket, ranked consistently") {
    val out = Similarity.queries("q51_knn_lsh")(spark, sfDir).collect()
    assert(out.nonEmpty)
    val brute = Similarity.queries("q50_knn_brute")(spark, sfDir)
      .filter(col("nn_rank") === 1)
      .collect().map(r => r.getLong(0) -> r.getDouble(3)).toMap
    // LSH top-1 sim can never exceed the brute-force top-1 sim
    out.filter(_.getLong(1) == 1L).foreach { r =>
      assert(r.getDouble(3) <= brute(r.getLong(0)) + 1e-12)
    }
  }

  test("ivfTopK probes one list and returns ranked neighbors from it") {
    val out = Similarity.ivfTopK(
      spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v")),
      numQueries = 5, k = 3).collect()
    val byQuery = out.groupBy(_.getLong(0))
    byQuery.foreach { case (q, rows) =>
      assert(rows.map(_.getLong(1)).toSet.subsetOf((1L to 3L).toSet))
      // all hits come from a single probed label
      assert(rows.map(_.getInt(3)).distinct.length == 1)
      assert(rows.forall(_.getLong(2) != q))
    }
  }
}
