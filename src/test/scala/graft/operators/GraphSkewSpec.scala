package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Planted-skew stress for the graph family (the q42/q192 discipline): a
  * hub supplier connected to EVERY customer — the degree distribution that
  * breaks naive per-node buffering — must still complete through the
  * shuffle-hash iteration plan and agree exactly with the sequential
  * recompute; the hub must dominate the ranking. */
class GraphSkewSpec extends SparkSpec {
  import spark.implicits._

  private val nCust = 2000

  /** All customers buy from supplier 0 (the hub); customer i additionally
    * buys from supplier 1 + (i mod 40) — a long-tail background. */
  private def plantedEdges(): org.apache.spark.sql.DataFrame = {
    val pairs = (0 until nCust).flatMap { i =>
      Seq((i.toLong, 0L), (i.toLong, 1L + (i % 40).toLong))
    }.distinct
    val p = pairs.toDF("ck", "sk")
      .select((col("ck") * 2).as("c"), (col("sk") * 2 + 1).as("sp"))
    p.select(col("c").as("src"), col("sp").as("dst"))
      .unionByName(p.select(col("sp").as("src"), col("c").as("dst")))
  }

  private def sequentialRanks(e: Seq[(Long, Long)]): Seq[(Long, String, Long)] = {
    val deg = e.groupBy(_._1).map { case (n, es) => n -> es.size.toLong }
    val n = deg.size.toLong
    val base = Graph.Scale / n
    var r: Map[Long, Long] = deg.map { case (node, _) => node -> base }
    (1 to Graph.PrIters).foreach { _ =>
      val cin = e.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => BigInt(r(src) / deg(src)) }.sum
      }
      r = deg.map { case (node, _) =>
        node -> ((15L * base) / 100L + (BigInt(85) * cin(node) / 100).toLong)
      }
    }
    r.toSeq.sortBy { case (node, rank) => (-rank, node) }.take(Graph.PrTopN)
      .map { case (node, rank) =>
        (node, if (node % 2 == 0) "customer" else "supplier", rank)
      }
  }

  test("a hub owning half of all edges ranks first and matches the sequential fixpoint") {
    val edf = plantedEdges()
    val got = Graph.pagerankOn(edf).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    val expected = sequentialRanks(
      edf.as[(Long, Long)].collect().toSeq)
    assert(got == expected)
    // the hub (supplier 0 → node 1) dominates, with ~half of all edge mass
    assert(got.head._1 == 1L && got.head._2 == "supplier")
    // and its rank clears every background supplier by a wide margin
    val second = got.find(r => r._2 == "supplier" && r._1 != 1L).map(_._3)
    second.foreach(s => assert(got.head._3 > 5L * s))
  }

  test("BFS from a leaf crosses the hub: everything is within 2 hops") {
    // distances from customer 0: hop1 = its two suppliers, hop2 = every
    // other customer (via the hub), hop3 = remaining background suppliers
    val e = plantedEdges().as[(Long, Long)].collect().toSeq
    val adj = e.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    var dist = Map[Long, Long](0L -> 0L)
    (1 to Graph.BfsHops).foreach { _ =>
      val relaxed = dist.toSeq.flatMap { case (node, h) =>
        adj(node).map(_ -> (h + 1))
      } ++ dist.toSeq
      dist = relaxed.groupBy(_._1).map { case (node, hs) => node -> hs.map(_._2).min }
    }
    assert(dist.values.count(_ <= 2) >= nCust) // hub pulls all customers to ≤2
    assert(dist.values.max <= 3)
  }
}
