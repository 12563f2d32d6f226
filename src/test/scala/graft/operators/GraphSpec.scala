package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Ground-truth recomputes for the corpus-scale graph family
  * (q201/q202/q208) and the integer Lloyd k-means (q203): each
  * query's distributed integer fixpoint is re-run sequentially in plain
  * Scala (BigInt / Long maps, no Spark) at sf0.001 and compared EXACTLY —
  * the determinism claim these operators make is bit-identity under any
  * partitioning, so the spec demands equality, not tolerance. */
class GraphSpec extends SparkSpec {

  private def edgeList(): Seq[(Long, Long)] =
    Graph.edges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq

  test("q201 bipartite PageRank equals a sequential BigInt recompute of the fixpoint") {
    val e = edgeList()
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
    val expected = r.toSeq.sortBy { case (node, rank) => (-rank, node) }
      .take(Graph.PrTopN)
      .map { case (node, rank) =>
        (node, if (node % 2 == 0) "customer" else "supplier", rank)
      }
    val got = Graph.queries("q201_bipartite_pagerank")(spark, sfDir).collect()
      .map(r0 => (r0.getLong(0), r0.getString(1), r0.getLong(2))).toSeq
    assert(got == expected)
    // mass sanity: total rank stays within teleport-floor and full mass
    val total = r.values.map(BigInt(_)).sum
    assert(total <= BigInt(Graph.Scale) && total >= BigInt(n) * ((15L * base) / 100L))
  }

  test("q208 HITS equals a sequential BigInt recompute; roles are bipartite-pure") {
    val e = edgeList().filter(_._1 % 2 == 0) // c → s only
    var h: Map[Long, Long] = e.map(_._1).distinct.map(_ -> Graph.Scale).toMap
    var a = Map.empty[Long, Long]
    (1 to Graph.HitsIters).foreach { _ =>
      val araw = e.groupBy(_._2).map { case (s, es) =>
        s -> es.map(x => BigInt(h(x._1))).sum
      }
      val amax = araw.values.max
      a = araw.map { case (s, r) => s -> (r * Graph.Scale / amax).toLong }
      val hraw = e.groupBy(_._1).map { case (c, es) =>
        c -> es.map(x => BigInt(a(x._2))).sum
      }
      val hmax = hraw.values.max
      h = hraw.map { case (c, r) => c -> (r * Graph.Scale / hmax).toLong }
    }
    val expected =
      a.toSeq.sortBy { case (n, s) => (-s, n) }.take(Graph.HitsTopN)
        .map { case (n, s) => (n, "authority", s) } ++
      h.toSeq.sortBy { case (n, s) => (-s, n) }.take(Graph.HitsTopN)
        .map { case (n, s) => (n, "hub", s) }
    val got = Graph.queries("q208_hits")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got.toSet == expected.toSet && got.size == expected.size)
    // bipartite purity: authorities are suppliers (odd), hubs customers (even)
    got.foreach { case (node, role, score) =>
      assert((role == "authority") == (node % 2 == 1))
      assert(score > 0 && score <= Graph.Scale)
    }
  }

  test("q202 BFS census equals a sequential BFS; hops alternate bipartite sides") {
    val e = edgeList()
    val adj = e.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
    val seed = e.map(_._1).filter(_ % 2 == 0).min
    var dist = Map[Long, Long](seed -> 0L)
    (1 to Graph.BfsHops).foreach { _ =>
      val relaxed = dist.toSeq.flatMap { case (node, h) =>
        adj(node).map(_ -> (h + 1))
      } ++ dist.toSeq
      dist = relaxed.groupBy(_._1).map { case (node, hs) => node -> hs.map(_._2).min }
      // bipartite invariant: even hops are customers, odd hops suppliers
      dist.foreach { case (node, h) => assert((node % 2 == 0) == (h % 2 == 0)) }
    }
    val expected = dist.values.groupBy(identity)
      .map { case (h, vs) => (h, vs.size.toLong) }
    val got = Graph.queries("q202_bfs_khop")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("q218 weighted SSSP census equals a sequential truncated Bellman-Ford") {
    val e = Graph.weightedEdges(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    // weights are the documented inverse-strength costs, within [1, 7]
    assert(e.forall(x => x._3 >= 1 && x._3 <= 7))
    assert(e.map(_._3).distinct.size > 1, "cost function degenerate")
    val adj = e.groupBy(_._1).map { case (s, es) => s -> es.map(x => (x._2, x._3)) }
    val seed = e.map(_._1).filter(_ % 2 == 0).min
    var dist = Map[Long, Long](seed -> 0L)
    (1 to Graph.SsspIters).foreach { _ =>
      val relaxed = dist.toSeq.flatMap { case (node, dd) =>
        adj(node).map { case (dst, w) => dst -> (dd + w) }
      } ++ dist.toSeq
      dist = relaxed.groupBy(_._1).map { case (node, ds) => node -> ds.map(_._2).min }
    }
    val expected = dist.toSeq
      .groupBy { case (node, dd) => (dd, if (node % 2 == 0) "customer" else "supplier") }
      .map { case (k, vs) => (k._1, k._2, vs.size.toLong) }.toSet
    val got = Graph.queries("q218_weighted_sssp")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    assert(got == expected)
    // same reachable set as the unweighted BFS at equal round count would
    // give: relaxation explores by HOPS, weights only reprice the paths —
    // every reached node sits within SsspIters hops of the seed
    val bfsReach = {
      val uadj = e.groupBy(_._1).map { case (s, es) => s -> es.map(_._2) }
      var f = Set(seed)
      (1 to Graph.SsspIters).foreach(_ => f = f ++ f.flatMap(uadj(_)))
      f
    }
    assert(dist.keySet == bfsReach)
  }

  test("q203 k-means equals a sequential integer Lloyd recompute") {
    val vecs = graft.Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>"))
      .collect()
      .map(r => r.getLong(0) ->
        r.getSeq[Double](1).map(x => math.floor((x + 1.0) * 1000.0).toLong).toIndexedSeq)
      .toMap
    var cent: Map[Long, IndexedSeq[Long]] =
      (0L until Similarity.KmK.toLong).map(k => k -> vecs(k)).toMap
    def assign(c: Map[Long, IndexedSeq[Long]]): Map[Long, (Long, Long)] =
      vecs.map { case (id, qv) =>
        val scored = c.toSeq.map { case (cid, cv) =>
          val dist = qv.indices.map { i => val d = qv(i) - cv(i); d * d }.sum
          (dist, cid)
        }.min
        id -> (scored._2, scored._1)
      }
    (1 to Similarity.KmIters).foreach { _ =>
      val a = assign(cent)
      cent = a.toSeq.groupBy(_._2._1).map { case (cid, members) =>
        val qs = members.map { case (id, _) => vecs(id) }
        cid -> qs.head.indices.map(i => qs.map(_(i)).sum / qs.size).toIndexedSeq
      }
    }
    val fin = assign(cent)
    val expected = fin.toSeq.groupBy(_._2._1).map { case (cid, members) =>
      (cid, members.size.toLong, members.map(_._2._2).sum, cent(cid).sum)
    }.toSet
    val got = Similarity.queries("q203_kmeans_lloyd")(spark, sfDir)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(got == expected)
  }
}
