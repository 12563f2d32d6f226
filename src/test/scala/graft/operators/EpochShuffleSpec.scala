package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Invariants of the q204/q205 epoch-shuffle family beyond the oracle
  * hash: the order is a real permutation, shard assignment is stable
  * under corpus growth (the property that lets an incremental corpus
  * extend shards without reshuffling history), and the q210 co-purchase
  * projection's degree ceiling really bounds fanout. */
class EpochShuffleSpec extends SparkSpec {
  import spark.implicits._

  test("q204: (shard, pos) is a permutation — contiguous positions per shard") {
    val r = Curation.queries("q204_epoch_shuffle")(spark, sfDir)
      .select(col("doc_id"), col("shard"), col("pos"))
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val docs = graft.Tables.load(spark, sfDir, "documents").count()
    assert(r.length == docs && r.map(_._1).distinct.length == r.length)
    r.groupBy(_._2).foreach { case (shard, rows) =>
      val ps = rows.map(_._3).sorted.toSeq
      assert(ps == (1L to rows.length.toLong), s"shard $shard positions: $ps")
    }
  }

  test("q204: shard assignment is stable under corpus growth") {
    // the hash shard is a pure function of doc_id and the shard COUNT;
    // grow the corpus without crossing a shard-count boundary and every
    // old doc keeps its shard — the incremental-extend property. (pos can
    // shift as new docs land mid-shard; assignment must not.)
    val docs = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"))
    val n = docs.count()
    val shardsOf = (df: org.apache.spark.sql.DataFrame, k: Long) =>
      df.select(col("doc_id"),
        expr(s"cast(conv(substring(md5(concat('${Curation.EpochSalt}', " +
          s"cast(doc_id as string))), 1, 12), 16, 10) as bigint) % $k").as("shard"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val k = (n + Curation.EpochShardDocs - 1) / Curation.EpochShardDocs
    val before = shardsOf(docs, k)
    // grow exactly up to the current shard-count boundary
    val spare = k * Curation.EpochShardDocs - n
    assert(spare >= 1, s"corpus already at a boundary (n=$n)")
    val grown = docs.unionByName(
      spark.range(1000000, 1000000 + spare).select(col("id").as("doc_id")))
    val kGrown = (grown.count() + Curation.EpochShardDocs - 1) / Curation.EpochShardDocs
    assert(kGrown == k, "growth crossed a shard boundary; pick a smaller delta")
    val after = shardsOf(grown, kGrown)
    assert(before.forall { case (id, s) => after(id) == s })
  }

  test("q205: imbalance numerators are consistent with the exact totals") {
    val rows = Curation.queries("q205_shard_balance")(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val grand = rows.map(_._3).sum
    val k = rows.length.toLong
    rows.foreach { case (_, _, tc, num) =>
      assert(num == math.abs(tc * k - grand))
    }
  }

  test("q206: TVD is symmetric-complete, bounded, and zero on self") {
    val rows = TextAnalysis.queries("q206_tvd_drift")(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val sources = graft.Tables.load(spark, sfDir, "documents")
      .select(col("source")).distinct().count()
    assert(rows.length == sources * (sources - 1) / 2) // every unordered pair once
    rows.foreach { case (sa, sb, num, den) =>
      assert(sa < sb && num >= 0 && num <= den, s"($sa,$sb,$num,$den)")
    }
    // a source against itself has TVD 0 — recompute one diagonal by hand
    val cnt = graft.Tables.load(spark, sfDir, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val s0 = cnt.keys.map(_._1).head
    val self = cnt.collect { case ((s, _), c) if s == s0 => c }
    assert(self.map(c => (c * self.sum - c * self.sum).abs).sum == 0L)
  }

  test("q211: bucketed two-level rank equals the naive global sort's rank") {
    val got = Curation.queries("q211_global_rank")(spark, sfDir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"),
        expr(s"md5(concat('${Curation.EpochSalt}', cast(doc_id as string)))")
          .as("h"))
      .collect().map(r => (r.getString(1), r.getLong(0)))
      .sorted.zipWithIndex
      .map { case ((_, id), i) => id -> (i + 1L) }.toMap
    assert(got == expected)
  }

  test("q212/q213: HRW resharding moves only winners of the NEW shard") {
    val k = Curation.HrwShards
    def shards(kk: Int) = graft.Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"))
      .collect().map(_.getLong(0)).map { id =>
        id -> (0 until kk).map { j =>
          (org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$j|$id"), j.toLong)
        }.max._2
      }.toMap
    val before = shards(k)
    val after = shards(k + 1)
    val moved = before.keys.filter(id => before(id) != after(id)).toSeq
    // the sharp HRW property: a doc moves IFF the added shard wins its
    // argmax — every mover lands on the new shard, nothing reshuffles
    // between surviving shards
    assert(moved.forall(id => after(id) == k.toLong))
    // movement ≈ n/(k+1): the minimal-movement bound (generous noise band)
    val n = before.size.toDouble
    assert(moved.length < 3 * n / (k + 1) && moved.length > n / (3 * (k + 1)),
      s"moved ${moved.length} of ${before.size}")
    // and the gated q213 aggregate equals this recompute exactly
    val r = Curation.queries("q213_reshard_movement")(spark, sfDir)
      .collect()(0)
    assert(r.getLong(0) == before.size.toLong && r.getLong(1) == moved.length.toLong)
    // mod-sharding for contrast: k -> k+1 moves nearly everything
    val modMoved = before.keys.count { id =>
      val h = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(id.toString).take(12), 16)
      h % k != h % (k + 1)
    }
    assert(moved.length * 4 < modMoved,
      s"HRW moved ${moved.length}, mod moved $modMoved — no advantage measured")
  }

  test("q210: the degree ceiling bounds per-customer pair fanout") {
    val r = Graph.queries("q210_copurchase_topk")(spark, sfDir).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    assert(r.nonEmpty && r.length <= Graph.CoTopN)
    // fully tie-broken descending order
    assert(r.toSeq == r.toSeq.sortBy(t => (-t._3, t._1, t._2)))
    // every pair's shared count is bounded by what capped customers can
    // contribute, and a JVM recompute over the capped table agrees
    val cs = graft.Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
      .join(graft.Tables.load(spark, sfDir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
      .distinct().as[(Long, Long)].collect()
    val byC = cs.groupBy(_._1).filter(_._2.length <= Graph.CoDegCap)
    val pairs = scala.collection.mutable.Map.empty[(Long, Long), Long]
      .withDefaultValue(0L)
    byC.values.foreach { es =>
      val sps = es.map(_._2).sorted
      for (i <- sps.indices; j <- i + 1 until sps.length)
        pairs((sps(i), sps(j))) += 1L
    }
    val expected = pairs.toSeq.map { case ((a, b), n) => (a, b, n) }
      .sortBy(t => (-t._3, t._1, t._2)).take(Graph.CoTopN)
    assert(r.toSeq == expected)
  }
}
