package graft.operators

import graft.Pinned._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Graph analytics over the order network — the relationship-shaped
  * workloads a training-data pipeline runs against its provenance graph
  * (who-bought-from-whom here; doc-cites-doc or page-links-page at work).
  *
  * The graph: an undirected bipartite customer↔supplier network, one edge
  * per distinct (o_custkey, l_suppkey) pair appearing in an order. Node ids
  * disambiguate the two key spaces arithmetically (customer c → 2c,
  * supplier s → 2s+1), so the whole graph lives in one BIGINT column pair —
  * no structs on the shuffle.
  *
  * INTEGER-EXACT iteration: PageRank's textbook form is float arithmetic,
  * whose cross-partition addition order makes distributed results
  * non-reproducible (and oracle-uncomparable). Both operators here run the
  * fixpoint in scaled integers — rank mass in units of 1e-12, every
  * division a floor division of non-negative operands (where Spark's `div`
  * and DuckDB's `//` agree bit-for-bit) — so a 1000-executor run, a
  * local[32] run, and the DuckDB oracle produce IDENTICAL ranks, not
  * merely close ones. Convergence loss from flooring is bounded by
  * #iterations × 1e-12 of rank mass: irrelevant at ranking granularity.
  *
  * Scale shape: the edge list is the only corpus-sized frame. It is built
  * once per (session, dir) — repartitioned by source node and lazily
  * checkpointed (the stage-boundary persist every iteration reuses, instead
  * of re-joining orders⋈lineitem per iteration) — and each iteration is ONE
  * edge-sized shuffle (the contribution groupBy); rank/degree state is
  * node-sized. That is exactly Pregel's superstep cost model expressed as
  * DataFrame plans, with Catalyst free to broadcast the node-sized side.
  */
object Graph {

  /** Rank mass scale: ranks are integers in units of SCALE⁻¹. */
  val Scale = 1000000000000L
  val PrIters = 3
  val PrTopN = 25
  val BfsHops = 3
  val HitsIters = 2
  val HitsTopN = 10

  /** q218 relaxation rounds (Bellman–Ford truncated at k hops). */
  val SsspIters = 4

  /** One lazily-checkpointed (src, dst) frame per (session, dir), both edge
    * directions materialized, partitioned by src so every iteration's
    * rank⋈edges join and contribution groupBy reuse the layout.
    *
    * COLD-BUILD shape (the round-13 q201 fix — the sf100 leg died in the
    * old build's scratch footprint, not its plan): ONE orders⋈lineitem
    * join, both edge directions emitted in the same pass (explode of a
    * 2-struct array — the old `distinct().unionByName(mirror)` planned
    * the join subtree under BOTH union branches and paid its sort twice),
    * then ONE repartition-by-src shuffle whose partition-local
    * `dropDuplicates` needs NO further exchange: HashPartitioning(src)
    * already clusters every (src, dst) duplicate into one partition, so
    * Catalyst plans the dedup aggregate inside the post-repartition
    * stage. Old ledger: join shuffle + distinct shuffle on (c, sp) +
    * repartition shuffle + deserialized-uncompressed checkpoint blocks.
    * New ledger: join shuffle + repartition shuffle + compressed
    * serialized blocks ([[graft.Pinned.PinOps.pinSer]]) — one
    * corpus-sized shuffle and one full materialization fewer, and the
    * memo's disk footprint ~3-4× smaller. */
  private val sharedEdges = graft.SessionMemo.ofFrames()

  /** Both-directions projection of one order↔supplier link — explode of a
    * two-struct array so the mirror direction costs a Generate, not a
    * second plan of the whole join subtree. */
  private def bothDirections(c: Column, sp: Column): Column =
    explode(array(
      struct(c.as("src"), sp.as("dst")),
      struct(sp.as("src"), c.as("dst"))))

  /** The raw (pre-dedup) doubled edge stream + the partition count its
    * consumers repartition to — shared by [[buildEdges]] /
    * [[buildWeightedEdges]].
    *
    * Partition pricing reads the UNPROJECTED table scans on purpose:
    * `dataPartitions`' contract is "one partition per 32 MB of compressed
    * input FILES", but plan statistics of a projected scan are scaled
    * down by the output-row-width ratio (2 of 9/16 columns ≈ 8× smaller)
    * — and the derived edge rows amplify back well past the pruned
    * estimate (key columns that RLE/delta-encode superbly in parquet
    * become 16-byte raw pairs, twice). Whole-file pricing keeps the
    * materialized memo near a measured ~80 MB/partition at every decade
    * (`DataPartitionsSpec` pins the ceiling); pruned pricing drifted to
    * ~8× that, per-partition bytes growing with exactly the corpus-
    * proportional shape the sf100 OOM came from. */
  private def linkedBoth(s: SparkSession, d: String): (DataFrame, Int) = {
    val n = TextFns.dataPartitions(
      Tables.load(s, d, "orders"), Tables.load(s, d, "lineitem"))
    val orders = Tables.load(s, d, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val items = Tables.load(s, d, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val both = orders
      .join(items, col("o_orderkey") === col("l_orderkey"))
      .select(bothDirections(
        col("o_custkey") * 2, col("l_suppkey") * 2 + 1).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    (both, n)
  }

  /** The un-memoized edge build — separated from [[edges]] so the
    * determinism spec can rebuild it under different partitionings
    * (the memo would otherwise serve the first layout forever). */
  private[operators] def buildEdges(s: SparkSession, d: String): DataFrame = {
    val (both, n) = linkedBoth(s, d)
    both.repartition(n, col("src"))
      .dropDuplicates("src", "dst")
      // layout-keeping pin (round 14): every src-keyed consumer — the
      // per-iteration rank⋈edges joins, the degree aggregate, the
      // census groupBys — plans against the memo's HashPartitioning(src)
      // instead of re-shuffling the corpus-sized edge list per action
      // (Spark's own checkpoint writes UnknownPartitioning —
      // PinnedLayoutSpec)
      .pinSerKeyed(false, "src")
  }

  /** Opt-in cross-session amortization of the edge build: when this conf
    * is `true` AND [[writeBucketedEdges]] has published the dir's edge
    * table, the graph family reads it instead of re-running the
    * orders⋈lineitem join. OFF by default — the oracle-gated queries
    * must never silently serve a stale table written against older
    * files. */
  val BucketedEdgesConf = "spark.graft.graph.bucketedEdges"

  /** Deterministic catalog name for dir `d`'s edge table
    * ([[BucketedMemo.tableName]]). */
  def bucketedEdgeTable(d: String): String =
    BucketedMemo.tableName("graft_edges", d)

  /** WRITE-ONCE side of the amortization: materialize the deduped
    * both-directions edge list as a parquet table BUCKETED AND SORTED BY
    * src, bucket count = the same whole-file pricing the in-session memo
    * uses. A bucketed scan reports HashPartitioning(src, n) to the
    * planner, so every later session's rank⋈edges join and contribution
    * groupBy start exchange-free — the 500 s sf100 edge build (q201's
    * cold-cost owner) is paid once per corpus version, not once per
    * session. On a real cluster this is the bucketed-table pattern over
    * HMS/Glue; locally BOTH halves are spec-pinned — the within-JVM
    * contract in `GraphBucketedSpec`, and the cross-JVM one in
    * `GraphBucketedXjvmSpec`, which forks two separate driver JVMs over
    * a Derby-backed Hive metastore: the second process resolves the
    * table through the persistent catalog, plans src-keyed work
    * exchange-free off the persisted bucketing spec, and bit-matches a
    * cold build. */
  def writeBucketedEdges(s: SparkSession, d: String): String = {
    val (both, n) = linkedBoth(s, d)
    val t = bucketedEdgeTable(d)
    both.repartition(n, col("src"))
      .dropDuplicates("src", "dst")
      .write.format("parquet").mode("overwrite")
      .bucketBy(n, "src").sortBy("src", "dst")
      .saveAsTable(t)
    // stamp the corpus fingerprint so an opted-in read over files that
    // changed since this write fails loudly instead of serving stale edges
    BucketedMemo.stampFingerprint(s, t, edgeInputs(d))
    t
  }

  /** The files the edge build reads — the fingerprint domain for the
    * bucketed table's staleness check. */
  private def edgeInputs(d: String): Seq[String] =
    Seq(s"$d/orders.parquet", s"$d/lineitem.parquet")

  /** The un-memoized read-or-build decision behind [[edges]], separated
    * so the bucketed-table spec can pin it: catalog table when opted in
    * and present, cold build otherwise. The bucketed read is NOT pinned —
    * its scan already carries the layout the iterations need, and
    * re-reading bucketed parquet per iteration is exactly the
    * storage-backed shape a multi-session cluster runs. */
  private[operators] def edgeSource(s: SparkSession, d: String): DataFrame =
    BucketedMemo.readOrBuild(s, BucketedEdgesConf, bucketedEdgeTable(d),
      edgeInputs(d))(buildEdges(s, d))

  private[operators] def edges(s: SparkSession, d: String): DataFrame =
    sharedEdges.getOrCompute(s, d)(edgeSource(s, d))

  private def kindOf(node: Column): Column =
    when(node % 2 === 0, lit("customer")).otherwise(lit("supplier"))

  /** Weighted (src, dst, w) twin of [[edges]] for q218: edge cost is the
    * INVERSE interaction strength, w = 1 + ⌊6 / n_links⌋ ∈ [1, 7] where
    * n_links = order⋈lineitem rows connecting the pair — frequently-traded
    * relationships are "close", one-off ones "far" (the affinity-distance
    * convention of co-occurrence graphs). Pure integers, so relaxed
    * distances are exact and partitioning-independent like every fixpoint
    * here. Same build/partition/checkpoint discipline as [[edges]]. */
  private val sharedWeightedEdges = graft.SessionMemo.ofFrames()

  /** Un-memoized weighted build, same single-shuffle shape as
    * [[buildEdges]]: each underlying order⋈lineitem link contributes one
    * row to EACH direction, so the post-repartition partition-local
    * count per (src, dst) IS n_links for that pair — the old
    * `groupBy(c, sp).count` shuffle folds into the repartition. */
  private[operators] def buildWeightedEdges(s: SparkSession, d: String): DataFrame = {
    val (both, n) = linkedBoth(s, d)
    both.repartition(n, col("src"))
      .groupBy(col("src"), col("dst"))
      .agg(count(lit(1)).as("n"))
      .select(col("src"), col("dst"), (lit(1L) + expr("6 div n")).as("w"))
      // PLAIN pin on purpose (A/B-measured round 14, re-measured round 16
      // after the per-round dist pin landed): the keyed pin drops the
      // per-round edge re-shuffle (6.2 MB vs 46.5 MB shuffle read) but
      // planning every round against the memo's fixed src layout costs
      // wall-clock (2.03 s vs 1.48 s min-of-3) — AQE's right-sizing of
      // the per-round join stages wins at bench scale. A cluster-scale
      // deployment whose rounds are shuffle-bound flips this to
      // pinSerKeyed(false, "src"); the unweighted edge memo keeps its
      // keyed pin because its census consumers measurably gain from it.
      .pinSer(false)
  }

  private[operators] def weightedEdges(s: SparkSession, d: String): DataFrame =
    sharedWeightedEdges.getOrCompute(s, d)(buildWeightedEdges(s, d))

  /** The q201 fixpoint over an arbitrary (src, dst) edge frame — factored
    * out so the streaming twin ([[graft.streaming.GraphRankStream]]) can
    * run the IDENTICAL plan against its incrementally-maintained edge
    * table. Deterministic for any edge frame: integer arithmetic end to
    * end, full tie-break on the top-N. */
  /** `hinted=false` drops the shuffle_hash pins so AQE plans the joins
    * (AqeGraphSkewSpec runs the planted-hub workload through both tiers
    * and proves identical bits — the integer fixpoint is plan-independent
    * by construction, which is exactly what makes the comparison valid). */
  private[graft] def pagerankOn(e: DataFrame, hinted: Boolean = true): DataFrame = {
    def h(df: DataFrame): DataFrame = if (hinted) df.hint("shuffle_hash") else df
    // node-sized, read by the initial ranks AND every iteration's rebuild
    // (PrIters+1 plan references): pin once instead of re-running the
    // edge-sized groupBy per reference
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("deg")).pin(false)
    val nn = deg.agg(count(lit(1)).as("n_nodes"))
    var r = deg.crossJoin(broadcast(nn))
      .select(col("src").as("node"), col("deg"),
        expr(s"$Scale div n_nodes").as("r"))
    (1 to PrIters).foreach { _ =>
      val contrib = h(r).join(e, col("node") === col("src"))
        .select(col("dst"), expr("r div deg").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("cin"))
      r = deg.crossJoin(broadcast(nn))
        .join(h(contrib), col("src") === col("dst"))
        .select(col("src").as("node"), col("deg"),
          expr(s"((15 * ($Scale div n_nodes)) div 100) + (85 * cin) div 100")
            .as("r"))
    }
    r.select(col("node").as("node_id"), kindOf(col("node")).as("kind"),
        col("r").as("rank"))
      .orderBy(col("rank").desc, col("node_id"))
      .limit(PrTopN)
  }


  /** The q208 fixpoint over an arbitrary DIRECTED (src=hub, dst=authority)
    * edge frame — factored out like [[pagerankOn]] so the streaming twin
    * can answer HITS over its incrementally-maintained pair table. */
  private[graft] def hitsOn(e: DataFrame): DataFrame = {
      var h = e.select(col("src").as("node")).distinct()
        .select(col("node"), lit(Scale).as("h"))
      var a: DataFrame = null
      // Round discipline (the CC-loop rule): each sweep's RAW aggregate is
      // checkpointed — both its consumers read one materialized node-sized
      // frame instead of re-running the edge join — and the PREVIOUS
      // round's checkpoints are released as soon as the frame that
      // supersedes them materializes. Without the release, every hitsOn
      // call (one per micro-batch in GraphRankStream.hits) pinned
      // 2×HitsIters node-sized RDDs until session end.
      //
      // The normalization max is FOLDED into the pin materialization
      // (r17): the pin is lazy and the 1-row max aggregate is the action
      // that materializes it, so the sweep's scalar arrives on the driver
      // from the SAME job that stores the blocks and rides back into the
      // rescale as a literal — where the eager pin + agg + broadcast
      // exchange paid three scheduling round-trips per side per sweep
      // (measured q208: 26 jobs -> see OPTIMIZATION_r17.md). A 1-row max
      // fetch is the same driver traffic the broadcast exchange's collect
      // paid; the arithmetic is unchanged (same decimal(38) product, same
      // integer div by the same exact max).
      var prevARaw: DataFrame = null
      var prevHRaw: DataFrame = null
      def maxOf(raw: DataFrame): Long = {
        val r = raw.agg(max(col("raw")).as("mx")).head()
        if (r.isNullAt(0)) 1L else r.getLong(0) // empty side: no rows to rescale anyway
      }
      (1 to HitsIters).foreach { _ =>
        val araw = h.hint("shuffle_hash").join(e, col("node") === col("src"))
          .groupBy(col("dst")).agg(sum(col("h")).as("raw"))
          .pin(false)
        val amax = maxOf(araw) // materializes araw's checkpoint
        // araw materialized ⇒ h (rooted at the previous hraw) is dead
        if (prevHRaw ne null) graft.FrameBlocks.release(prevHRaw)
        a = araw.select(col("dst").as("node"),
          expr(s"(cast(raw as decimal(38,0)) * $Scale) div ${amax}L").as("a"))
        val hraw = a.hint("shuffle_hash")
          .join(e.select(col("src"), col("dst").as("node")), "node")
          .groupBy(col("src")).agg(sum(col("a")).as("raw"))
          .pin(false)
        val hmax = maxOf(hraw) // materializes hraw's checkpoint
        // hraw materialized ⇒ the previous round's araw is dead (the
        // current araw still backs `a`, read by the final top-N)
        if (prevARaw ne null) graft.FrameBlocks.release(prevARaw)
        h = hraw.select(col("src").as("node"),
          expr(s"(cast(raw as decimal(38,0)) * $Scale) div ${hmax}L").as("h"))
        prevARaw = araw
        prevHRaw = hraw
      }
      val topAuth = a.orderBy(col("a").desc, col("node"))
        .limit(HitsTopN)
        .select(col("node").as("node_id"), lit("authority").as("role"),
          col("a").as("score"))
      val topHub = h.orderBy(col("h").desc, col("node"))
        .limit(HitsTopN)
        .select(col("node").as("node_id"), lit("hub").as("role"),
          col("h").as("score"))
      // Materialize the (≤ 2·HitsTopN row) answer as its OWN checkpoint so
      // the final round's node-sized frames release too; the returned
      // frame is LogicalRDD-rooted, so stream callers can retire it
      // through FrameBlocks like any other.
      val out = topAuth.unionByName(topHub).pin(true)
      graft.FrameBlocks.release(prevARaw)
      graft.FrameBlocks.release(prevHRaw)
      out
      }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- PageRank, integer-exact, 3 unrolled power iterations ---------------
    // r₀ = ⌊SCALE/N⌋ per node; each step r'(v) = ⌊15·⌊SCALE/N⌋/100⌋ +
    // ⌊85·Σ_{u→v}⌊r(u)/deg(u)⌋/100⌋ — damping 0.85, all floor divisions of
    // non-negative integers, so sums are order-independent and the result
    // is reproducible across any partitioning. No dangling-mass term is
    // needed: the graph is symmetric, so every node has out-degree ≥ 1.
    // Per iteration: one edge-sized join+groupBy (contributions) and one
    // node-sized join (teleport + damp); N rides along via a broadcast
    // 1-row aggregate, never a driver-side collect. The rank side carries a
    // shuffle_hash hint: the default sort-merge strategy would re-SORT the
    // (already src-partitioned, checkpointed) edge list on every iteration,
    // while a shuffle-hash join builds from the node-sized rank table and
    // STREAMS the edges — the Pregel-correct asymmetry at any scale.
    "q201_bipartite_pagerank" -> ((s, d) => pagerankOn(edges(s, d))),

    // --- HITS hubs & authorities, integer-exact -----------------------------
    // Kleinberg's HITS is bipartite-natural here: customers are pure hubs,
    // suppliers pure authorities, and the directed edge set is just the
    // (c → s) pair list (no symmetrization). Two unrolled rounds of
    //   a(s) = Σ_{c→s} h(c),  h(c) = Σ_{c→s} a(s)
    // with each side rescaled after its sweep to max = SCALE via one
    // integer floor division by the broadcast maximum — the normalization
    // HITS needs to converge, made exact (no float L2 norm whose partial
    // sums would be partition-order-dependent). Every sweep is one
    // edge-sized shuffle-hash join + groupBy; maxima are broadcast 1-row
    // aggregates; each side's frame is lazily checkpointed per round (the
    // BPE-ladder discipline) — raw and max both consume it, and without a
    // lineage cut every reuse would replay the whole upstream tree (the
    // first formulation planned 80 shuffles; this one plans ~16 with the
    // node-sized state materialized once per sweep). The rescale product
    // runs in DECIMAL(38) ≙ HUGEINT
    // (raw·SCALE reaches ~1e28 — past int64 — before the division brings
    // it back under SCALE). Output: top suppliers by authority and top customers by
    // hub score, fully tie-broken.
    "q208_hits" -> ((s, d) =>
      hitsOn(edges(s, d).filter(col("src") % 2 === 0))), // c → s direction only


    // --- BFS k-hop reachability census --------------------------------------
    // From the smallest customer node, 3 unrolled relaxation steps
    // (dist' = min(dist, 1 + dist of any in-neighbor)), then nodes per hop
    // count. The frontier frame is node-sized; each step is one edge join +
    // node groupBy — the as-at-scale shape for "how much of the graph is
    // within k hops of this seed" (contamination blast radius over a
    // citation graph). Unreached nodes are absent, not ∞ — the census
    // counts only reached hops.
    "q202_bfs_khop" -> ((s, d) => {
      val e = edges(s, d)
      // the frontier starts as the 1-row seed aggregate itself — deriving
      // it by filtering a distinct over all nodes would add a pointless
      // edge-sized shuffle to produce one row
      // lazily checkpointed: the relaxation lineage references dist twice
      // per level (union + expansion), so the seed subtree would otherwise
      // replay 2^BfsHops times
      var dist = e.agg(min(when(col("src") % 2 === 0, col("src"))).as("seed"))
        .filter(col("seed").isNotNull)
        .select(col("seed").as("node"), lit(0L).as("hops"))
        .pin(false)
      (1 to BfsHops).foreach { _ =>
        val nxt = dist.hint("shuffle_hash").join(e, col("node") === col("src"))
          .select(col("dst").as("node"), (col("hops") + 1).as("hops"))
        // pin each round (node-sized): round k's plan references round
        // k−1 TWICE (carry-over union + expansion join), so the unpinned
        // lineage duplicates the whole prefix per level — 2^k−1 planned
        // join subtrees (7 for 3 hops, measured 297 tasks / 32 MB
        // shuffled); with the per-round cut the plan is linear (one join
        // + one agg per hop, measured 87 tasks / 3.9 MB)
        dist = dist.select(col("node"), col("hops")).unionByName(nxt)
          .groupBy(col("node")).agg(min(col("hops")).as("hops"))
          .pin(false)
      }
      dist.groupBy(col("hops")).agg(count(lit(1)).as("n_nodes"))
    }),

    // --- weighted shortest paths (truncated Bellman–Ford) -------------------
    // q202's weighted sibling: distance as accumulated edge COST (inverse
    // interaction strength — see [[weightedEdges]]), SsspIters unrolled
    // min-plus relaxations from the same seed. Exactly the q202 plan per
    // round — one edge-sized shuffle-hash join (node-sized dist table
    // builds, checkpointed src-partitioned edges stream) + one node groupBy
    // min — with (dist + w) replacing (hops + 1); min over integers keeps
    // the fixpoint order-independent and hash-exact. After k rounds the
    // table holds the exact shortest distance among ≤ k-hop paths (the
    // Bellman–Ford invariant), which is the blast-radius-with-affinity
    // read. Census: nodes per (dist, kind) — distance histogram is
    // ≤ k·maxCost-bounded, never corpus-sized.
    "q218_weighted_sssp" -> ((s, d) => {
      val e = weightedEdges(s, d)
      var dist = e.agg(min(when(col("src") % 2 === 0, col("src"))).as("seed"))
        .filter(col("seed").isNotNull)
        .select(col("seed").as("node"), lit(0L).as("dist"))
        .pin(false)
      (1 to SsspIters).foreach { _ =>
        val nxt = dist.hint("shuffle_hash").join(e, col("node") === col("src"))
          .select(col("dst").as("node"), (col("dist") + col("w")).as("dist"))
        // per-round pin, same reason as q202: 4 unpinned rounds plan
        // 2^4−1 = 15 duplicated join subtrees (measured 180 tasks /
        // 81 MB shuffle read); pinned, one join + one agg per round
        dist = dist.select(col("node"), col("dist")).unionByName(nxt)
          .groupBy(col("node")).agg(min(col("dist")).as("dist"))
          .pin(false)
      }
      dist.groupBy(col("dist"), kindOf(col("node")).as("kind"))
        .agg(count(lit(1)).as("n_nodes"))
    }),

    // --- co-purchase supplier projection (df-bounded, top-K) ----------------
    // The bipartite→unipartite projection every co-occurrence graph build
    // needs (suppliers sharing customers here; docs sharing citations /
    // terms sharing contexts at work). The naive projection explodes: a
    // customer of degree d emits C(d,2) supplier pairs, so one hub
    // customer yields a quadratic blowup — the same failure mode as
    // popular shingles in containment dedup, and the same fix (the q78 df
    // ceiling): only customers with ≤ [[CoDegCap]] suppliers generate
    // pairs, bounding per-customer fanout at C(cap,2) rows REGARDLESS of
    // corpus size, while hub customers (a shared boilerplate signal, not
    // a similarity signal) are excluded by construction. One equi-join on
    // customer over the capped list, one hash agg, and a fully tie-broken
    // top-K — no window over the pair set.
    "q210_copurchase_topk" -> ((s, d) => {
      // cs/low stay UNPINNED on purpose (A/B-measured round 16): the plan
      // references cs 4× and low 2×, but runtime ReusedExchange dedups the
      // identical subtrees (8 jobs, 27 MB shuffle of which the reused
      // reads are re-fetches, not recomputes); explicit pins cut shuffle
      // to 16 MB but pay a 49 MB checkpoint write+read and measured
      // ~0.2-0.3 s SLOWER min-of-3 — the exchange files ARE the
      // materialization here.
      val cs = Tables.load(s, d, "orders")
        .select(col("o_orderkey"), col("o_custkey"))
        .join(Tables.load(s, d, "lineitem")
          .select(col("l_orderkey"), col("l_suppkey")),
          col("o_orderkey") === col("l_orderkey"))
        .select(col("o_custkey").as("c"), col("l_suppkey").as("sp"))
        .distinct()
      val low = cs.join(
        cs.groupBy(col("c")).agg(count(lit(1)).as("dg"))
          .filter(col("dg") <= CoDegCap).select(col("c")),
        Seq("c"))
      low.select(col("c"), col("sp").as("s1"))
        .join(low.select(col("c"), col("sp").as("s2")), Seq("c"))
        .filter(col("s1") < col("s2"))
        .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n_shared"))
        .orderBy(col("n_shared").desc, col("s1"), col("s2")).limit(CoTopN)
    })
  )

  /** Co-purchase projection dials: customer-degree ceiling (the df-ceiling
    * discipline) and the fully-tie-broken result cut. */
  val CoDegCap = 24
  val CoTopN = 50

  // ---------------------------------------------------------------------------
  // DuckDB oracles — the identical integer fixpoints, unrolled as CTEs.
  // ---------------------------------------------------------------------------

  private def oPre(): String =
    s"""WITH pairs AS MATERIALIZED (
       |               SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS sp
       |               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
       |e AS MATERIALIZED (SELECT c AS src, sp AS dst FROM pairs
       |      UNION ALL SELECT sp AS src, c AS dst FROM pairs),
       |deg AS MATERIALIZED (SELECT src, COUNT(1) AS deg FROM e GROUP BY 1),
       |nn AS (SELECT COUNT(1) AS n FROM deg)""".stripMargin

  private def oPrIter(i: Int): String =
    s""",
       |c$i AS (SELECT e.dst AS node, SUM(r${i - 1}.r // r${i - 1}.deg) AS cin
       |        FROM r${i - 1} JOIN e ON r${i - 1}.node = e.src GROUP BY 1),
       |r$i AS (SELECT d.src AS node, d.deg,
       |          ((15 * ($Scale // n)) // 100) + (85 * c$i.cin) // 100 AS r
       |        FROM deg d JOIN c$i ON d.src = c$i.node CROSS JOIN nn)""".stripMargin

  private def oBfsIter(i: Int): String =
    s""",
       |d$i AS (SELECT node, MIN(hops) AS hops FROM (
       |    SELECT node, hops FROM d${i - 1}
       |    UNION ALL SELECT e.dst AS node, d${i - 1}.hops + 1 AS hops
       |    FROM d${i - 1} JOIN e ON d${i - 1}.node = e.src) GROUP BY 1)""".stripMargin

  // MATERIALIZED: DuckDB inlines plain CTEs per reference, and each sweep
  // references its raw aggregate twice (the max subquery and the rescale) —
  // un-materialized, the ladder re-expands exponentially in rounds and the
  // sf1 oracle run never finishes (the q178 BPE-oracle lesson applied here).
  private def oHitsIter(i: Int): String =
    s""",
       |ar$i AS MATERIALIZED (SELECT e.dst, SUM(h${i - 1}.h) AS raw
       |         FROM h${i - 1} JOIN e ON h${i - 1}.node = e.src GROUP BY 1),
       |a$i AS MATERIALIZED (SELECT dst AS node,
       |          CAST((CAST(raw AS HUGEINT) * $Scale)
       |               // (SELECT MAX(raw) FROM ar$i) AS BIGINT) AS a
       |        FROM ar$i),
       |hr$i AS MATERIALIZED (SELECT e.src, SUM(a$i.a) AS raw
       |         FROM a$i JOIN e ON a$i.node = e.dst GROUP BY 1),
       |h$i AS MATERIALIZED (SELECT src AS node,
       |          CAST((CAST(raw AS HUGEINT) * $Scale)
       |               // (SELECT MAX(raw) FROM hr$i) AS BIGINT) AS h
       |        FROM hr$i)""".stripMargin

  private def oSsspIter(i: Int): String =
    s""",
       |w$i AS (SELECT node, MIN(dist) AS dist FROM (
       |    SELECT node, dist FROM w${i - 1}
       |    UNION ALL SELECT e.dst AS node, w${i - 1}.dist + e.w AS dist
       |    FROM w${i - 1} JOIN e ON w${i - 1}.node = e.src) GROUP BY 1)""".stripMargin

  val oracles: Map[String, String] = Map(

    "q218_weighted_sssp" ->
      (s"""WITH wp AS MATERIALIZED (
          |      SELECT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS sp,
          |        1 + 6 // COUNT(1) AS w
          |      FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          |      GROUP BY 1, 2),
          |e AS MATERIALIZED (SELECT c AS src, sp AS dst, w FROM wp
          |      UNION ALL SELECT sp AS src, c AS dst, w FROM wp),
          |s AS (SELECT MIN(c) AS seed FROM wp),
          |w0 AS (SELECT seed AS node, CAST(0 AS BIGINT) AS dist FROM s)""".stripMargin +
        (1 to SsspIters).map(oSsspIter).mkString +
        s"""
           |SELECT dist,
           |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  COUNT(1) AS n_nodes
           |FROM w$SsspIters GROUP BY 1, 2""".stripMargin),

    "q208_hits" ->
      (s"""WITH pairs AS MATERIALIZED (
          |               SELECT DISTINCT 2 * o_custkey AS c, 2 * l_suppkey + 1 AS sp
          |               FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
          |e AS MATERIALIZED (SELECT c AS src, sp AS dst FROM pairs),
          |h0 AS MATERIALIZED (
          |      SELECT DISTINCT src AS node, CAST($Scale AS BIGINT) AS h FROM e)""".stripMargin +
        (1 to HitsIters).map(oHitsIter).mkString +
        s"""
           |SELECT * FROM (
           |  SELECT node AS node_id, 'authority' AS role, a AS score
           |  FROM a$HitsIters ORDER BY a DESC, node LIMIT $HitsTopN)
           |UNION ALL
           |SELECT * FROM (
           |  SELECT node AS node_id, 'hub' AS role, h AS score
           |  FROM h$HitsIters ORDER BY h DESC, node LIMIT $HitsTopN)""".stripMargin),

    "q201_bipartite_pagerank" ->
      (oPre() +
        s""",
           |r0 AS (SELECT src AS node, deg, $Scale // n AS r
           |       FROM deg CROSS JOIN nn)""".stripMargin +
        (1 to PrIters).map(oPrIter).mkString +
        s"""
           |SELECT node AS node_id,
           |  CASE WHEN node % 2 = 0 THEN 'customer' ELSE 'supplier' END AS kind,
           |  CAST(r AS BIGINT) AS rank
           |FROM r$PrIters ORDER BY rank DESC, node_id LIMIT $PrTopN""".stripMargin),

    "q202_bfs_khop" ->
      (oPre() +
        s""",
           |s AS (SELECT MIN(c) AS seed FROM pairs),
           |d0 AS (SELECT seed AS node, CAST(0 AS BIGINT) AS hops FROM s)""".stripMargin +
        (1 to BfsHops).map(oBfsIter).mkString +
        s"""
           |SELECT hops, COUNT(1) AS n_nodes FROM d$BfsHops GROUP BY 1""".stripMargin),

    "q210_copurchase_topk" ->
      s"""WITH cs AS (SELECT DISTINCT o_custkey AS c, l_suppkey AS sp
            |            FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
            |deg AS (SELECT c, count(*) AS dg FROM cs GROUP BY c),
            |low AS (SELECT cs.c, cs.sp FROM cs JOIN deg USING (c)
            |        WHERE dg <= $CoDegCap),
            |p AS (SELECT a.sp AS s1, b.sp AS s2, count(*) AS n_shared
            |      FROM low a JOIN low b ON a.c = b.c AND a.sp < b.sp
            |      GROUP BY 1, 2)
            |SELECT s1, s2, n_shared FROM p
            |ORDER BY n_shared DESC, s1, s2 LIMIT $CoTopN""".stripMargin
  )
}
