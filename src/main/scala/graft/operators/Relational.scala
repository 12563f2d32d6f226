package graft.operators

import graft.Pinned._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

import graft.Tables

/** Relational operator catalog (SURVEY.md §2B): the standard-catalog
  * operators the reference lacks, expressed as thin declarative DataFrame
  * plans so Catalyst supplies pushdown / pruning / join selection /
  * whole-stage codegen. Every query here is paired with an ANSI-SQL oracle
  * (DuckDB) in [[oracles]].
  *
  * Determinism-for-oracle notes:
  *  - All "money" doubles in the testdata are exactly 2-decimal, so sums are
  *    computed over DECIMAL(18,2) (exact, order-independent) and cast back to
  *    double — bit-identical between Spark and DuckDB regardless of
  *    aggregation order. Raw double SUMs would be order-dependent.
  *  - Top-k / window-rank queries always order with a unique tie-break key.
  */
object Relational {

  private def t(s: SparkSession, d: String, name: String): DataFrame =
    Tables.load(s, d, name)

  /** Exact order-independent sum of a 2-decimal double column. */
  private def dsum(c: Column): Column = sum(c.cast(DecimalType(18, 2))).cast("double")

  /** q118 PageRank: integer mass scale and unrolled iteration count. */
  val PrScale = 1000000000000L
  val PrIters = 3

  /** Buckets per group for [[histCumulative]]'s two-level decomposition —
    * the deploy dial, exactly like q211's hex-prefix length: more buckets
    * = more within-group parallelism, a longer (but still tiny) spine. */
  val HistBuckets = 256

  /** Adaptive ceiling for [[histCumulative]]: a histogram at or under this
    * many TOTAL (group, value) rows takes the single-window shape instead
    * of the bucket decomposition. Rationale (measured, round 12): the
    * decomposition costs a FIXED ~0.5–1 s of plan depth (spine + probe
    * joins, ~7 AQE stage boundaries, 3 broadcasts) that is pure overhead
    * when the whole domain fits one comfortable sort task anyway — a ≤1M-row
    * histogram sorts in ~100 ms in ONE task, while the sf0.1 walks paid
    * 0.13→1.33 s (q91) / 0.18→2.07 s (q186) for a ceiling they were nowhere
    * near. Total rows bound the largest group's domain from above, so the
    * switch is safe by construction; past the ceiling the bucketed shape
    * takes over and the 100 TB wide-domain argument (SCALE.md round 12 §4)
    * applies unchanged. Overridable per session via
    * `spark.graft.hist.adaptiveMax` (0 forces bucketed everywhere — the
    * equivalence spec uses this; a huge value forces windowed). */
  val HistAdaptiveConf = "spark.graft.hist.adaptiveMax"
  val HistAdaptiveMax = 1L << 20

  /** Two-level cumulative counts over the DISTINCT values of each group —
    * the q211 bucket + offset-spine shape applied to the histogram walk.
    * Input `hist` must be (groupCol, valueCol: integral, cnt) with one row
    * per (group, value); output is `hist` plus (cum, n), where cum is the
    * ascending (nulls last) running count and n the group total.
    *
    * The single-level form (one window PARTITION BY group ORDER BY value)
    * puts ALL distinct values of a group in ONE task — value-domain-bounded,
    * but a bound that grows with the domain, not the cluster (q128's cents
    * domain at 100× is a single-task sort again). Here each value maps to
    * one of [[HistBuckets]] equal-width buckets over the group's own
    * [min, max] — an order-preserving integer map, so bucket order ==
    * value-order prefix and cross-bucket ties are impossible (the q211
    * argument); bucket offsets come from a (groups × ≤257)-row spine
    * prefix sum, and the within-bucket running counts are windows
    * PARTITIONED by (group, bucket) — HistBuckets-way parallel inside
    * every group. All bucket arithmetic is exact (DECIMAL(38,0)
    * subtraction dodges long overflow on extreme ranges; `div` is integral).
    *
    * `hist` has three consumers (bounds, spine, the within pass) and is
    * corpus-aggregation-priced to recompute, so it is pinned —
    * materialized once, value-domain-bounded in size, fault tolerance per
    * the [[graft.Pinned]] mode dial. The pin also funds the ADAPTIVE
    * switch: a `count()` on the materialized frame is one cheap job, and
    * when the whole histogram is at or under [[HistAdaptiveMax]] rows the
    * single-window shape wins outright (the count rides inside the bench's
    * timed region — construction and action are timed together). Both
    * shapes are spec-pinned equal (`HistCumulativeSpec`), so the switch can
    * never change a result, only a plan. */
  private[operators] def histCumulative(hist0: DataFrame, groupCol: String,
                                        valueCol: String): DataFrame = {
    // an input the CALLER already pinned (LogicalRDD root — q169 shares
    // one materialized histogram across two walks and its final agg) must
    // not be re-checkpointed: a pin of a pin is a full row copy for
    // nothing
    val hist = hist0.queryExecution.analyzed match {
      case _: org.apache.spark.sql.execution.LogicalRDD => hist0
      case _ => hist0.pin(false)
    }
    val v = col(valueCol)
    val adaptiveMax = hist0.sparkSession.conf.getOption(HistAdaptiveConf)
      .map(_.toLong).getOrElse(HistAdaptiveMax)
    // adaptiveMax <= 0 is the absolute force-bucketed override: skip the
    // probe count entirely (the dial's contract is "bucketed everywhere",
    // which must not cost a count job per call — and an EMPTY histogram
    // must not sneak into the windowed branch through 0 <= 0)
    if (adaptiveMax > 0 && hist.count() <= adaptiveMax) {
      // Small domain: one window pass, largest task ≤ total histogram rows.
      // Column order matches the bucketed branch (hist.*, n, cum).
      val wCum = Window.partitionBy(col(groupCol)).orderBy(v.asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col(groupCol))
      return hist.select(col("*"),
        sum(col("cnt")).over(wAll).as("n"),
        sum(col("cnt")).over(wCum).as("cum"))
    }
    val bounds = hist.groupBy(col(groupCol))
      .agg(min(v).as("_vmin"), max(v).as("_vmax"))
    // nulls land in a dedicated LAST bucket (asc_nulls_last semantics: the
    // oracle's ASC default is NULLS LAST); a histogram has at most one
    // null row per group, so its within-bucket window is a 1-row task
    // ALL-LONG bucket arithmetic: the obvious DECIMAL(38,0) formulation
    // costs ~4.5µs/row in boxed BigDecimal ops (measured: 0.67 s per
    // 148k-row pass — 2× per query since the bucketed side is built for
    // both the spine and the probe). Longs codegen to primitive ops; the
    // one hazard is (vmax − vmin) wrapping when the domain spans more
    // than a signed long (vmin<0 ≤ vmax, detectable as a negative
    // difference), where both operands shift right 8 bits first — still
    // order-preserving (arithmetic shift is monotone), still exact long
    // math, just a ≤256×-coarser width floor that only that extreme
    // domain pays.
    val widthOf = (range: String) => s"(($range div $HistBuckets) + 1)"
    val wraps = "(_vmax >= 0 AND _vmin < 0 AND (_vmax - _vmin) < 0)"
    val bucket = when(v.isNull, lit(HistBuckets.toLong))
      .otherwise(expr(
        s"""CASE WHEN $wraps
              THEN (shiftright($valueCol, 8) - shiftright(_vmin, 8))
                   div ${widthOf("(shiftright(_vmax, 8) - shiftright(_vmin, 8))")}
              ELSE ($valueCol - _vmin) div ${widthOf("(_vmax - _vmin)")}
            END"""))
    // null-SAFE group joins: a null group key is a legal groupBy output
    // and must not vanish through an equi-join
    val withB = hist.as("h")
      .join(broadcast(bounds).as("b"),
        col(s"h.$groupCol") <=> col(s"b.$groupCol"))
      .select(col("h.*"), bucket.as("_bkt"))
    val wSpine = Window.partitionBy(col(groupCol)).orderBy(col("_bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wGroup = Window.partitionBy(col(groupCol))
    val offs = withB.groupBy(col(groupCol), col("_bkt"))
      .agg(sum(col("cnt")).as("_bc"))
      .select(col(groupCol), col("_bkt"),
        (sum(col("_bc")).over(wSpine) - col("_bc")).as("_off"),
        sum(col("_bc")).over(wGroup).as("n"))
    val wIn = Window.partitionBy(col(groupCol), col("_bkt"))
      .orderBy(v.asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    withB.as("x")
      .join(broadcast(offs).as("o"),
        col(s"x.$groupCol") <=> col(s"o.$groupCol")
          && col("x._bkt") === col("o._bkt"))
      .select(col("x.*"), col("o._off"), col("o.n"))
      .withColumn("cum", col("_off") + sum(col("cnt")).over(wIn))
      .drop("_bkt", "_off")
  }

  /** Histogram rank walk shared by q91 (median), q95 (winsorize cuts),
    * q169 (MAD), q186 (percentile_cont), q207 (RFM) and the TextAnalysis
    * quantile queries: cumulative counts over the DISTINCT values of each
    * group — never a row-level sort, and via [[histCumulative]] never a
    * whole group's value domain in one task — then, for every requested
    * rank expression over the group total `n`, the smallest value whose
    * cumulative count reaches it. `hist` must be (groupCol, valueCol, cnt).
    *
    * NULL semantics (oracle-matched): nulls sort last, so every non-null
    * cum count is identical in both engines, and a rank landing in the
    * null tail yields NULL in both (MIN skips nulls on each side). */
  private[operators] def histRankWalk(hist: DataFrame, groupCol: String,
                                      valueCol: String,
                                      ranks: Seq[(String, String)]): DataFrame = {
    val cum = histCumulative(hist, groupCol, valueCol)
    val rankCols = ranks.map { case (name, rankExpr) =>
      min(when(col("cum") >= expr(rankExpr), col(valueCol))).as(name)
    }
    cum.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), rankCols: _*)
  }
  /** Exact-numerator average (double division of exact decimal sum). */
  private def davg(c: Column): Column = dsum(c) / count(c)
  private def oSum(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE)"
  private def oAvg(c: String) = s"CAST(SUM(CAST($c AS DECIMAL(18,2))) AS DOUBLE) / COUNT($c)"

  /** Session gap shared by q25 and q49 — ONE constant feeds the Spark
    * `session_window` calls and the oracle's gaps-and-islands CTE so the
    * two queries can never disagree about what a session is. */
  private val SessionGapHours = 12
  val SessionGap = s"$SessionGapHours hours"
  private val oSessionIslands =
    s"""m AS (
         SELECT user_id, ts, value,
           CASE WHEN LAG(ts) OVER w IS NULL
                 OR ts - LAG(ts) OVER w >= INTERVAL $SessionGapHours HOUR
                THEN 1 ELSE 0 END AS new_s
         FROM events
         WINDOW w AS (PARTITION BY user_id ORDER BY ts)),
       s AS (
         SELECT *, SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                     ROWS UNBOUNDED PRECEDING) AS sid
         FROM m)"""

  /** Staleness horizon for the q152 tolerance as-of join: 72 hours in
    * microseconds. The testdata's calibration-age median is ~150 h, so
    * this splits matched vs stale roughly 1:2 — both classes populated at
    * every SF. */
  val AsofToleranceUs: Long = 72L * 3600 * 1000000

  /** Sub-partitions a hot key scatters into for the q158 salted join.
    * Sized like a skew split factor: large enough that the hottest key's
    * per-reducer share drops below the median partition, small enough
    * that hot-dim replication (|hot| × S) stays broadcast-trivial. */
  val SaltBuckets: Int = 8

  /** q219 compaction target: rewrite bins aim at this many chars (≙ bytes
    * on the ASCII corpus; a deployment sets ~128 MB — here sized so the
    * testdata manifest genuinely packs several files per bin at every SF). */
  val CompactTargetBytes: Long = 2048L

  /** q223 Poisson-bootstrap replicas. 64 keeps the per-group window at a
    * constant 64 rows while the tail order statistics (rank 2 / rank 63)
    * sit near the conventional 95% band. */
  val BootReplicas = 64

  /** ⌊CDF_Poisson(1)(k)·2^16⌋ for k = 0..7 — the integer thresholds each
    * md5-derived 16-bit uniform walks to become a Poisson(1) bootstrap
    * weight (weights above 8 saturate; the 2^-16 CDF quantization is
    * orders of magnitude below the B=64 resampling error). The SAME
    * literals are interpolated into the Spark plan and the DuckDB oracle,
    * so replica weights are bit-identical across engines by construction —
    * no libm, no RNG state, no float CDF. 16 bits is deliberate: one md5
    * (128 bits) yields EIGHT replica uniforms, so the hash bill is B/8
    * md5s per row, not B. */
  val PoissonCdf16: Seq[Long] =
    Seq(24109L, 48218L, 60273L, 64291L, 65296L, 65497L, 65530L, 65535L)

  /** q224 burst rule: today beats BurstFactor× its trailing-week daily
    * average (7·n > BurstFactor·weekly_sum) and clears an absolute floor
    * (tiny cells can trip any ratio test). */
  val BurstFactor = 3L
  val MinBurstCount = 3L

  /** q230 CUSUM dials, in micro-cents of daily mean: the allowance (the
    * drift the chart deliberately ignores — ~0.4× the corpus's mean
    * absolute daily deviation) and the alarm threshold (~3×). Both
    * verdicts occur at every test SF under these dials. */
  val CusumAllowanceU = 500000L
  val CusumThresholdU = 4000000L

  /** Per-user_id mergeable aggregate state (q146): count, exact decimal
    * sum, min, max — the four partials every downstream read (including
    * avg) derives from. Mergeable BY CONSTRUCTION: count/sum re-sum,
    * min/max re-extremize, and the decimal sum is exact so merge order
    * can't drift a bit. */
  def aggPartials(ev: DataFrame): DataFrame =
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(DecimalType(18, 2))).as("vsum"),
        min(col("value")).as("vmin"), max(col("value")).as("vmax"))

  /** The MV refresh contract (q146): fold any number of [[aggPartials]]
    * frames into the read-time schema. Cost is #keys-sized — the base
    * corpus is never rescanned. */
  def mergeAggPartials(partials: DataFrame*): DataFrame =
    partials.reduce(_ unionByName _)
      .groupBy(col("user_id"))
      .agg(sum(col("n")).as("n_events"), sum(col("vsum")).as("vs"),
        min(col("vmin")).as("v_min"), max(col("vmax")).as("v_max"))
      .select(col("user_id"), col("n_events"),
        col("vs").cast("double").as("v_sum"),
        col("v_min"), col("v_max"),
        (col("vs").cast("double") / col("n_events")).as("v_avg"))

  /** One leg of the q154 referential-integrity audit: orphan statistics
    * for a single FK edge (SQL MATCH SIMPLE semantics — a NULL child key
    * is never a violation). Public so the spec can inject corrupted child
    * rows and prove the audit actually detects them. */
  def fkOrphanEdge(name: String, child: DataFrame, ck: String,
                   parent: DataFrame, pk: String, bcast: Boolean): DataFrame = {
    val pkeys0 = parent.select(col(pk).cast("long").as("__pk")).distinct()
    val pkeys = if (bcast) broadcast(pkeys0) else pkeys0
    child.select(col(ck).cast("long").as("__ck"))
      .join(pkeys, col("__ck") === col("__pk"), "left")
      .agg(count(lit(1)).as("child_rows"),
        count(when(col("__pk").isNull && col("__ck").isNotNull, lit(1)))
          .as("orphan_rows"),
        countDistinct(when(col("__pk").isNull, col("__ck")))
          .as("orphan_keys"))
      .select(lit(name).as("edge"), col("child_rows"),
        col("orphan_rows"), col("orphan_keys"))
  }

  /** Golden-record survivorship body (see the q130 map entry): input must
    * carry (user_id, ts, event_id, event_type, value). */
  def goldenRecord(base: DataFrame): DataFrame = {
    val wd = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val wdFull = wd.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    val last = base
      .withColumn("rn", row_number().over(wd))
      .withColumn("lv", first(col("value"), ignoreNulls = true).over(wdFull))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("ts").as("last_ts"),
        col("event_type").as("last_event_type"), col("lv").as("last_value"))
    val agg = base.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"), min(col("ts")).as("first_ts"))
    val modal = base.groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("cnt"))
      .withColumn("rn", row_number().over(Window.partitionBy(col("user_id"))
        .orderBy(col("cnt").desc, col("event_type"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("modal_event_type"))
    agg.join(last, Seq("user_id")).join(modal, Seq("user_id"))
  }

  /** (xa, xb) 10-bit binned layout dims of lineitem — shared by the
    * q125/q189/q195 layout family. */
  private def layoutBinned(s: SparkSession, d: String): DataFrame = {
    val dims = t(s, d, "lineitem")
      .select(col("l_orderkey").as("a"), col("l_partkey").as("b"))
    val bounds = dims.agg(
      min(col("a")).as("amin"), max(col("a")).as("amax"),
      min(col("b")).as("bmin"), max(col("b")).as("bmax"))
    // Pure int64 binning (floor division; operands non-negative). Exact twin
    // of the oracle's HUGEINT `//` whenever (v-lo)*1024 fits in int64 — true
    // up to keys ~9e15, i.e. far past the 100 TB key range (sf100k orderkeys
    // are ~6e14). The previous decimal(38) formulation was bit-identical but
    // cost ~2 s/600k rows at sf0.1 — decimal multiply/div per row is the
    // whole layout family's hot loop; long arithmetic is ~40× cheaper.
    def bin(v: String, lo: String, hi: String) =
      least(lit(1023L), expr(s"(($v - $lo) * 1024) div ($hi - $lo + 1)"))
    dims.join(broadcast(bounds))
      .select(bin("a", "amin", "amax").as("xa"),
        bin("b", "bmin", "bmax").as("xb"))
  }

  /** Per-row Morton/z code over [[layoutBinned]] — (xa, xb, code). */
  private def zorderCoded(s: SparkSession, d: String): DataFrame = {
    val z = (0 until 10).map(k =>
        shiftleft(shiftright(col("xa"), k).bitwiseAND(lit(1L)), 2 * k) +
          shiftleft(shiftright(col("xb"), k).bitwiseAND(lit(1L)), 2 * k + 1))
      .reduce(_ + _)
    layoutBinned(s, d).select(col("xa"), col("xb"), z.as("code"))
  }

  /** Per-row Hilbert code over [[layoutBinned]] — (xa, xb, code). The walk
    * is the native codegen'd [[graft.functions.HilbertIndex]] Expression
    * (one 10-iteration rotate/flip loop per row), bit-identical to the
    * unrolled Column-tree formulation it replaced (pinned by
    * `RelationalSpec`'s "native graft_hilbert == unrolled SQL" test). */
  private def hilbertCoded(s: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(s)
    layoutBinned(s, d).select(col("xa"), col("xb"),
      call_function("graft_hilbert", col("xa"), col("xb"), lit(10)).as("code"))
  }

  /** Spec access to [[hilbertCoded]] (private otherwise). */
  private[operators] def hilbertCodedForSpec(s: SparkSession, d: String): DataFrame =
    hilbertCoded(s, d)

  /** Spec access to [[zorderCoded]] / [[layoutBinned]]. */
  private[operators] def zorderCodedForSpec(s: SparkSession, d: String): DataFrame =
    zorderCoded(s, d)

  /** Materializes a coded frame CLUSTERED by `code` — `files`
    * range-partitions, rows sorted by code within each — and returns the
    * read-back. This is the actual 100 TB deliverable behind the
    * q125/q189/q195 in-memory audits: with the curve code as the table's
    * physical order, each parquet file/row-group carries tight (xa, xb)
    * min/max zone maps, so a 2-D range predicate prunes whole files at scan
    * time instead of reading the corpus (`ClusteredLayoutSpec` measures the
    * skipping against a lexicographic layout via scan-node metrics).
    * The write path is `repartitionByRange` (one skew-aware range shuffle —
    * the same shape Delta/Iceberg `OPTIMIZE ZORDER BY` runs) + per-partition
    * sort. The output dir carries a full input-dir digest plus a
    * process+session-unique component, and the (eager) write is memoized
    * per (session, tag, dir): concurrent JVMs/sessions can never clobber
    * each other's files, and a re-run within a session returns the SAME
    * read-back frame instead of overwriting parquet a previously returned
    * frame is still lazily reading. */
  private val clusteredMemo = graft.SessionMemo.ofFrames()
  private val rfmCustMemo = graft.SessionMemo.ofFrames()
  private val jvmTag = java.util.UUID.randomUUID().toString.take(8)

  // Per-JVM-unique dirs would otherwise accumulate in tmpdir across runs
  // (the price of never clobbering another process's files): every dir
  // this JVM creates is deleted by one shutdown hook.
  private val clusteredDirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
  locally {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      clusteredDirs.forEach { dir =>
        org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
        ()
      }
    }))
  }

  private[operators] def clusteredRoundtrip(s: SparkSession, d: String,
      coded: => DataFrame, tag: String, files: Int): DataFrame =
    clusteredMemo.getOrCompute(s, s"clustered|$tag|$files|$d") {
      // EVERY memo-key component is also in the dir name — two live memo
      // entries can never resolve to the same path, so no overwrite can
      // happen under a frame another entry still lazily reads
      val out = new java.io.File(sys.props("java.io.tmpdir"),
        s"graft_clustered_${tag}_${files}_${TextFns.md5hex(d).take(12)}_" +
          s"${jvmTag}_s" +
          java.lang.Integer.toHexString(System.identityHashCode(s))).getAbsolutePath
      clusteredDirs.add(out)
      coded.repartitionByRange(files, col("code"))
        .sortWithinPartitions(col("code"))
        .write.mode("overwrite").parquet(out)
      s.read.parquet(out)
    }

  /** The pre-r8 unrolled Column-tree Hilbert walk, kept as the spec twin
    * that pins [[hilbertCoded]]'s native Expression bit-for-bit. */
  private[operators] def hilbertCodedUnrolled(s: SparkSession, d: String): DataFrame = {
    var cur = layoutBinned(s, d).select(col("xa"), col("xb"),
      col("xa").as("hx"), col("xb").as("hy"), lit(0L).as("hd"))
    (9 to 0 by -1).foreach { k =>
      val sv = 1L << k
      val rx = shiftright(col("hx"), k).bitwiseAND(lit(1L))
      val ry = shiftright(col("hy"), k).bitwiseAND(lit(1L))
      cur = cur.select(col("xa"), col("xb"),
        when(ry === 0, when(rx === 1, lit(1023L) - col("hy"))
          .otherwise(col("hy"))).otherwise(col("hx")).as("hx"),
        when(ry === 0, when(rx === 1, lit(1023L) - col("hx"))
          .otherwise(col("hx"))).otherwise(col("hy")).as("hy"),
        (col("hd") + lit(sv * sv) * (rx * 3).bitwiseXOR(ry)).as("hd"))
    }
    cur.select(col("xa"), col("xb"), col("hd").as("code"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- scans / filter / projection (pushdown-verified in RelationalSpec) --
    "q01_filter_project" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") < lit("1995-06-01").cast("timestamp") &&
                col("l_quantity") > 25 && col("l_discount") <= 0.05)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
                col("l_extendedprice"))),

    // --- hash aggregation, partial+final (TPC-H Q1 shape) ------------------
    "q02_agg_groupby" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          dsum(col("l_quantity")).as("sum_qty"),
          dsum(col("l_extendedprice")).as("sum_base_price"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
              (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
            .cast("double").as("sum_disc_price"),
          davg(col("l_quantity")).as("avg_qty"),
          davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))),

    // --- broadcast hash join (small dim × big fact) -------------------------
    "q03_join_broadcast" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n_items"),
             dsum(col("l_quantity")).as("sum_qty"))),

    // --- shuffle hash/SMJ join --------------------------------------------
    "q04_join_shuffle" -> ((s, d) =>
      t(s, d, "orders")
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("sum_price"))),

    // --- multi-way join through the star schema (TPC-H Q5 shape) -----------
    "q05_multi_join" -> ((s, d) =>
      t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "nation")), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(t(s, d, "region")), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(col("l_extendedprice").cast(DecimalType(18, 2)) *
                 (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))))
               .cast("double").as("revenue"),
             count(lit(1)).as("n_items"))),

    // --- left semi join (EXISTS) --------------------------------------------
    "q06_semi_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_totalprice") > 450000),
              col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))),

    // --- left anti join (NOT EXISTS) ----------------------------------------
    "q07_anti_join" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders").filter(col("o_orderdate") >= lit("1998-01-01").cast("timestamp")),
              col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))),

    // --- left outer join + agg (count preserves 0-order customers) ----------
    "q08_outer_join_agg" -> ((s, d) =>
      t(s, d, "customer")
        .join(t(s, d, "orders"), col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"), col("c_name"))
        .agg(count(col("o_orderkey")).as("n_orders"))),

    // --- distinct aggregation ------------------------------------------------
    "q09_distinct_agg" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(countDistinct(col("l_partkey")).as("n_parts"),
             countDistinct(col("l_suppkey")).as("n_supps"),
             count(lit(1)).as("n_rows"))),

    // --- rollup ---------------------------------------------------------------
    "q10_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(dsum(col("l_quantity")).as("sum_qty"),
             count(lit(1)).as("n_rows"))),

    // --- cube -------------------------------------------------------------------
    "q11_cube" -> ((s, d) =>
      t(s, d, "orders")
        .cube(col("o_orderstatus"), col("o_orderpriority"))
        .agg(count(lit(1)).as("n_orders"),
             dsum(col("o_totalprice")).as("sum_price"))),

    // --- ranking window functions (top-3 per group, unique tie-break) ----------
    // Salted two-level formulation: l_returnflag has only 3 values, so a
    // naive partitionBy(l_returnflag) sorts the whole table in 3 tasks
    // (r01's slowest bench query, and fully serialized at 100 TB). Level 1
    // ranks within (flag, salt) — Salts*flags parallel partitions, each
    // sorting ~1/Salts of the data — and keeps 3 rows per salt; level 2
    // re-ranks the <= 3*Salts survivors per flag (trivially small). Result
    // is identical to the single-window form: the global top-3 of a group is
    // always within the union of its per-salt top-3s.
    "q12_window_rank" -> ((s, d) => {
      val salts = 32
      val ord: Seq[Column] =
        Seq(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      val w1 = Window.partitionBy(col("l_returnflag"),
          pmod(hash(col("l_orderkey"), col("l_linenumber")), lit(salts)))
        .orderBy(ord: _*)
      val w2 = Window.partitionBy(col("l_returnflag")).orderBy(ord: _*)
      t(s, d, "lineitem")
        .withColumn("rn1", row_number().over(w1))
        .filter(col("rn1") <= 3)
        .withColumn("rn", row_number().over(w2))
        .filter(col("rn") <= 3)
        .select(col("l_returnflag"), col("rn"), col("l_orderkey"),
                col("l_linenumber"), col("l_extendedprice"))
    }),

    // --- analytic window functions (lag + running sum per customer) ------------
    "q13_window_analytic" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey")).orderBy(col("o_orderdate"), col("o_orderkey"))
      t(s, d, "orders")
        .withColumn("prev_price", lag(col("o_totalprice"), 1).over(w))
        .withColumn("running_spend",
          sum(col("o_totalprice").cast(DecimalType(18, 2)))
            .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
            .cast("double"))
        .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
                col("o_totalprice"), col("prev_price"), col("running_spend"))
    }),

    // --- window frames + distribution functions ---------------------------------
    // The rest of the window catalog q12/q13 don't touch: ntile, cume_dist,
    // percent_rank, a bounded moving frame (2 PRECEDING..CURRENT), and
    // first/last_value over the full-partition frame. Every window is
    // partitioned by o_custkey (high cardinality — no global-window
    // single-task collapse at scale) and totally ordered (price desc,
    // orderkey tie-break), so the distribution ratios are deterministic
    // int/int divisions. The moving sum runs in DECIMAL(18,2) (exact; the
    // 3-row double fold would be engine-order-dependent) and only the final
    // value is cast back.
    "q86_window_frames" -> ((s, d) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      val wMov = w.rowsBetween(-2, Window.currentRow)
      val wAll = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      t(s, d, "orders")
        .withColumn("tile", ntile(4).over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("mov3_spend",
          sum(col("o_totalprice").cast(DecimalType(18, 2))).over(wMov)
            .cast("double"))
        .withColumn("best_order", first(col("o_orderkey")).over(wAll))
        .withColumn("worst_order", last(col("o_orderkey")).over(wAll))
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
          col("tile"), col("cd"), col("pr"), col("mov3_spend"),
          col("best_order"), col("worst_order"))
    }),

    // --- global sort + limit (top-k) --------------------------------------------
    "q14_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // --- set operations -----------------------------------------------------------
    "q15_set_ops" -> ((s, d) => {
      val auto = t(s, d, "customer").filter(col("c_mktsegment") === "AUTOMOBILE")
        .select(col("c_nationkey"))
      val bld = t(s, d, "customer").filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_nationkey"))
      val mach = t(s, d, "customer").filter(col("c_mktsegment") === "MACHINERY")
        .select(col("c_nationkey"))
      auto.intersect(bld).except(mach).union(
        t(s, d, "customer").filter(col("c_acctbal") < -900).select(col("c_nationkey")))
        .distinct()
    }),

    // --- string scalar functions ---------------------------------------------------
    "q16_string_funcs" -> ((s, d) =>
      t(s, d, "part")
        .select(
          col("p_partkey"),
          upper(col("p_name")).as("uname"),
          lower(col("p_brand")).as("lbrand"),
          substring(col("p_type"), 1, 5).as("type5"),
          length(col("p_name")).as("name_len"),
          concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
          regexp_replace(col("p_name"), "a", "@").as("name_at"),
          trim(col("p_name")).as("name_trim"))),

    // --- date/time scalar functions --------------------------------------------------
    "q17_date_funcs" -> ((s, d) =>
      t(s, d, "orders")
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          dayofmonth(col("o_orderdate")).as("dom"),
          date_trunc("month", col("o_orderdate")).as("month_start"),
          date_format(col("o_orderdate"), "yyyy-MM").as("ym"))
        .groupBy(col("yr"), col("mo"), col("month_start"), col("ym"))
        .agg(count(lit(1)).as("n_orders"), max(col("dom")).as("max_dom"))),

    // --- math + CASE WHEN --------------------------------------------------------------
    "q18_math_case" -> ((s, d) =>
      t(s, d, "lineitem")
        .select(
          col("l_orderkey"), col("l_linenumber"),
          abs(col("l_discount") - 0.05).as("disc_dist"),
          // round() on a *computed double* diverges between engines (Spark
          // rounds the shortest decimal repr, DuckDB the raw binary64), so
          // round only exact decimals; plain double division is IEEE-defined
          // and bit-identical everywhere.
          (col("l_extendedprice") / 100.0).as("price_h"),
          round(col("l_extendedprice").cast(DecimalType(18, 2)), 1).cast("double").as("price_r"),
          floor(col("l_quantity")).as("qty_floor"),
          ceil(col("l_quantity") / 7.0).as("qty_c7"),
          when(col("l_quantity") < 10, "low")
            .when(col("l_quantity") < 30, "mid")
            .otherwise("high").as("qty_band"),
          (col("l_extendedprice") * col("l_tax")).cast(DecimalType(18, 4))
            .cast("double").as("tax_amt"))),

    // --- GROUP BY + HAVING ---------------------------------------------------------------
    "q19_having" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_custkey"))
        .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("spend"))
        .filter(col("n_orders") >= 3)),

    // --- scalar subquery (price above global average) ---------------------------------------
    "q20_scalar_subquery" -> ((s, d) => {
      val p = t(s, d, "part")
      val avgPrice = p.agg(davg(col("p_retailprice")).as("ap"))
      p.join(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("ap") * 1.02)
        .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
    }),

    // --- events: keyed tumbling-window min/avg (reference Example1/4 batch analog) ----------
    "q21_events_window_min" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 hour").getField("start").as("win_start"),
                 col("user_id"))
        .agg(min(col("value")).as("min_value"),
             max(col("value")).as("max_value"),
             count(lit(1)).as("n_events"))),

    "q22_events_window_avg" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(window(col("ts"), "1 day").getField("start").as("win_start"),
                 col("event_type"))
        .agg(davg(col("value")).as("avg_value"),
             count(lit(1)).as("n_events"))),

    // --- events: semi-structured JSON attribute extraction (reference op #5 analog) ----------
    "q23_events_json" -> ((s, d) =>
      t(s, d, "events")
        .select(col("user_id"), col("event_type"),
                get_json_object(col("props"), "$.k").cast("int").as("k"))
        .groupBy(col("event_type"))
        .agg(davg(col("k")).as("avg_k"), max(col("k")).as("max_k"),
             min(col("k")).as("min_k"), count(lit(1)).as("n"))),

    // --- events: funnel analysis (ordered conversion steps per user) -----------
    // signup -> first view strictly after it -> first purchase strictly after
    // that view. Three hash aggregations and two joins, all keyed by user_id
    // — at scale every stage shuffles (user, one timestamp) pairs, never raw
    // events, and the same partitioning is reusable across stages.
    "q68_funnel" -> ((s, d) => {
      val ev = t(s, d, "events")
      val signup = ev.filter(col("event_type") === "signup")
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_signup"))
      val view = ev.filter(col("event_type") === "view").as("v")
        .join(signup, "user_id")
        .filter(col("ts") > col("t_signup"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_view"))
      val purchase = ev.filter(col("event_type") === "purchase").as("p")
        .join(view, "user_id")
        .filter(col("ts") > col("t_view"))
        .groupBy(col("user_id")).agg(min(col("ts")).as("t_purchase"))
      signup
        .join(view, Seq("user_id"), "left")
        .join(purchase, Seq("user_id"), "left")
        .select(col("user_id"), col("t_signup"), col("t_view"), col("t_purchase"),
          (lit(1) + col("t_view").isNotNull.cast("int")
                  + col("t_purchase").isNotNull.cast("int")).cast("long").as("stage"))
    }),

    // --- events: fixed-width value histogram ------------------------------------
    // Distribution profiling with deterministic bin edges: floor(value/25)
    // is the same IEEE operation in both engines. One hash agg, bin count
    // bounds the output, not the row count.
    "q69_value_histogram" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(floor(col("value") / 25.0d).cast("long").as("bin"))
        .agg(count(lit(1)).as("n"),
          min(col("value")).as("min_v"),
          max(col("value")).as("max_v"))),

    // --- events: weekly retention cohort matrix ----------------------------------
    // The product-analytics staple: users grouped by first-seen week, each
    // cell = how many of that cohort were active k weeks later. Shape: two
    // hash aggs + one user-keyed join — the same user_id partitioning
    // serves both sides, and only (user, week) pairs shuffle, never raw
    // events. The offset division is exact (week-truncated timestamps
    // differ by day multiples of 7), so both engines agree bit-for-bit.
    "q79_retention_cohorts" -> ((s, d) => {
      val ev = t(s, d, "events")
        .select(col("user_id"), date_trunc("week", col("ts")).as("w"))
        .distinct()
      val cohorts = ev.groupBy(col("user_id"))
        .agg(min(col("w")).as("cohort_week"))
      ev.join(cohorts, "user_id")
        .select(col("cohort_week"), col("user_id"),
          (datediff(col("w").cast("date"), col("cohort_week").cast("date")) / 7)
            .cast("long").as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(countDistinct(col("user_id")).as("n_users"))
    }),

    // --- session windows (gap-based, the streaming-native grouping) -------------
    // Batch analog of `session_window`; the oracle reproduces the exact same
    // sessions with gaps-and-islands SQL (new session when the gap since the
    // previous event is >= 12h; session end = last event + gap, end-exclusive).
    "q25_session_window" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(session_window(col("ts"), SessionGap).as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"), min(col("value")).as("min_value"))
        .select(col("user_id"),
          col("sw.start").as("session_start"),
          col("sw.end").as("session_end"),
          col("n_events"), col("min_value"))),

    // --- interval union / coverage per user -------------------------------------
    // Each event opens a fixed 60 s activity interval; the query computes the
    // union of those intervals per user — the interval-algebra primitive
    // behind "active seconds", ad attribution windows, and sensor-uptime
    // reports. Classic sweep: an event starts a new island iff its start
    // exceeds the max end among all PRECEDING events (same user, event-time
    // order, event_id tie-break), islands are numbered by a running sum of
    // the starts, and each island contributes max(end)−min(start). All
    // arithmetic is int64 microseconds (unix_micros — no timestamp-to-double
    // round-trip), so coverage is engine-exact. The windows are per-user
    // (high cardinality, never global) with explicit ROWS frames; at 100 TB
    // this is one shuffle on user_id, then two linear passes.
    "q89_interval_union" -> ((s, d) => {
      val horizonUs = 60L * 1000000L
      val w = Window.partitionBy(col("user_id")).orderBy(col("st"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("st"))
        .withColumn("en", col("st") + lit(horizonUs))
        .withColumn("prev_max_en",
          max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
        .withColumn("new_isl",
          when(col("prev_max_en").isNull || col("st") > col("prev_max_en"), 1L)
            .otherwise(0L))
        .withColumn("isl",
          sum(col("new_isl")).over(w.rowsBetween(Window.unboundedPreceding,
            Window.currentRow)))
        .groupBy(col("user_id"), col("isl"))
        .agg(count(lit(1)).as("n_ev"), min(col("st")).as("a"),
          max(col("en")).as("b"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_intervals"), sum(col("n_ev")).as("n_events"),
          sum(col("b") - col("a")).as("covered_us"))
    }),

    // --- hourly-rate anomaly flags (integer-exact z-score) ----------------------
    // Per user: hourly event counts, flagged when the count sits more than 3
    // standard deviations from that user's own mean rate. The z² > 9 test is
    // algebraically cleared of divisions — (c·n − s)² > 9·(n·ss − s²) with
    // n = #hours, s = Σc, ss = Σc² — so the flag is a pure int64 comparison:
    // no float variance fold, no engine-order dependence, no sqrt. Shape:
    // one hash agg to hours, one user-sized agg, one user-keyed join (the
    // stats side is |users| rows — AQE broadcasts it when small). Counts are
    // per-user-hour so the int64 products are safe far past 100 TB.
    "q90_rate_anomaly" -> ((s, d) => {
      val hc = t(s, d, "events")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("c"))
      // per-user stats as full-frame window aggs over the (small) hourly
      // table: a groupBy+self-join formulation would recompute hc's whole
      // subtree — scanning events twice — where this scans once and runs
      // the window over user×hour cells
      val w = Window.partitionBy(col("user_id"))
      hc
        .withColumn("n", count(lit(1)).over(w))
        .withColumn("s", sum(col("c")).over(w))
        .withColumn("ss", sum(col("c") * col("c")).over(w))
        .select(col("user_id"), col("hour"), col("c"), col("n"),
          ((col("c") * col("n") - col("s")) * (col("c") * col("n") - col("s")) >
            lit(9L) * (col("n") * col("ss") - col("s") * col("s")))
            .as("is_spike"))
    }),

    // --- event-transition matrix (sequence mining) ------------------------------
    // P(next event type | current event type) over per-user event streams —
    // the first-order Markov view of user behavior (and the input to
    // next-action models / funnel discovery). One lead() window per user
    // (high-cardinality partition, unique (ts, event_id) order), then a
    // hash agg on type pairs — the output is #types² cells regardless of
    // corpus size, and the probability is the exact rational n/total
    // (int/int division, no order-dependent float folds).
    "q92_event_transitions" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val trans = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("to_type", lead(col("event_type"), 1).over(w))
        .filter(col("to_type").isNotNull)
        .groupBy(col("event_type").as("from_type"), col("to_type"))
        .agg(count(lit(1)).as("n_trans"))
      val totals = trans.groupBy(col("from_type"))
        .agg(sum(col("n_trans")).as("n_from"))
      trans.join(totals, "from_type")
        .select(col("from_type"), col("to_type"), col("n_trans"),
          (col("n_trans").cast("double") / col("n_from")).as("prob"))
    }),

    // --- top event paths (3-step sequence mining) -------------------------------
    // The path-discovery extension of q92's transition matrix: the 25 most
    // travelled 3-step event sequences, with how many users ever walk each
    // path. Two lead() offsets over the same per-user window (one shuffle,
    // one sort serves both), then a hash agg on the path triple — at most
    // #types³ cells — and a bounded TakeOrdered(25). n_users is an exact
    // distinct count over the path's walkers; ordering is total
    // (n_paths desc, then the three steps) so the cut is deterministic.
    "q105_event_paths" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("step2", lead(col("event_type"), 1).over(w))
        .withColumn("step3", lead(col("event_type"), 2).over(w))
        .filter(col("step3").isNotNull)
        .groupBy(col("event_type").as("step1"), col("step2"), col("step3"))
        .agg(count(lit(1)).as("n_paths"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(col("n_paths").desc, col("step1"), col("step2"), col("step3"))
        .limit(25)
    }),

    // --- exact per-group median via value histogram -----------------------------
    // Exact order statistics WITHOUT sorting rows: collapse orders to a
    // (priority, price-in-cents) count histogram first (hash agg with
    // map-side combine), then walk the cumulative counts to pick the
    // rank-(n+1)/2 and rank-(n/2+1) values — avg of the two is the textbook
    // median for both parities. The per-priority window runs over DISTINCT
    // price points, not orders, so a 100 TB orders table costs one shuffle
    // of histogram cells bounded by the price domain. Cents are extracted
    // through DECIMAL(18,2) (exact), and the only division is the final
    // /200.0 — a single IEEE op, bit-identical across engines.
    "q91_group_median" -> ((s, d) => {
      val cents = (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")
      val hist = t(s, d, "orders")
        .groupBy(col("o_orderpriority"), cents.as("cents"))
        .agg(count(lit(1)).as("cnt"))
      histRankWalk(hist, "o_orderpriority", "cents",
        Seq("v_lo" -> "(n + 1) div 2", "v_hi" -> "n div 2 + 1"))
        .select(col("o_orderpriority"), col("n").as("n_orders"),
          ((col("v_lo") + col("v_hi")).cast("double") / 200.0)
            .as("median_price"))
    }),

    // --- value-distribution drift between time halves ---------------------------
    // The drift monitor: does each event type's value distribution change
    // between the first and second half of the observation window? Values
    // are binned into 16 fixed per-type buckets (integer affine map over
    // the type's full-range cents, q74-style), counted per (type, half,
    // bin), and compared by L1 distance. The distance is kept exact as the
    // integer Σ|n_old·T_new − n_new·T_old| and only the final division by
    // T_old·T_new is float, so the statistic hash-matches. drift ∈ [0, 2]:
    // 0 = identical distributions, 2 = disjoint support. Shape: one bounds
    // agg broadcast back, one hash agg to (type, bin) cells with both
    // halves pivoted into columns, one 16-rows-per-type rollup.
    "q104_value_drift" -> ((s, d) => {
      val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
      val D = DecimalType(38, 0)
      val ev = t(s, d, "events")
        .select(col("event_type"), unix_micros(col("ts")).as("us"),
          cents.as("c"))
      // one aggregating scan carries both the per-type value bounds and the
      // per-type time extent; the GLOBAL extent is then a second-level agg
      // over the #types-row table, never another pass over events
      val bounds = ev.groupBy(col("event_type"))
        .agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"),
          min(col("us")).as("u0"), max(col("us")).as("u1"))
      val span = bounds.agg(min(col("u0")).as("t0"), max(col("u1")).as("t1"))
      val binned = ev.join(broadcast(span))
        .join(broadcast(bounds.select(col("event_type"), col("cmin"),
          col("cmax"))), "event_type")
        .select(col("event_type"),
          // integer midpoint halving: second half iff 2·us >= t0 + t1
          (col("us") * 2 >= col("t0") + col("t1")).as("is_new"),
          // the bin numerator (c - cmin) * 16 runs in DECIMAL(38,0) like the
          // L1 cross products below: in int64 it would silently wrap (Spark,
          // non-ANSI) where DuckDB raises, once the per-type cents range
          // exceeds ~5.8e17 — reachable with DECIMAL(18,2)-scale values.
          // `div` is integral divide (BIGINT result) in both engines.
          least(lit(15L),
            expr("((cast(c as decimal(38,0)) - cmin) * 16) div (cmax - cmin + 1)"))
            .as("bin"))
      val cells = binned.groupBy(col("event_type"), col("bin"))
        .agg(sum(when(col("is_new"), 0L).otherwise(1L)).as("n_old"),
          sum(when(col("is_new"), 1L).otherwise(0L)).as("n_new"))
      // per-type totals as window aggs over the 16-cell partitions (a
      // groupBy+join would recompute the whole binning pipeline); the
      // cross products run in DECIMAL(38,0) like q100 — n·T exceeds int64
      // once a type holds ~3e9 events per half
      val w = Window.partitionBy(col("event_type"))
      cells
        .withColumn("t_old", sum(col("n_old")).over(w))
        .withColumn("t_new", sum(col("n_new")).over(w))
        .groupBy(col("event_type"))
        .agg(max(col("t_old")).as("n_old_total"),
          max(col("t_new")).as("n_new_total"),
          sum(abs(col("n_old").cast(D) * col("t_new").cast(D) -
            col("n_new").cast(D) * col("t_old").cast(D))).as("l1_num_d"))
        // a type living entirely in one half has no counterpart
        // distribution: drift pins to the disjoint-support maximum 2.0.
        // The numerator stays internal (decimal) — emitting it as int64
        // would re-introduce the overflow the decimal math avoids.
        .select(col("event_type"), col("n_old_total"), col("n_new_total"),
          when(col("n_old_total") === 0L || col("n_new_total") === 0L,
            lit(2.0))
            .otherwise(col("l1_num_d").cast("double") /
              (col("n_old_total").cast(D) * col("n_new_total").cast(D))
                .cast("double")).as("drift"))
    }),

    // --- per-group Pearson correlation from exact integer moments ---------------
    // corr(quantity, price) per return flag WITHOUT the engine-specific
    // float accumulation of corr()/covar(): all five moment sums run in
    // exact 128-bit integer space (Spark DECIMAL(38,0) ≙ DuckDB HUGEINT —
    // quantities are small ints, prices exact cents, so Σy² ~ 1e19 needs
    // more than int64 but nowhere near 38 digits), and the one float step
    // is the final num/(sqrt·sqrt) with its operation order pinned in the
    // oracle. One hash agg with map-side partials; output is #groups rows.
    "q100_group_correlation" -> ((s, d) => {
      val D = DecimalType(38, 0)
      val base = t(s, d, "lineitem")
        .select(col("l_returnflag"),
          col("l_quantity").cast("long").cast(D).as("x"),
          (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
            .cast("long").cast(D).as("y"))
      base.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).cast(D).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("l_returnflag"), col("n").cast("long").as("n_rows"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double")) *
             sqrt((col("n") * col("syy") - col("sy") * col("sy"))
               .cast("double")))).as("corr_qty_price"))
    }),

    // --- correlated EXISTS / NOT EXISTS subqueries ------------------------------
    // SQL-level subquery support, distinct from the API-level semi/anti
    // joins (q06/q07): Catalyst must DECORRELATE both predicates into
    // joins — EXISTS → left-semi, NOT EXISTS → left-anti — or the plan
    // degenerates into a per-row subquery loop. The spec asserts the
    // decorrelated shape (one semi + one anti join, no nested-loop over
    // orders); at 100 TB both joins shuffle on the correlation key like
    // any equi-join. Same SQL text runs on both engines.
    "q98_exists_subquery" -> ((s, d) => {
      t(s, d, "customer").createOrReplaceTempView("customer")
      t(s, d, "orders").createOrReplaceTempView("orders")
      s.sql("""
        SELECT c_custkey, c_name, c_acctbal FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_totalprice < 5000)""")
    }),

    // --- time-grid densification (gap-fill) -------------------------------------
    // Regularize each user's event stream onto a dense hourly grid between
    // their first and last activity — the resample step every downstream
    // time-series model (rate anomaly q90 included) implicitly assumes, made
    // explicit with zero-filled gap hours. Shape: hourly counts are one hash
    // agg; the grid is a per-user `sequence`+`explode` bounded by the span
    // (never a calendar cross-join); the left join back is keyed on
    // (user, hour) — the same key the counts already shuffled on. Gap hours
    // dominate the output only as much as the data is sparse, and every
    // value is an exact integer.
    "q97_time_gridfill" -> ((s, d) => {
      // materialized once: both the span derivation and the left join read
      // it, and recomputing it means scanning events twice. LAZY checkpoint
      // (eager=false): building the DataFrame stays plan-only (no job at
      // construction — the Explain dev loop would otherwise execute the
      // full upstream); the first action materializes, later reads reuse.
      // Fault tolerance is the pin-mode dial (graft.Pinned): default-mode
      // blocks die with an executor; a production run at scale sets
      // spark.graft.checkpoint=reliable and the SAME pin writes a
      // reliable checkpoint instead (kill-proven in LocalClusterSpec).
      val hc = t(s, d, "events")
        .groupBy(col("user_id"), date_trunc("hour", col("ts")).as("hour"))
        .agg(count(lit(1)).as("c"))
        .pin(false)
      val grid = hc.groupBy(col("user_id"))
        .agg(min(col("hour")).as("h0"), max(col("hour")).as("h1"))
        .select(col("user_id"),
          explode(sequence(col("h0"), col("h1"),
            expr("INTERVAL 1 HOUR"))).as("hour"))
      grid.join(hc, Seq("user_id", "hour"), "left")
        .select(col("user_id"), col("hour"),
          coalesce(col("c"), lit(0L)).as("n_events"),
          col("c").isNull.as("filled"))
    }),

    // --- per-type winsorization (outlier clamp at exact p05/p95) ----------------
    // Numeric-column curation: clamp each event's value to its event-type's
    // exact 5th/95th percentile — the standard robustification pass before
    // a value column feeds training or monitoring. Cut values come from the
    // q91 histogram walk (cumulative counts over DISTINCT cents per type,
    // ceil-rank semantics), so no row-level sort exists anywhere; the
    // per-type cut table is a handful of rows and broadcasts back across
    // the raw events for a narrow clamp. All rank arithmetic is integer
    // (ceil(q·n) as (q·n + 99) div 100); cents are exact via DECIMAL.
    "q95_winsorize" -> ((s, d) => {
      val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
      val ev = t(s, d, "events")
        .select(col("event_id"), col("event_type"), cents.as("c"))
      val hist = ev.groupBy(col("event_type"), col("c"))
        .agg(count(lit(1)).as("cnt"))
      val cuts = histRankWalk(hist, "event_type", "c",
        Seq("c_lo" -> "(5 * n + 99) div 100",
          "c_hi" -> "(95 * n + 99) div 100"))
        .select(col("event_type"), col("c_lo"), col("c_hi"))
      ev.join(broadcast(cuts), "event_type")
        .select(col("event_id"), col("event_type"),
          (col("c").cast("double") / 100.0).as("value"),
          (least(greatest(col("c"), col("c_lo")), col("c_hi"))
            .cast("double") / 100.0).as("value_w"),
          (col("c") < col("c_lo") || col("c") > col("c_hi")).as("clipped"))
    }),

    // --- RFM customer segmentation (q207) ---------------------------------------
    // Recency/frequency/monetary quartile codes over the order history —
    // the marketing-analytics workload that exercises THREE independent
    // global quantile computations at once. Each dimension's quartile cuts
    // come from the shared histogram rank walk over a VALUE histogram
    // (recency: distinct days ≤ date span; frequency: distinct counts;
    // monetary: distinct cents — all value-domain-bounded, so the
    // single-partition cumulative runs post-aggregation over
    // histogram-sized frames, the sanctioned q197 shape). Codes join back
    // as one broadcast 3-cut row per dimension; the segment census is a
    // (4×4×4)-bounded aggregate. Recency is measured against the corpus
    // max date (broadcast 1-row agg), so the query is reproducible, not
    // wall-clock-dependent.
    "q207_rfm_segments" -> ((s, d) => {
      val o = t(s, d, "orders").select(col("o_custkey"),
        col("o_orderdate"),
        (col("o_totalprice").cast(DecimalType(18, 2)) * 100)
          .cast("long").as("cents"))
      val maxd = o.agg(max(col("o_orderdate")).as("maxd"))
      // FOUR consumers (three cut histograms + the coding pass) read the
      // per-customer aggregate: lazily checkpoint it so the orders scan +
      // customer groupBy run once — MEMOIZED per (session, dir) like every
      // other stage checkpoint, so repeated invocations reuse one pinned
      // copy (and SessionMemo releases it at session end) instead of
      // leaking one anonymous checkpoint per call
      val cust = rfmCustMemo.getOrCompute(s, d) {
        o.crossJoin(broadcast(maxd))
          .groupBy(col("o_custkey"))
          .agg(max(col("o_orderdate")).as("lastd"),
            count(lit(1)).as("freq"), sum(col("cents")).as("monetary"),
            max(col("maxd")).as("maxd"))
          .select(col("o_custkey"),
            datediff(col("maxd"), col("lastd")).cast("long").as("recency"),
            col("freq"), col("monetary"))
          .pin(false)
      }
      // ONE rank walk over a metric-tagged tall histogram instead of three
      // separate histRankWalk pipelines (each with its own pin, probe
      // count, spine and broadcast build — 21 jobs measured): the three
      // quartile-cut sets are identical integers either way (per-metric
      // counts and ranks are untouched by the tagging), computed in one
      // vocabulary-sized pass and pivoted to the 9 cut scalars the coding
      // pass crossJoins.
      val metrics = Seq("recency", "freq", "monetary")
      val tall = metrics.map(m =>
          cust.select(lit(m).as("metric"), col(m).as("v")))
        .reduce(_ unionAll _)
        .groupBy(col("metric"), col("v")).agg(count(lit(1)).as("cnt"))
      val walk = histRankWalk(tall, "metric", "v",
        (1 to 3).map(k => s"cut$k" -> s"($k * n + 3) div 4"))
      val cutsAll = walk.agg(
        max(when(col("metric") === metrics.head, col("cut1"))).as("recency_cut1"),
        (for (m <- metrics; k <- 1 to 3; if !(m == metrics.head && k == 1))
          yield max(when(col("metric") === m, col(s"cut$k")))
            .as(s"${m}_cut$k")): _*)
      def code(valueCol: String): Column =
        lit(1L) + (1 to 3).map(k =>
          (col(valueCol) > col(s"${valueCol}_cut$k")).cast("long")).reduce(_ + _)
      cust
        .crossJoin(broadcast(cutsAll))
        .select(concat(lit("R"), code("recency"),
          lit("F"), code("freq"), lit("M"), code("monetary")).as("segment"),
          col("monetary"))
        .groupBy(col("segment"))
        .agg(count(lit(1)).as("n_customers"),
          sum(col("monetary")).as("total_monetary_cents"))
    }),

    // --- daily latency-style percentile rollup (q209) ---------------------------
    // The observability staple: exact p50/p95/p99 of value cents per
    // (event_type, day) — the two-dimensional sibling of q95's cuts, with
    // the cumulative window partitioned by the COMPOSITE group (so
    // parallelism scales with types × days, not types). percentile_disc
    // ceil-rank semantics, all integer; one corpus pass into a
    // (group × distinct-cents) histogram, then group-sized walks. This is
    // the query monitoring dashboards run hourly at fleet scale — the
    // histogram reduction is what keeps it viable when a day holds 1e10
    // events of a few thousand distinct values.
    "q209_daily_percentiles" -> ((s, d) => {
      val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
      val ev = t(s, d, "events").select(col("event_type"),
        to_date(col("ts")).as("day"), cents.as("c"))
      val hist = ev.groupBy(col("event_type"), col("day"), col("c"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("event_type"), col("day"))
        .orderBy(col("c").asc_nulls_last)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"), col("day"))
      hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .groupBy(col("event_type"), col("day"))
        .agg(max(col("n")).as("n"),
          min(when(col("cum") >= expr("(50 * n + 99) div 100"), col("c")))
            .as("p50_cents"),
          min(when(col("cum") >= expr("(95 * n + 99) div 100"), col("c")))
            .as("p95_cents"),
          min(when(col("cum") >= expr("(99 * n + 99) div 100"), col("c")))
            .as("p99_cents"))
    }),

    // --- approximate distinct (HLL sketch; the at-scale counterpart of q09) ----
    // The raw HLL value is engine-specific (DuckDB's sketch differs), so the
    // oracle checks the deterministic half: exact_parts hash-matches, and the
    // sketch is asserted *through* the boolean error-bound column — Spark
    // emits the actual |approx-exact| <= 10%·exact check, the oracle emits
    // literal TRUE, so the row only hashes green when the sketch held its
    // bound. RelationalSpec additionally bounds the raw value.
    "q26_approx_distinct" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(approx_count_distinct(col("l_partkey")).as("approx_parts"),
          countDistinct(col("l_partkey")).as("exact_parts"))
        .select(col("l_returnflag"), col("exact_parts"),
          (abs(col("approx_parts") - col("exact_parts")).cast("double") <=
            lit(0.1) * col("exact_parts")).as("approx_ok"))),

    // --- top-k per group via bounded partial aggregation -----------------------
    // Same result set as q12, different physical strategy: a typed Aggregator
    // whose map-side partials keep only k rows, so the shuffle carries
    // k * partitions rows per group instead of sorting the whole group —
    // the shape that wins when groups are huge and k is small.
    "q27_topk_agg" -> ((s, d) => {
      val topk = udaf(new TopKLines(3))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(topk(col("l_extendedprice"), col("l_orderkey"),
          col("l_linenumber")).as("top"))
        .select(col("l_returnflag"), posexplode(col("top")).as(Seq("pos", "r")))
        .select(col("l_returnflag"), (col("pos") + 1).cast("long").as("rn"),
          col("r.okey").as("l_orderkey"), col("r.lineno").as("l_linenumber"),
          col("r.price").as("l_extendedprice"))
    }),

    // --- pivot (rows -> columns) -----------------------------------------------
    "q28_pivot" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .select(col("o_orderpriority"), col("F").as("f_total"),
          col("O").as("o_total"), col("P").as("p_total"))),

    // --- unpivot (columns -> rows; pivot's inverse) ----------------------------
    // The melt operator: the q28 wide per-status totals relaid as
    // (priority, metric, total) long form — the layout a metrics store or
    // plotting layer wants. Absent combinations are pinned to 0.0 BEFORE
    // unpivoting because the engines' default null policies differ (Spark's
    // Dataset unpivot keeps null cells, SQL UNPIVOT drops them); with the
    // coalesce both emit exactly priorities × 3 rows. Scale: the wide input
    // is already the q28 aggregate (priorities × statuses cells), so the
    // relayout is driver-scale metadata work on top of one hash agg.
    "q114_unpivot" -> ((s, d) =>
      t(s, d, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(dsum(col("o_totalprice")))
        .select(col("o_orderpriority"),
          coalesce(col("F"), lit(0.0)).as("f_total"),
          coalesce(col("O"), lit(0.0)).as("o_total"),
          coalesce(col("P"), lit(0.0)).as("p_total"))
        .unpivot(Array(col("o_orderpriority")),
          Array(col("f_total"), col("o_total"), col("p_total")),
          "metric", "total")),

    // --- key-skew profiler (the salting / AQE-skew decision signal) ------------
    // For each join/group key a pipeline actually shuffles on, the numbers
    // that decide mitigation BEFORE the shuffle runs: distinct keys, rows,
    // the heaviest key's count and share, and the normalized second moment
    // skew = n_keys·Σn² / total² (1.0 = perfectly uniform, n_keys = all
    // mass on one key) — which is also the self-join blowup factor
    // relative to uniform. Everything is two hash aggs per column (counts,
    // then moments); no sort, no window, no rank — the profile stays
    // computable at any key cardinality. Integer moments ride in
    // DECIMAL(38,0) (Σn² squares past int64 at corpus scale); the two
    // ratios are single float divisions of exact integers.
    // --- golden-record merge (survivorship consolidation) ----------------------
    // The master-data operator: collapse an entity's event history to one
    // best row under explicit survivorship rules — most-recent event type,
    // most-recent NON-NULL value (IGNORE NULLS first_value over the
    // full-partition frame: a null latest reading must not erase the last
    // known one), modal event type with deterministic ties (count desc,
    // then name), plus first/last seen and the event count. Everything
    // partitions on user_id: the desc window, the groupBy, and the modal
    // (user,type) count + window are all co-partitioned, so one shuffle
    // serves four aggregations. (ts, event_id) total order makes every
    // "latest" unique — no max_by tie roulette feeding the hash.
    "q130_golden_record" -> ((s, d) =>
      goldenRecord(t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value")))),

    // --- equal-frequency decile binning (quantile discretization) --------------
    // The feature-engineering counterpart of q125's equal-WIDTH map: per
    // return flag, discretize price cents into 10 equal-POPULATION bins.
    // Cut points are exact percentile_disc values at ceil(k·n/10) ranks via
    // the shared histogram rank-walk (no global sort — the q74/q95
    // machinery); each row's bin is 1 + Σ[c > cut_k], a 9-term boolean sum
    // over the broadcast 9-cut row, inside whole-stage codegen. Bin
    // populations deviate from n/10 only by tie mass at the cuts —
    // deterministically, identically in both engines. Scale shape: the
    // histogram agg is (group × distinct-cents)-sized, cuts are 9 values
    // per group, and the assignment pass is a narrow projection — nothing
    // sorts, nothing resembles ntile's single ordered partition.
    "q128_eqfreq_bins" -> ((s, d) => {
      val cents = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")
      val li = t(s, d, "lineitem").select(col("l_returnflag"), cents.as("c"))
      val hist = li.groupBy(col("l_returnflag"), col("c"))
        .agg(count(lit(1)).as("cnt"))
      // assign bins INSIDE the cumulative frame — no join-back at all: a
      // value's bin is 1 + #{k : c > cut_k}, and since cut_k is the least
      // value whose cum count reaches rank_k while cum is monotone over the
      // ascending distinct values, c > cut_k ⟺ the mass strictly below c
      // (cum − cnt) already reached rank_k. That algebraic inversion turns
      // the r7 shape (corpus re-scan + broadcast join, 2 scans) and the r8
      // intent (ReuseExchange, which AQE declined to fire — the two hist
      // subtrees canonicalize apart under the window's extra exchange) into
      // ONE scan → (group, value) hist agg → two-level bucketed cumulative
      // (histCumulative: the distinct-value walk parallelizes 256-way
      // within a group instead of single-tasking the cents domain) →
      // bin groupBy.
      val below = col("cum") - col("cnt")
      histCumulative(hist, "l_returnflag", "c")
        .select(col("l_returnflag"), col("c"), col("cnt"),
          when(col("c").isNotNull,
            lit(1L) + (1 to 9).map(k =>
              (below >= expr(s"($k * n + 9) div 10")).cast("long"))
              .reduce(_ + _)).as("bin"))
        .groupBy(col("l_returnflag"), col("bin"))
        .agg(sum(col("cnt")).as("n"),
          min(col("c")).as("c_min"), max(col("c")).as("c_max"))
    }),

    // --- interpolated quartiles (percentile_cont, type-7) -----------------------
    // The interpolation tier over q128's percentile_disc cuts: exact
    // type-7 quartiles (pos = q·(n−1), linear between neighbors) per
    // return flag, WITHOUT sorting the corpus — the shared histogram rank
    // walk fetches the two bracketing order statistics; the interpolation
    // fraction is (k·(n−1) mod 4)/4, a dyadic rational, so lo + frac·Δ is
    // bit-identical to DuckDB's native percentile_cont float path (every
    // intermediate is exactly representable). Scale shape: one (group ×
    // distinct-cents) histogram agg + a group-sized walk; no ntile, no
    // global sort.
    "q186_percentile_cont" -> ((s, d) => {
      val cents = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")
      val li = t(s, d, "lineitem").select(col("l_returnflag"), cents.as("c"))
      val hist = li.groupBy(col("l_returnflag"), col("c"))
        .agg(count(lit(1)).as("cnt"))
      val ranks = (1 to 3).flatMap(k => Seq(
        s"lo$k" -> s"((($k * (n - 1)) div 4) + 1)",
        s"hi$k" -> s"((($k * (n - 1)) div 4) + 2)"))
      val walk = histRankWalk(hist, "l_returnflag", "c", ranks)
      walk.select(col("l_returnflag") +: col("n").as("n_rows") +:
        (1 to 3).map { k =>
          val rem = expr(s"(($k * (n - 1)) % 4)")
          when(rem === 0, col(s"lo$k").cast("double"))
            .otherwise(col(s"lo$k").cast("double") +
              ((col(s"hi$k") - col(s"lo$k")) * rem).cast("double") / 4)
            .as(s"p${k * 25}")
        }: _*)
    }),

    // --- exponentially decayed counts (integer-exact half-life) -----------------
    // The feature-store recency weighting: each event contributes 2^(−age)
    // with age = whole days before the corpus max day — a one-day half-life.
    // Float Σ w·2^(−age) is ORDER-DEPENDENT (adding tiny old terms to big
    // recent ones rounds differently per partitioning); here every term is
    // scaled to the integer 2^(30−age) (ages ≥ 30 genuinely underflow the
    // scale and contribute 0 — stated, deterministic), accumulated in
    // DECIMAL(38,0) ≙ HUGEINT, and divided once by 2^30 at the end — an
    // exact dyadic division, bit-identical across engines and partition
    // orders. One narrow scan + one broadcast max-day scalar + one hash
    // agg: the 100 TB plan is the same plan.
    "q188_decayed_counts" -> ((s, d) => {
      val D = DecimalType(38, 0)
      val ev = t(s, d, "events").select(col("event_type"),
        date_trunc("DAY", col("ts")).as("day"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      val mx = ev.agg(max(col("day")).as("max_day"))
      val age = datediff(col("max_day"), col("day"))
      val wgt = when(age <= 30,
          call_function("shiftleft", lit(1L), (lit(30) - age).cast("int")))
        .otherwise(lit(0L)).cast(D)
      ev.join(broadcast(mx))
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n_events"),
          sum(wgt).as("dn"),
          sum(wgt * col("c").cast(D)).as("dc"))
        .select(col("event_type"), col("n_events"),
          (col("dn").cast("double") / lit(1073741824L)).as("decayed_count"),
          (col("dc").cast("double") / lit(1073741824L))
            .as("decayed_cents"))
    }),

    // --- CUPED variance reduction (experimentation analytics) -------------------
    // The standard pre-experiment covariate adjustment (Deng et al. 2013):
    // per user, y = purchase cents in the last 15 days, x = cents before
    // that; pooled θ = cov(x,y)/var(x); adjusted mean per arm =
    // ȳ − θ(x̄_arm − x̄); adjusted variance = var(y) − 2θcov + θ²var(x).
    // DISCIPLINE: no per-user float ever aggregates — every moment (n, Σx,
    // Σy, Σxy, Σx², Σy²) accumulates exactly in DECIMAL(38) per arm, and
    // θ/means/variances are a fixed sequence of SCALAR float ops on those
    // exact integers, so the result is bit-identical across engines and
    // partition orders (the naive per-user ŷ = y − θx sum is not). Shape:
    // one narrow scan → one user_id agg → one 2-row arm agg.
    "q193_cuped" -> ((s, d) => {
      val D = DecimalType(38, 0)
      val ev = t(s, d, "events")
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      val cut = ev.agg(
        date_sub(max(col("ts")).cast("date"), 15).as("cut_day"))
      val perUser = ev.join(broadcast(cut))
        .groupBy(col("user_id"))
        .agg(sum(when(col("ts") < col("cut_day").cast("timestamp"),
            col("c")).otherwise(0L)).as("x"),
          sum(when(col("ts") >= col("cut_day").cast("timestamp"),
            col("c")).otherwise(0L)).as("y"))
        .select((col("user_id") % 2 === 0).as("arm_a"),
          col("x").cast(D).as("x"), col("y").cast(D).as("y"))
      val arms = perUser.groupBy(col("arm_a"))
        .agg(count(lit(1)).cast(D).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"),
          sum(col("y") * col("y")).as("syy"))
      val g = arms.agg(sum(col("n")).as("gn"), sum(col("sx")).as("gsx"),
        sum(col("sy")).as("gsy"), sum(col("sxx")).as("gsxx"),
        sum(col("sxy")).as("gsxy"))
      // pooled θ and global x mean from exact global moments (scalar float
      // algebra in fixed order); per-arm means/vars likewise
      val withG = arms.join(broadcast(g))
      def dbl(c: Column) = c.cast("double")
      val thetaNum = dbl(col("gn") * col("gsxy") - col("gsx") * col("gsy"))
      val thetaDen = dbl(col("gn") * col("gsxx") - col("gsx") * col("gsx"))
      val theta = thetaNum / thetaDen
      val gxbar = dbl(col("gsx")) / dbl(col("gn"))
      val xbar = dbl(col("sx")) / dbl(col("n"))
      val ybar = dbl(col("sy")) / dbl(col("n"))
      val varY = (dbl(col("syy")) - dbl(col("sy")) * dbl(col("sy")) /
        dbl(col("n"))) / (dbl(col("n")) - 1)
      val varX = (dbl(col("sxx")) - dbl(col("sx")) * dbl(col("sx")) /
        dbl(col("n"))) / (dbl(col("n")) - 1)
      val covXY = (dbl(col("sxy")) - dbl(col("sx")) * dbl(col("sy")) /
        dbl(col("n"))) / (dbl(col("n")) - 1)
      val varAdj = varY - lit(2.0) * theta * covXY + theta * theta * varX
      withG.select(col("arm_a"), col("n").cast("long").as("n_users"),
        ybar.as("mean_y"),
        (ybar - theta * (xbar - gxbar)).as("mean_cuped"),
        varY.as("var_y"), varAdj.as("var_cuped"),
        (lit(1.0) - varAdj / varY).as("var_reduction"))
    }),

    // --- Mann–Whitney U test (nonparametric A/B) ---------------------------------
    // The rank-sum sibling of q174's z-test — no normality assumption on
    // the metric. Per event type, arms = event_id parity; U is computed
    // WITHOUT ranking any row: from the per-value count histogram,
    // 2U = Σ_v na(v)·(2·cumB(<v) + nb(v)) (ties contribute the half via
    // the doubling — everything stays integer). The normal approximation
    // with tie correction collapses to ONE exact rational:
    // z² = 3·(2U − n1n2)²·n(n−1) / (n1n2·[n(n−1)(n+1) − Σ(t³−t)]),
    // every product in DECIMAL(38); the single division is the only float
    // op, and the α=0.05 verdict is a pure integer inequality (the q174
    // discipline). Shape: one histogram agg, one type-partitioned
    // cumulative window over DISTINCT values, one per-type agg.
    "q196_mann_whitney" -> ((s, d) => {
      val D = DecimalType(38, 0)
      val ev = t(s, d, "events").select(col("event_type"),
        (col("event_id") % 2 === 0).as("arm_a"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      val hist = ev.groupBy(col("event_type"), col("c"))
        .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("na"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("nb"))
      val w = Window.partitionBy(col("event_type")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val cum = hist.withColumn("cumb",
        coalesce(sum(col("nb")).over(w), lit(0L)))
      val agg = cum.groupBy(col("event_type"))
        .agg(sum(col("na")).as("n1"), sum(col("nb")).as("n2"),
          sum(col("na").cast(D) *
            (lit(2).cast(D) * col("cumb").cast(D) + col("nb").cast(D)))
            .as("u2"),
          sum((col("na") + col("nb")).cast(D) * (col("na") + col("nb")).cast(D)
            * (col("na") + col("nb")).cast(D) -
            (col("na") + col("nb")).cast(D)).as("ties"))
      agg.select(col("event_type"), col("n1"), col("n2"),
          col("u2").as("u2d"), col("u2").cast("long").as("u2"),
          (col("n1") + col("n2")).cast(D).as("n"),
          (col("n1").cast(D) * col("n2").cast(D)).as("n12"),
          col("ties"))
        .select(col("event_type"), col("n1"), col("n2"), col("u2"),
          (lit(3).cast(D) * (col("u2d") - col("n12"))
            * (col("u2d") - col("n12"))
            * col("n") * (col("n") - 1)).as("z2num"),
          (col("n12") * (col("n") * (col("n") - 1) * (col("n") + 1)
            - col("ties"))).as("z2den"))
        .select(col("event_type"), col("n1"), col("n2"), col("u2"),
          (col("z2num").cast("double") / col("z2den").cast("double"))
            .as("z2"),
          (lit(10000).cast(D) * col("z2num") >
            lit(38416).cast(D) * col("z2den")).as("significant"))
    }),

    // --- Kruskal–Wallis H test (k-sample rank ANOVA) -----------------------------
    // q196's k-sample extension: do the five event types draw their values
    // from the same distribution? Rank sums come from the value-count
    // histogram with NO row ranking (2R_j = Σ_v n_j(v)·(2·cum(<v)+t+1),
    // all integer — midranks via the doubled form), then the five groups
    // PIVOT to one row so H = 12/(n(n+1))·ΣR_j²/n_j − 3(n+1) and its tie
    // correction are a FIXED-ORDER chain of scalar float ops over exact
    // integers (the q193 discipline — a float agg over groups would be
    // partition-order-dependent). Verdict at α=0.05 vs the χ²(4) critical
    // value as the same literal in both engines. One histogram agg + one
    // type-partitioned cumulative window + a 5-column conditional agg.
    "q197_kruskal_wallis" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val ev = t(s, d, "events").select(col("event_type"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      val hist = ev.groupBy(col("c"))
        .agg(count(lit(1)).as("t"), types.map(ty =>
          sum(when(col("event_type") === ty, 1L).otherwise(0L))
            .as(s"n_$ty")): _*)
      val w = Window.orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, -1)
      // the cumulative runs over the value HISTOGRAM — a (distinct cents)-
      // sized aggregation output, not corpus rows, which is exactly the
      // post-reduction case the catalog window guard structurally allows
      val cum = hist.withColumn("cum",
        coalesce(sum(col("t")).over(w), lit(0L)))
      val D = DecimalType(38, 0)
      val agg = cum.agg(
        sum(col("t")).as("n"),
        sum(col("t").cast(D) * col("t").cast(D) * col("t").cast(D) -
          col("t").cast(D)).as("ties") +:
          types.flatMap(ty => Seq(
            sum(col(s"n_$ty")).as(s"cnt_$ty"),
            sum(col(s"n_$ty").cast(D) *
              (lit(2) * col("cum") + col("t") + 1).cast(D)).as(s"r2_$ty"))): _*)
      def dbl(c: Column) = c.cast("double")
      val n = dbl(col("n"))
      // ΣR_j²/n_j = Σ (2R_j)²/(4 n_j), accumulated left-to-right over the
      // FIXED type order — deterministic
      val sumR = types.map(ty =>
        dbl(col(s"r2_$ty")) * dbl(col(s"r2_$ty")) /
          (lit(4.0) * dbl(col(s"cnt_$ty")))).reduceLeft(_ + _)
      val h = lit(12.0) / (n * (n + 1)) * sumR - lit(3.0) * (n + 1)
      val corr = lit(1.0) - dbl(col("ties")) / (n * n * n - n)
      agg.select(col("n").cast("long").as("n"),
          h.as("h"), (h / corr).as("h_tie_corrected"))
        .select(col("n"), col("h"), col("h_tie_corrected"),
          (col("h_tie_corrected") > 9.487729036781154).as("significant"))
    }),

    // --- Kolmogorov–Smirnov two-sample test --------------------------------------
    // The ECDF-distance sibling of q196: per event type, does arm A's value
    // distribution differ from arm B's ANYWHERE (not just in location)? The
    // statistic is exact-integer throughout: at each distinct cent value v,
    // the scaled ECDF gap is |cumA(≤v)·nB − cumB(≤v)·nA| (cross-multiplied
    // to the common denominator nA·nB — no float ECDF ever exists), and
    // D_num = max over v. Both cumulatives AND the arm totals ride ONE
    // window pass over the (type × distinct cents) HISTOGRAM — the
    // sanctioned post-aggregation window shape (q197): corpus rows never
    // sort. Verdict at α=0.05 against the asymptotic critical value
    // c=1.358 as a pure integer inequality (c² = 1844164/1e6):
    // 1e6·D_num² > 1844164·nA·nB·(nA+nB), products in DECIMAL(38,0) ≙
    // HUGEINT — exact up to ~1e8 rows per arm per type. Past that the
    // engines DIVERGE, loudly rather than silently: Spark DECIMAL(38,0)
    // overflow yields NULL (non-ANSI mode) while DuckDB HUGEINT overflow
    // raises an error — and at that n the verdict is long since decided.
    // One histogram agg + one type-partitioned window +
    // one type-sized reduction.
    "q214_ks_test" -> ((s, d) => {
      val D = DecimalType(38, 0)
      val ev = t(s, d, "events").select(col("event_type"),
        (col("event_id") % 2 === 0).as("arm_a"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      val hist = ev.groupBy(col("event_type"), col("c"))
        .agg(sum(when(col("arm_a"), 1L).otherwise(0L)).as("na"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("nb"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("c"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("event_type"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      val cum = hist.select(col("event_type"),
        sum(col("na")).over(wCum).as("cuma"),
        sum(col("nb")).over(wCum).as("cumb"),
        sum(col("na")).over(wAll).as("n_a"),
        sum(col("nb")).over(wAll).as("n_b"))
      cum.groupBy(col("event_type"))
        .agg(max(col("n_a")).as("n_a"), max(col("n_b")).as("n_b"),
          max(abs(col("cuma").cast(D) * col("n_b").cast(D) -
            col("cumb").cast(D) * col("n_a").cast(D))).as("d_num_d"))
        .select(col("event_type"), col("n_a"), col("n_b"),
          col("d_num_d").cast("long").as("d_num"),
          (col("d_num_d").cast("double") /
            (col("n_a").cast("double") * col("n_b").cast("double"))).as("d"),
          (lit(1000000).cast(D) * col("d_num_d") * col("d_num_d") >
            lit(1844164).cast(D) * col("n_a").cast(D) * col("n_b").cast(D) *
              (col("n_a") + col("n_b")).cast(D)).as("significant"))
    }),

    // --- Poisson-bootstrap confidence interval ------------------------------------
    // THE way to bootstrap at corpus scale: classical resampling draws B
    // full copies of the data (dead at 100 TB); the Poisson bootstrap
    // (Chamandy et al., streaming-bootstrap lineage) observes that a
    // bootstrap multiplicity is Binomial(n, 1/n) → Poisson(1), so each row
    // independently contributes a Poisson(1) weight PER REPLICA and every
    // replica statistic folds in the same single pass. Determinism across
    // engines/partitionings: the weight is a pure function of
    // (replica, event_id) — one md5 per (row, replica OCTET) yields EIGHT
    // 16-bit uniforms (128 bits sliced 4 hex chars at a time, so the hash
    // bill is B/8 md5s per row, not B — with the shift-based slice
    // extraction, measured 2.4× faster end to end), each walked
    // through PRECOMPUTED integer thresholds ⌊CDF_Pois(1)(k)·2^16⌋ (the
    // same literals on both engines — no cross-engine libm, no RNG state).
    // Replica means are exact integers (cents scaled 1e4, DECIMAL(38)
    // product then integer div), the CI is the 2nd order statistic from
    // each tail of the B=64 replica means (nominal ~95%; rank-based, no
    // float percentile semantics to disagree on). Shape: one scan →
    // explode×(B/8) for the hashes → ×8 slice explode → hash agg keyed
    // (type, b) that map-side-combines to B partials per type per task →
    // a (types × B)-row window. Shuffle volume is types×B counters
    // regardless of corpus size; no resampled copy of the data ever
    // exists.
    "q223_bootstrap_ci" -> ((s, d) => {
      val B = BootReplicas
      // CPU-parallelize the replica ladder: the explode×8 + md5-per-row
      // chain below is the query's whole cost, and narrow-chained onto the
      // scan it runs at input-split parallelism (ONE task on a single-file
      // events table — measured 6 tasks / 2.7 s for the query). The hash
      // repartition of the 3-column projection costs ~1.7 MB of shuffle
      // and fans the digest work across every core. GATED on the planned
      // split count (r17, the same q73/q76 discipline): at cluster scale
      // the scan has thousands of splits and the exchange — a full
      // corpus-wide shuffle that existed only to fix the local small-file
      // artifact — is not planned at all.
      val ev = TextFns.fanCpu(
        t(s, d, "events").select(col("event_id"), col("event_type"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c")),
        col("event_id"))
      val w = PoissonCdf16.zipWithIndex.foldRight(lit(PoissonCdf16.length)
          .cast("long")) { case ((thr, k), rest) =>
        when(col("u") < thr, k.toLong).otherwise(rest)
      }
      val reps = ev
        .select(col("event_id"), col("event_type"), col("c"),
          explode(sequence(lit(0), lit(B / 8 - 1))).as("j"))
        .withColumn("h", md5(concat(lit("bs|"), col("j").cast("string"),
          lit("|"), col("event_id").cast("string"))))
        // parse the 32-hex digest as three ≤48-bit ints ONCE, then pull
        // each 16-bit slice with shifts — 3 string parses per digest
        // instead of 8 (the slicing, not the md5, was the hotspot:
        // measured 5.4 s → 2.3 s on the whole query at sf0.1)
        .select(col("event_type"), col("c"), col("j"),
          expr("cast(conv(substring(h, 1, 12), 16, 10) as bigint)").as("h0"),
          expr("cast(conv(substring(h, 13, 12), 16, 10) as bigint)").as("h1"),
          expr("cast(conv(substring(h, 25, 8), 16, 10) as bigint)").as("h2"))
        .select(col("event_type"), col("c"), col("j"),
          posexplode(expr(
            "array(shiftright(h0, 32) & 65535, shiftright(h0, 16) & 65535," +
            " h0 & 65535, shiftright(h1, 32) & 65535," +
            " shiftright(h1, 16) & 65535, h1 & 65535," +
            " shiftright(h2, 16) & 65535, h2 & 65535)"))
            .as(Seq("k", "u")))
        .select(col("event_type"), col("c"), col("u"),
          (col("j") * 8 + col("k")).cast("long").as("b"))
        .groupBy(col("event_type"), col("b"))
        .agg(sum(w).as("sw"), sum(w * col("c")).as("swc"))
        .where(col("sw") > 0)
        .select(col("event_type"), col("b"),
          expr("(cast(swc as decimal(38,0)) * 10000) div sw").as("mean_b"))
      val wRank = Window.partitionBy(col("event_type"))
        .orderBy(col("mean_b"), col("b"))
      val wAll = Window.partitionBy(col("event_type"))
      val ci = reps
        .select(col("event_type"),
          row_number().over(wRank).as("rn"),
          count(lit(1)).over(wAll).as("n_boot"), col("mean_b"))
        .groupBy(col("event_type"))
        .agg(max(col("n_boot")).as("n_boot"),
          max(when(col("rn") === 2, col("mean_b"))).as("ci_lo"),
          max(when(col("rn") === col("n_boot") - 1, col("mean_b")))
            .as("ci_hi"))
      val point = ev.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sum_c"))
        .select(col("event_type"), col("n"),
          expr("(cast(sum_c as decimal(38,0)) * 10000) div n").as("mean_u"))
      point.join(ci, Seq("event_type"))
        .select(col("event_type"), col("n"), col("mean_u"), col("n_boot"),
          col("ci_lo"), col("ci_hi"),
          (col("ci_lo") <= col("mean_u") && col("mean_u") <= col("ci_hi"))
            .as("covers_point"))
    }),

    // --- term-burst detection (corpus-monitoring anomaly board) --------------------
    // The ingestion-monitoring staple: which items suddenly spiked today
    // vs their own trailing week? Item = the props.k attribute (the
    // 100-value payload key), day series per item, burst ⇔
    // 7·n_today > 3·(trailing 7-day sum) with a small absolute floor —
    // a pure integer inequality (no float rates), so the verdict is
    // engine- and partitioning-independent. Days with no activity simply
    // have no row, and the RANGE(-7,-1) frame on the integer day key
    // counts them as zero implicitly — no calendar densify needed for
    // SUM (unlike q222's register spine, where the window op is MAX).
    // Warm-up: only days with a full trailing week inside the corpus are
    // judged (global min-day broadcast). Shape: one corpus scan into the
    // (item × day) histogram (map-side combinable), then a window over
    // the value-domain-bounded histogram — items parallelize the window,
    // corpus rows never sort. 100 TB: the histogram is items × days
    // cells regardless of corpus size.
    "q224_term_bursts" -> ((s, d) => {
      val ev = t(s, d, "events").select(
        get_json_object(col("props"), "$.k").cast("long").as("item"),
        unix_date(to_date(col("ts"))).cast("long").as("day"))
      val hist = ev.groupBy(col("item"), col("day"))
        .agg(count(lit(1)).as("n"))
      val mind = hist.agg(min(col("day")).as("mind"))
      val w = Window.partitionBy(col("item")).orderBy(col("day"))
        .rangeBetween(-7, -1)
      hist
        .withColumn("base_sum", coalesce(sum(col("n")).over(w), lit(0L)))
        .join(broadcast(mind))
        .where(col("day") >= col("mind") + 7)
        .select(col("item"), col("day"), col("n"), col("base_sum"),
          (col("n") * 7 > col("base_sum") * BurstFactor &&
            col("n") >= MinBurstCount).as("is_burst"))
    }),

    // --- session-duration survival table (KM risk set + integer hazard) ------------
    // The survival-analysis staple none of the cohort metrics cover: how
    // long do sessions LIVE, with proper right-censoring — a session whose
    // last event is within one gap of the corpus end may still be open, so
    // counting it as "ended at its observed length" would bias every
    // duration short (the classic mistake survival analysis exists to
    // fix). Unit = the q25 session (same SessionGap constant, so the two
    // queries cannot disagree about what a session is); duration = whole
    // hours between first and last event. Output is the Kaplan–Meier risk
    // table per duration t — n_risk (sessions alive at t), n_event
    // (observed ends at t), n_censor — plus the discretized Nelson–Aalen
    // cumulative hazard Σ_{s≤t} ⌊1e6·d_s / n_risk(s)⌋, an exact-integer
    // cumulative sum (each term one integer division, so the curve is
    // engine- and partitioning-independent; the float KM product survives
    // nowhere near a hash gate). Shape: one user-keyed session agg (the
    // q25 shuffle), session-sized rows collapse to the duration histogram
    // (map-side combinable), then ONE window over the value-domain-bounded
    // durations. 100 TB: everything past the session agg is
    // (max-duration)-sized.
    "q229_session_survival" -> ((s, d) => {
      val sess = t(s, d, "events")
        .groupBy(session_window(col("ts"), SessionGap).as("sw"),
          col("user_id"))
        .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
        .select(col("st"), col("en"))
      val maxEn = sess.agg(max(col("en")).as("max_en"))
      val lifet = sess.join(broadcast(maxEn))
        .select(
          expr("(unix_micros(en) - unix_micros(st)) div 3600000000")
            .as("t"),
          (col("en") < col("max_en") -
            expr(s"INTERVAL $SessionGapHours HOURS")).as("ended"))
      val hist = lifet.groupBy(col("t"))
        .agg(sum(when(col("ended"), 1L).otherwise(0L)).as("n_event"),
          sum(when(!col("ended"), 1L).otherwise(0L)).as("n_censor"))
      val total = hist
        .agg(sum(col("n_event") + col("n_censor")).as("total"))
      val wBefore = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val wCum = Window.orderBy(col("t"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      hist.join(broadcast(total))
        .withColumn("n_risk",
          col("total") -
            coalesce(sum(col("n_event") + col("n_censor")).over(wBefore),
              lit(0L)))
        .withColumn("cum_hazard_u",
          sum(expr("(1000000 * n_event) div n_risk")).over(wCum))
        .select(col("t"), col("n_risk"), col("n_event"), col("n_censor"),
          col("cum_hazard_u"))
    }),

    // --- CUSUM level-shift detection (the sequential sibling of q224) --------------
    // Bursts (q224) catch SPIKES against a local baseline; CUSUM catches
    // sustained small SHIFTS — the Page (1954) statistic
    // S_t = max(0, S_{t−1} + y_t) accumulates deviations above an
    // allowance until a threshold trips, detecting a 0.3σ drift weeks
    // before any single-day test fires. The recursive max looks
    // window-hostile, but the classical identity
    //   S_t = C_t − min(0, min_{s≤t} C_s),  C = prefix sums of y,
    // turns it into TWO ordinary cumulative frames over the per-type day
    // series — no recursion, no UDAF, each day one row of the
    // (types × days) histogram. y is the day's mean in micro-cents
    // (integer div, q223 currency) minus the type's corpus mean minus
    // the allowance — all exact integers, so alarm days are engine- and
    // partitioning-independent. Shape: one corpus scan → (type × day)
    // hash agg; everything after is value-domain-sized window work.
    "q230_cusum_shift" -> ((s, d) => {
      val daily = t(s, d, "events")
        .select(col("event_type"),
          unix_date(to_date(col("ts"))).cast("long").as("day"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
        .groupBy(col("event_type"), col("day"))
        .agg(count(lit(1)).as("n"), sum(col("c")).as("sc"))
      val mu = daily.groupBy(col("event_type"))
        .agg(expr("(cast(sum(sc) as decimal(38,0)) * 10000) div sum(n)")
          .as("mu"))
      val wCum = Window.partitionBy(col("event_type")).orderBy(col("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      daily.join(broadcast(mu), "event_type")
        .select(col("event_type"), col("day"), col("n"),
          (expr("(cast(sc as decimal(38,0)) * 10000) div n") - col("mu") -
            CusumAllowanceU).as("y"))
        .withColumn("cu", sum(col("y")).over(wCum))
        .withColumn("s",
          col("cu") - least(min(col("cu")).over(wCum), lit(0L)))
        .select(col("event_type"), col("day"), col("n"), col("y"),
          col("s").as("cusum"), (col("s") > CusumThresholdU).as("alarm"))
    }),

    // --- exact rolling 7-day distinct users (WAU per day) ------------------------
    // The observability staple exact sliding-window COUNT DISTINCT — the one
    // rolling metric that is NOT mergeable (distinct isn't group-invertible,
    // so no RANGE-frame trick applies). The naive plans are a per-day
    // distinct over a 7-day self-join (7× corpus) or a global
    // (user, day)-exploded distinct (7× active-pairs shuffled TWICE). This
    // plan pays neither: a user active on day a covers [a, a+6], and the
    // union of those per-user intervals is emitted DISJOINT directly from
    // one lead() pass — each active day covers [day, min(next_day−1,
    // day+6, maxd)] (consecutive covers chain, so their union is exactly
    // the merged activity runs). Disjointness makes the final count a plain
    // COUNT, not COUNT DISTINCT: one (user)-keyed shuffle for the lead
    // window + one day-histogram agg, the exploded rows never exceed 7×
    // the distinct (user, day) pairs and are map-side-combined into
    // day-sized partials. Output days clamp to the corpus max day
    // (broadcast 1-row scalar) so the window never reports past the data.
    "q216_rolling_uniques" -> ((s, d) => {
      val act = t(s, d, "events")
        .select(col("user_id"),
          unix_date(to_date(col("ts"))).cast("long").as("day"))
        .distinct()
      val maxd = act.agg(max(col("day")).as("maxd"))
      val wLead = Window.partitionBy(col("user_id")).orderBy(col("day"))
      act.join(broadcast(maxd))
        .select(col("user_id"), col("day"),
          least(coalesce(lead(col("day"), 1).over(wLead) - 1,
              lit(Long.MaxValue)),
            col("day") + 6, col("maxd")).as("e"))
        .select(col("user_id"),
          explode(sequence(col("day"), col("e"))).as("day"))
        .groupBy(col("day"))
        .agg(count(lit(1)).as("rolling_users"))
    }),

    // --- compaction planner (small-file bin packing) -----------------------------
    // The OPTIMIZE/compaction maintenance pass every lakehouse table needs:
    // roll small files into ~target-sized rewrite bins. Files here are the
    // (source, doc_id div 4) manifest entries with their char mass; within
    // each source, files order by (bytes DESC, file_id) — a deterministic
    // total order, largest-first so big files seed bins — and bin_id =
    // ⌊cum_before / target⌋ (next-fit-by-quota: a file opens a new bin when
    // the running mass crosses a target boundary). The window runs over the
    // FILE MANIFEST, never corpus rows — exactly what a real OPTIMIZE
    // planner scans — partitioned by source, so planning parallelizes
    // across table partitions at any scale. Output is the rewrite manifest:
    // files and byte mass per bin plus the file-id zone map (min/max) each
    // rewritten bin will carry. All integers — hash-exact.
    "q219_compaction_plan" -> ((s, d) => {
      val files = t(s, d, "documents")
        .groupBy(col("source"), expr("doc_id div 4").as("file_id"))
        .agg(sum(col("n_chars")).as("bytes"))
      val w = Window.partitionBy(col("source"))
        .orderBy(col("bytes").desc, col("file_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
      files
        .withColumn("cumb", coalesce(sum(col("bytes")).over(w), lit(0L)))
        .select(col("source"), col("file_id"), col("bytes"),
          expr(s"cumb div $CompactTargetBytes").as("bin_id"))
        .groupBy(col("source"), col("bin_id"))
        .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("bin_bytes"),
          min(col("file_id")).as("min_file"), max(col("file_id")).as("max_file"))
    }),

    // --- Spearman rank correlation ------------------------------------------------
    // The rank sibling of q100's exact-moment Pearson: monotone association
    // between quantity and price per return flag, robust to the metric's
    // scale. Midranks are the doubled integer form (2·rank = 2·cnt(<v) + t
    // + 1 — ties get exact average ranks, nothing fractional), and ρ is
    // Pearson over the integer rank pairs: six DECIMAL(38) moments, then
    // scalar float algebra whose only libm call is sqrt — IEEE-exact and
    // bit-portable. Scale shape, split by dimension cardinality: quantity
    // cents have a BOUNDED domain (150 (group, value) cells), so its rank
    // map is a broadcast lookup — no corpus shuffle. Price cents are
    // nearly UNIQUE (a histogram would be corpus-sized — broadcasting it
    // was measured a wash), so price midranks come from one window pass
    // over the rows themselves: rank() gives cnt(<v)+1 and a RANGE(0,0)
    // count gives the tie size t on the SAME per-group sort, i.e. ONE
    // corpus shuffle total. The per-group sort is the honest cost of exact
    // ranks on a continuous variable (group count is small here); a
    // two-phase range-partitioned rank was measured slower at this scale
    // and needs cross-branch partition-boundary consistency.
    "q198_spearman" -> ((s, d) => {
      val D = DecimalType(38, 0)
      val li = t(s, d, "lineitem").select(col("l_returnflag").as("g"),
        (col("l_quantity").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("q"),
        (col("l_extendedprice").cast(DecimalType(18, 2)) * 100).cast("long")
          .as("p"))
      def rank2(dim: String): DataFrame = {
        val w = Window.partitionBy(col("g")).orderBy(col(dim))
          .rowsBetween(Window.unboundedPreceding, -1)
        li.groupBy(col("g"), col(dim)).agg(count(lit(1)).as("t"))
          .withColumn("cum", coalesce(sum(col("t")).over(w), lit(0L)))
          .select(col("g"), col(dim),
            (lit(2) * col("cum") + col("t") + 1).as(s"r2_$dim"))
      }
      val wp = Window.partitionBy(col("g")).orderBy(col("p"))
      li.withColumn("r2_p", lit(2) * rank().over(wp) +
          count(lit(1)).over(wp.rangeBetween(0, 0)) - 1)
        .join(broadcast(rank2("q")), Seq("g", "q"))
        .select(col("g"), col("r2_q").cast(D).as("x"),
          col("r2_p").cast(D).as("y"))
        .groupBy(col("g"))
        .agg(count(lit(1)).cast(D).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("y") * col("y")).as("syy"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("g").as("l_returnflag"), col("n").cast("long").as("n"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            sqrt((col("n") * col("sxx") - col("sx") * col("sx"))
              .cast("double") *
              (col("n") * col("syy") - col("sy") * col("sy"))
                .cast("double"))).as("spearman_rho"))
    }),

    // --- Benford's-law first-digit audit -----------------------------------------
    // The forensic data-quality read (fabricated or re-scaled numeric
    // columns flunk it): distribution of the first significant digit of
    // price cents vs Benford's log10(1+1/d). The digit comes from the
    // DECIMAL-exact cents rendered as a decimal string (no float log, no
    // sci-notation risk on integers); expected probabilities are the SAME
    // Scala-computed double literals embedded in both engines' plans, so
    // the comparison columns are bit-identical. One narrow scan + one
    // 9-key hash agg + a broadcast total.
    "q194_benford_audit" -> ((s, d) => {
      val cents = (col("l_extendedprice").cast(DecimalType(18, 2)) * 100)
        .cast("long")
      val digits = t(s, d, "lineitem")
        .select(substring(cents.cast("string"), 1, 1).cast("int").as("digit"))
        .groupBy(col("digit")).agg(count(lit(1)).as("n"))
      val tot = digits.agg(sum(col("n")).as("total"))
      digits.join(broadcast(tot))
        .select(col("digit"), col("n"),
          (col("n").cast("double") / col("total")).as("observed"),
          element_at(array((1 to 9).map(dd =>
            lit(math.log10(1.0 + 1.0 / dd))): _*), col("digit"))
            .as("benford_p"))
        .select(col("digit"), col("n"), col("observed"), col("benford_p"),
          (col("observed") - col("benford_p")).as("deviation"))
    }),

    // --- per-group OLS trend (exact-moment linear regression) ------------------
    // q100's exact-moment discipline extended from correlation to the
    // regression line: per event type, slope and intercept of value (exact
    // cents) on time (whole seconds since the GLOBAL min timestamp — the
    // centering is what keeps n·Σx² inside DECIMAL(38); raw epoch-µs
    // squares overflow 38 digits at 60k rows). All five moments accumulate
    // in DECIMAL(38,0) ≙ HUGEINT; slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²) and
    // intercept = (ΣyΣx²−ΣxΣxy)/same are single double divisions of exact
    // integers, so the line is bit-identical across engines and partition
    // orders — the property the float-accumulating built-in regr_slope
    // cannot give. One scan, one tiny broadcast (the scalar t0), one hash
    // agg: the 100 TB plan is the same plan.
    "q127_group_trend" -> ((s, d) => {
      val D = DecimalType(38, 0)
      val ev = t(s, d, "events").select(col("event_type"),
        unix_micros(col("ts")).as("us"),
        (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("c"))
      val t0 = ev.agg(min(col("us")).as("us0"))
      val base = ev.join(broadcast(t0))
        .select(col("event_type"),
          expr("(us - us0) div 1000000").cast(D).as("x"),
          col("c").cast(D).as("y"))
      base.groupBy(col("event_type"))
        .agg(count(lit(1)).cast(D).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(col("x") * col("y")).as("sxy"))
        .select(col("event_type"), col("n").cast("long").as("n_rows"),
          ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("slope_cents_per_s"),
          ((col("sy") * col("sxx") - col("sx") * col("sxy")).cast("double") /
            (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
            .as("intercept_cents"))
    }),

    // --- per-event lag features (training feature generation) ------------------
    // The feature-engineering shape a sequence model trains on: per event,
    // the previous value, the inter-event gap, and a trailing 3-event mean
    // — one user_id shuffle serves every LAG. The trailing window is built
    // from EXPLICIT lags with pinned association ((v + l1) + l2), not a
    // rowsBetween frame: sliding-frame sums may run incrementally (segment
    // trees in DuckDB, add/retract in Spark) and float addition is not
    // associative, so frame aggregation is exactly where two engines drift
    // bit-wise. Gaps are exact int64 microseconds. At 100 TB this is the
    // q122 scale story verbatim: per-entity history sorts within its
    // partition, q120 profiles the skew first.
    "q126_lag_features" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      t(s, d, "events")
        .select(col("event_id"), col("user_id"), col("ts"), col("value"))
        .select(col("event_id"), col("user_id"),
          lag(col("value"), 1).over(w).as("prev_value"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w)))
            .as("gap_us"),
          lag(col("value"), 2).over(w).as("l2"), col("value"))
        .select(col("event_id"), col("user_id"), col("prev_value"), col("gap_us"),
          (lit(1L) + col("prev_value").isNotNull.cast("long")
            + col("l2").isNotNull.cast("long")).as("trail3_n"),
          (((col("value") + coalesce(col("prev_value"), lit(0.0)))
            + coalesce(col("l2"), lit(0.0))) /
            (lit(1L) + col("prev_value").isNotNull.cast("long")
              + col("l2").isNotNull.cast("long")).cast("double"))
            .as("trail3_mean"))
    }),

    // --- z-order clustering key (multi-dimensional data layout) ----------------
    // The layout primitive behind 2-D file skipping (Delta/Iceberg OPTIMIZE
    // ZORDER): normalize each dimension to 10 bits with the q104 affine map
    // (numerator in DECIMAL(38,0) — int64 would wrap where DuckDB raises),
    // interleave the bits into a 20-bit Morton code, and summarize each
    // 1024-row-group bucket (z >> 10) with its per-dimension extents. The
    // point the output PROVES: fixing a z-bucket pins the top 5 bits of
    // BOTH dimensions, so every bucket's extent is ≤ 31 bins in each dim —
    // min/max file stats then prune 2-D predicates, which a 1-D sort gives
    // only for its leading column. The interleave is a 10-term
    // shift/mask/add tree — straight-line whole-stage codegen, no UDF. At
    // 100 TB: write-side, range-partition by z and this bucket summary IS
    // the manifest-stats table; the query itself is one scan + one agg.
    "q125_zorder_layout" -> ((s, d) =>
      zorderCoded(s, d).withColumn("zbucket", shiftright(col("code"), 10))
        .groupBy(col("zbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("xa")).as("xa_min"), max(col("xa")).as("xa_max"),
          min(col("xb")).as("xb_min"), max(col("xb")).as("xb_max"))),

    // --- Hilbert-curve layout (the locality tier above z-order) -----------------
    // q125's bucket audit under a Hilbert space-filling curve: unlike
    // Morton/z-order, consecutive Hilbert codes are ALWAYS Manhattan-
    // adjacent cells (no diagonal jumps across half the key space), so
    // Hilbert-clustered files carry tighter per-file min/max zone maps —
    // the reason Databricks liquid clustering moved past z-order. The
    // xy2d walk is 10 unrolled rotate/flip levels of pure integer bit
    // arithmetic (shift/mask/xor — whole-stage codegen, zero shuffle
    // beyond q125's same bounds broadcast + final bucket agg). The spec
    // pins the JVM reference round-trip (d2xy∘xy2d = id, consecutive
    // codes adjacent — the property z-order provably fails) and SQL==JVM
    // on the corpus.
    "q189_hilbert_layout" -> ((s, d) =>
      hilbertCoded(s, d).withColumn("hbucket", shiftright(col("code"), 10))
        .groupBy(col("hbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("xa")).as("xa_min"), max(col("xa")).as("xa_max"),
          min(col("xb")).as("xb_min"), max(col("xb")).as("xb_max"))),

    // --- Hilbert-CLUSTERED table round-trip (the write path, oracle-gated) ------
    // q189 through the materialized layout: write the coded frame
    // range-partitioned + sorted by Hilbert code to parquet (the actual
    // clustered-table deliverable — see [[clusteredRoundtrip]]), read it
    // back, and run the identical bucket audit. Hash-green against the same
    // oracle as q189 proves the clustering write is exactly row-preserving;
    // `ClusteredLayoutSpec` proves the layout then PAYS (2-D range scans
    // skip files lex layouts must read).
    "q175_hilbert_clustered" -> ((s, d) =>
      clusteredRoundtrip(s, d, hilbertCoded(s, d), "hilbert", 16)
        .withColumn("hbucket", shiftright(col("code"), 10))
        .groupBy(col("hbucket"))
        .agg(count(lit(1)).as("n"),
          min(col("xa")).as("xa_min"), max(col("xa")).as("xa_max"),
          min(col("xb")).as("xb_min"), max(col("xb")).as("xb_max"))),

    // --- layout-quality comparison (z-order vs Hilbert, quantified) -------------
    // The layout-maintenance monitoring read: per curve layout, the
    // row-weighted mean bucket bounding-box semi-perimeter
    // ((xa_max−xa_min)+(xb_max−xb_min)) — the proxy for per-file zone-map
    // width, i.e. how much a range predicate over either dimension can
    // prune. Bucket = code >> 9 (512 curve cells, the odd power — at
    // power-of-FOUR granularity both curves tile identical aligned
    // squares and the numbers are vacuously equal). Honest geometry: even
    // at the odd power the two curves' ALIGNED buckets both span ~32×16
    // (a Morton half-block and two edge-adjacent Hilbert squares have the
    // same bbox), so neither dominates the other here — Hilbert's
    // adjacency advantage (q189's spec) shows on arbitrary RANGE
    // segments, not aligned buckets. What the audit does decide, with a
    // number: BOTH curves beat the lexicographic (sort-by-a-then-b)
    // layout every real table starts from by ~an order of magnitude —
    // the spec pins that against a JVM lex baseline. Weighted mean is
    // Σn·sp / Σn, exact integers into one float division.
    "q195_layout_quality" -> ((s, d) => {
      def quality(layout: String, coded: DataFrame) =
        coded.withColumn("bucket", shiftright(col("code"), 9))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            ((max(col("xa")) - min(col("xa"))) +
              (max(col("xb")) - min(col("xb")))).as("sp"))
          .select(lit(layout).as("layout"), col("n"), col("sp"))
          .groupBy(col("layout"))
          .agg(count(lit(1)).as("n_buckets"), sum(col("n")).as("total_rows"),
            (sum(col("n") * col("sp")).cast("double") / sum(col("n")))
              .as("avg_semiperimeter"))
      quality("zorder", zorderCoded(s, d))
        .unionAll(quality("hilbert", hilbertCoded(s, d)))
    }),

    // --- CDC -> SCD2 compaction (consecutive-run collapse) ---------------------
    // The change-data-capture primitive: per entity, collapse consecutive
    // events carrying the same state into one validity interval
    // [valid_from, valid_to) — valid_to NULL marks the open current row.
    // Gaps-and-islands, shaped for scale: ONE shuffle keyed on user_id
    // serves all three steps (change-mark window, run-id prefix sum,
    // per-run agg) because filter/project preserve the partitioning and the
    // closing LEAD window re-sorts run-sized rows, not events. Change
    // detection uses null-safe equality (<=>), the exact twin of the
    // oracle's IS DISTINCT FROM, so a NULL state forms its own run instead
    // of gluing to its neighbors. Ordering is (ts, event_id) — total even
    // if two events ever share a timestamp, so the run ids (and therefore
    // the hash) never depend on partition layout.
    "q122_scd2_compact" -> ((s, d) => {
      val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
      val runs = t(s, d, "events")
        .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
        .withColumn("chg",
          when(not(lag(col("event_type"), 1).over(w) <=> col("event_type")), 1L)
            .otherwise(0L))
        .withColumn("run_id", sum(col("chg")).over(w))
      runs.groupBy(col("user_id"), col("run_id"))
        .agg(min(col("event_type")).as("event_type"),
          min(col("ts")).as("valid_from"),
          count(lit(1)).as("n_events"))
        .select(col("user_id"), col("event_type"), col("valid_from"),
          lead(col("valid_from"), 1)
            .over(Window.partitionBy(col("user_id")).orderBy(col("valid_from")))
            .as("valid_to"),
          col("n_events"))
    }),

    // --- point-in-time snapshots from SCD2 intervals ----------------------------
    // The time-travel read that SCD2 exists to serve: reconstruct, for
    // every day boundary, the state each entity was in at that instant
    // (the "dimension as of" lookup behind snapshot reports and training
    // features frozen at label time; the grain — day here, month/hour in
    // production — is a parameter of the pattern). Instead of probing
    // with a range-predicate join — BNL against a generated calendar —
    // each q122 interval EXPANDS to the day starts it covers: lo = first
    // day boundary >= valid_from, hi = last boundary < valid_to (open
    // intervals run to the global max day). The expansion is a per-row
    // sequence+explode riding q122's single user_id shuffle — zero extra
    // shuffles, no join against the calendar at all; the only join is the
    // broadcast 1-row global-max-day scalar. Days-per-interval is bounded
    // by the corpus time span, so output is |intervals| × span-days worst
    // case, and each snapshot row is provably the regime whose
    // [valid_from, valid_to) contains it.
    "q134_pit_snapshot" -> ((s, d) => {
      val iv = queries("q122_scd2_compact")(s, d)
      val m1 = t(s, d, "events")
        .agg(date_trunc("day", max(col("ts"))).as("m1"))
      iv.join(broadcast(m1))
        .select(col("user_id"), col("event_type"), col("n_events"),
          when(col("valid_from") === date_trunc("day", col("valid_from")),
            col("valid_from"))
            .otherwise(
              expr("timestampadd(DAY, 1, date_trunc('day', valid_from))"))
            .as("lo"),
          when(col("valid_to").isNull, col("m1"))
            .otherwise(date_trunc("day",
              expr("timestampadd(MICROSECOND, -1, valid_to)"))).as("hi"))
        .select(col("user_id"),
          explode(when(col("lo") <= col("hi"),
            expr("sequence(lo, hi, interval '1' day)"))
            .otherwise(expr("cast(array() as array<timestamp>)")))
            .as("snap_ts"),
          col("event_type"), col("n_events"))
    }),

    // --- incremental aggregate refresh (materialized-view maintenance) ----------
    // The materialize-once story for AGGREGATES: a stored per-key partial
    // state (count / decimal sum / min / max — each mergeable) absorbs a
    // delta batch by MERGING states, never rescanning the base. Here base
    // = events before the last day boundary (the stored MV), delta = the
    // final day (the incoming batch); [[mergeAggPartials]] is the refresh
    // contract and the spec proves merge == from-scratch EXACTLY — which
    // only holds because the sum runs in DECIMAL(18,2) (exact, therefore
    // associative; a double sum would drift per merge order) and avg is
    // derived from (sum, count) at read time, never stored. At 100 TB the
    // base partials are #keys-sized parquet; a refresh costs one scan of
    // the DELTA plus a #keys-sized merge — corpus-independent.
    "q146_mv_refresh" -> ((s, d) => {
      val ev = t(s, d, "events")
      val b = ev.agg(date_trunc("day", max(col("ts"))).as("cutoff"))
      val withCut = ev.join(broadcast(b))
      mergeAggPartials(
        aggPartials(withCut.filter(col("ts") < col("cutoff"))),
        aggPartials(withCut.filter(col("ts") >= col("cutoff"))))
    }),

    // --- snapshot diff between two PIT instants ---------------------------------
    // The table-diff read on top of SCD2 (q122/q134's missing third leg):
    // what changed between snapshot t1 (first day boundary after data
    // start) and t2 (last day boundary)? Per entity: added (absent at t1),
    // removed (absent at t2 — structurally empty here because CDC without
    // delete markers keeps every open interval live forever; the class
    // exists so a delete-marker feed lights it up with zero code change),
    // changed / unchanged by null-safe state comparison. Instead of
    // materializing both snapshots through q134's calendar expansion, each
    // side is an as-of interval-containment FILTER over the q122 frame —
    // the two filters are exchange-reused off ONE user_id shuffle, the t1/
    // t2 bounds ride a broadcast 1-row scalar, and the diff itself is a
    // #users-sized full-outer join. Presence is tracked by literal flags,
    // not state nullness, so a genuinely-NULL state is still "present".
    "q145_snapshot_diff" -> ((s, d) => {
      val iv = queries("q122_scd2_compact")(s, d)
      val b = t(s, d, "events").agg(
        expr("timestampadd(DAY, 1, date_trunc('day', min(ts)))").as("t1"),
        date_trunc("day", max(col("ts"))).as("t2"))
      val snap = iv.join(broadcast(b))
      def stateAt(tc: String, state: String, n: String, p: String) = snap
        .filter(col("valid_from") <= col(tc) &&
          (col("valid_to").isNull || col("valid_to") > col(tc)))
        .select(col("user_id"), col("event_type").as(state),
          col("n_events").as(n), lit(true).as(p))
      stateAt("t1", "state_before", "nb", "p1")
        .join(stateAt("t2", "state_after", "na", "p2"),
          Seq("user_id"), "full_outer")
        .select(col("user_id"), col("state_before"), col("state_after"),
          coalesce(col("nb"), lit(0L)).as("n_before"),
          coalesce(col("na"), lit(0L)).as("n_after"),
          when(col("p1").isNull, lit("added"))
            .when(col("p2").isNull, lit("removed"))
            .when(col("state_before") <=> col("state_after"), lit("unchanged"))
            .otherwise(lit("changed")).as("change"))
    }),

    "q120_key_skew" -> ((s, d) => {
      def profile(df: DataFrame, keyCol: String, label: String): DataFrame =
        df.groupBy(col(keyCol).cast("string").as("k"))
          .agg(count(lit(1)).as("n"))
          .agg(count(lit(1)).as("n_keys"),
            sum(col("n")).as("total"),
            max(col("n")).as("max_n"),
            sum(col("n").cast(DecimalType(38, 0)) * col("n")).as("sumsq_d"))
          .select(lit(label).as("key_col"), col("n_keys"), col("total"),
            col("max_n"), col("sumsq_d").cast("long").as("sum_sq"),
            (col("max_n").cast("double") / col("total")).as("top1_share"),
            ((col("n_keys") * col("sumsq_d")).cast("double") /
              (col("total").cast(DecimalType(38, 0)) * col("total")).cast("double"))
              .as("skew"))
      profile(t(s, d, "events"), "user_id", "events.user_id")
        .union(profile(t(s, d, "events"), "event_type", "events.event_type"))
        .union(profile(t(s, d, "lineitem"), "l_suppkey", "lineitem.l_suppkey"))
        .union(profile(t(s, d, "orders"), "o_custkey", "orders.o_custkey"))
    }),

    // --- PageRank over the nation trade network (iterative graph agg) ----------
    // Graph centrality as a relational query: nodes = nations, a directed
    // edge src -> dst weighted by lineitems flowing supplier-nation ->
    // customer-nation, then THREE unrolled PageRank iterations (damping
    // 17/20). All arithmetic is exact integer: mass is scaled to PrScale,
    // each contribution is (pr·w·17) div (outw·20) with the product carried
    // in DECIMAL(38,0) — pr·w·17 brushes past int64 — and the div result
    // back in int64 (the q100/q104 discipline, so shuffle order cannot
    // perturb a single unit of mass and the oracle hash-matches an
    // iterative float algorithm could never pin). Dangling-node mass is
    // dropped (standard simplification; documented, not redistributed).
    // Scale shape: the edge build is the q05 star join collapsing to
    // #nations² rows; every iteration is then a broadcast join + hash agg
    // over model-sized tables — iteration cost is independent of corpus
    // size, which is why unrolling is safe at 100 TB.
    "q118_pagerank" -> ((s, d) => {
      val edges = t(s, d, "lineitem")
        .join(t(s, d, "orders"), col("l_orderkey") === col("o_orderkey"))
        .join(t(s, d, "customer"), col("o_custkey") === col("c_custkey"))
        .join(broadcast(t(s, d, "supplier")), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("s_nationkey").as("src"), col("c_nationkey").as("dst"))
        .agg(count(lit(1)).as("w"))
      val outw = edges.groupBy(col("src")).agg(sum(col("w")).as("outw"))
      val e = edges.join(outw, Seq("src"))
      val nodes = t(s, d, "nation")
        .select(col("n_nationkey").as("node"), col("n_name"))
      val nn = nodes.agg(count(lit(1)).as("n_nodes"))
      var pr = nodes.select(col("node")).join(broadcast(nn))
        .select(col("node"),
          expr(s"cast($PrScale as decimal(38,0)) div cast(n_nodes as decimal(38,0))")
            .as("pr"))
      for (_ <- 1 to PrIters) {
        val contrib = pr.join(broadcast(e), col("node") === col("src"))
          .select(col("dst"),
            expr("(cast(pr as decimal(38,0)) * w * 17) div (cast(outw as decimal(38,0)) * 20)")
              .as("c"))
          .groupBy(col("dst")).agg(sum(col("c")).as("inc"))
        pr = nodes.select(col("node")).join(broadcast(nn))
          .join(broadcast(contrib), col("node") === col("dst"), "left")
          .select(col("node"),
            (expr(s"cast(3 * $PrScale as decimal(38,0)) div cast(20 * n_nodes as decimal(38,0))") +
              coalesce(col("inc"), lit(0L))).as("pr"))
      }
      nodes.join(pr, Seq("node"))
        .select(col("n_name"), col("pr"))
    }),

    // --- statistical aggregates from exact moments ------------------------------
    // stddev/corr built-ins accumulate floating state in shuffle order, so
    // they are not reproducible across engines; computing the moments as
    // exact DECIMAL sums and doing the final arithmetic in doubles is — the
    // estimator is identical, the result is bit-stable.
    "q29_stats_moments" -> ((s, d) => {
      val q = col("l_quantity").cast(DecimalType(18, 2))
      val p = col("l_extendedprice").cast(DecimalType(18, 2))
      t(s, d, "lineitem")
        .groupBy(col("l_returnflag"))
        .agg(
          count(lit(1)).as("n"),
          sum(q).as("sq"), sum(p).as("sp"),
          sum(q * q).as("sqq"), sum(p * p).as("spp"), sum(q * p).as("sqp"))
        .select(
          col("l_returnflag"), col("n"),
          ((col("sqq").cast("double") - col("sq").cast("double") *
            col("sq").cast("double") / col("n")) / (col("n") - 1)).as("var_qty"),
          sqrt((col("sqq").cast("double") - col("sq").cast("double") *
            col("sq").cast("double") / col("n")) / (col("n") - 1)).as("sd_qty"),
          ((col("sqp").cast("double") - col("sq").cast("double") *
            col("sp").cast("double") / col("n")) /
            sqrt((col("sqq").cast("double") - col("sq").cast("double") *
              col("sq").cast("double") / col("n")) *
              (col("spp").cast("double") - col("sp").cast("double") *
                col("sp").cast("double") / col("n")))).as("corr_qty_price"))
    }),

    // --- as-of join (point-in-time lookup) -------------------------------------
    // The canonical time-series operator Spark has no built-in for: each
    // event picks up the latest "calibration" (rare high readings, value >
    // 190) of the SAME user at cal_ts <= ts. Implemented the scale-safe way
    // — union both sides tagged, one window per user ordered by (ts, tag)
    // carrying the last non-null calibration forward — so it is ONE shuffle
    // keyed by user (massively parallel; no inequality join, no broadcast of
    // a time index, no per-row probe). Calibrations are deduped per (user,
    // ts) with max(value) so the pick is total-order deterministic; ties at
    // equal ts attach (tag sorts calibrations first), matching ASOF >=.
    // Oracle: DuckDB's native ASOF LEFT JOIN.
    "q48_asof_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val cal = ev.filter(col("value") > 190)
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("cval"))
        .select(col("user_id"), col("ts"), lit(0).as("tag"),
          lit(null).cast("double").as("value"),
          col("ts").as("cts"), col("cval"))
      val left = ev.select(col("user_id"), col("ts"), lit(1).as("tag"),
        col("value"),
        lit(null).cast("timestamp").as("cts"),
        lit(null).cast("double").as("cval"))
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts"), col("tag"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      cal.unionByName(left)
        .withColumn("cal_ts", last(col("cts"), ignoreNulls = true).over(w))
        .withColumn("cal_value", last(col("cval"), ignoreNulls = true).over(w))
        .filter(col("tag") === 1)
        .select(col("user_id"), col("ts"), col("value"),
          col("cal_ts"), col("cal_value"))
    }),

    // --- native as-of join (custom LogicalPlan + Strategy + SparkPlan) ----------
    // q48's semantics through graft's own physical operator
    // ([[graft.plans.AsOfJoinExec]]): both sides key-clustered and
    // (key, time)-sorted by EnsureRequirements, then ONE forward merge per
    // partition holding a single candidate row — the kdb-aj/DuckDB-ASOF
    // execution shape, no union materialization, no window buffer. Same
    // oracle as q48 (results are identical by construction); the
    // AsOfJoinSpec pins plan shape (native node, exactly 2 exchanges) and
    // row-for-row agreement with the composed q48.
    "q183_asof_native" -> ((s, d) => {
      val ev = t(s, d, "events").select(col("user_id"), col("ts"), col("value"))
      // repartition by user_id BEFORE the (user_id, ts) dedup agg: hash on
      // user_id alone satisfies both the agg's clustering AND the as-of's
      // ClusteredDistribution(key), so the right side costs ONE exchange
      // total instead of agg-by-(user,ts) + re-cluster-by-user.
      val cal = t(s, d, "events").filter(col("value") > 190)
        .repartition(col("user_id"))
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("value")).as("cal_value"))
        .select(col("user_id").as("cal_user"), col("ts").as("cal_ts"),
          col("cal_value"))
      graft.plans.AsOfJoinPlan
        .asofJoin(ev, cal, "user_id", "cal_user", "ts", "cal_ts")
        .select(col("user_id"), col("ts"), col("value"), col("cal_ts"),
          col("cal_value"))
    }),

    // --- tolerance-bounded as-of join -------------------------------------------
    // The sensor-fusion variant of q48: a backward as-of match is only
    // VALID within a staleness horizon (a calibration 3 weeks old is no
    // calibration at all — pandas merge_asof's `tolerance`, QuestDB/kdb's
    // windowed aj). Rides q48's union-sort-last merge unchanged — the
    // tolerance is a pure post-projection on the matched pair (exact
    // integer microsecond arithmetic), so the scale story is exactly
    // q48's: ONE user_id shuffle, no range join, no BNL. Stale matches
    // null out rather than drop: the row keeps its event data and the
    // `matched` bit makes the staleness decision auditable downstream.
    "q152_asof_tolerance" -> ((s, d) => {
      val within = unix_micros(col("ts")) - unix_micros(col("cal_ts")) <=
        AsofToleranceUs
      queries("q48_asof_join")(s, d)
        .select(col("user_id"), col("ts"), col("value"),
          when(col("cal_ts").isNotNull && within, col("cal_ts")).as("cal_ts"),
          when(col("cal_ts").isNotNull && within, col("cal_value"))
            .as("cal_value"),
          (col("cal_ts").isNotNull && within).as("matched"))
    }),

    // --- single-pass column profile (the data-quality suite shape) --------------
    // The Deequ/Great-Expectations read: per column of lineitem, exact
    // completeness (null count), exact distinct cardinality, and typed
    // min/max — emitted as one long-format frame so a validation harness
    // consumes ONE schema regardless of table width. Shape: a SINGLE
    // aggregation pass over the corpus computes every metric (count/min/
    // max collapse map-side; the 11 exact distinct aggregates ride
    // Spark's Expand — an 11-way row replication that is the honest cost
    // of EXACT cardinality; the 100 TB relaxation is swapping
    // countDistinct for approx_count_distinct/HLL (the q24/q109 tier)
    // with zero structural change), then the 1-row result explodes into
    // per-column rows driver-free. min/max of doubles are comparisons,
    // not arithmetic — they return an input value bit-for-bit, so the
    // oracle matches exactly with no cents/decimal detour; integer
    // extremes cast to double are exact below 2^53 (TPC-H keys at 100 TB
    // are ~2^40).
    "q153_data_profile" -> ((s, d) => {
      val li = t(s, d, "lineitem")
      val numCols = Seq("l_orderkey", "l_partkey", "l_suppkey",
        "l_linenumber", "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      val strCols = Seq("l_returnflag", "l_linestatus")
      val tsCols = Seq("l_shipdate")
      val all = numCols ++ strCols ++ tsCols
      val aggs: Seq[Column] =
        Seq(count(lit(1)).as("n_rows")) ++
          all.flatMap(c => Seq(count(col(c)).as(s"nn_$c"),
            countDistinct(col(c)).as(s"nd_$c"))) ++
          numCols.flatMap(c => Seq(min(col(c)).cast("double").as(s"mn_$c"),
            max(col(c)).cast("double").as(s"mx_$c"))) ++
          (strCols ++ tsCols).flatMap(c => Seq(min(col(c)).as(s"mn_$c"),
            max(col(c)).as(s"mx_$c")))
      val a = li.agg(aggs.head, aggs.tail: _*)
      val nullD = lit(null).cast("double")
      val nullS = lit(null).cast("string")
      val nullT = lit(null).cast("timestamp")
      def entry(c: String, mnN: Column, mxN: Column, mnS: Column,
                mxS: Column, mnT: Column, mxT: Column) =
        struct(lit(c).as("col_name"), col("n_rows"),
          (col("n_rows") - col(s"nn_$c")).as("n_nulls"),
          col(s"nd_$c").as("n_distinct"),
          mnN.as("min_num"), mxN.as("max_num"),
          mnS.as("min_str"), mxS.as("max_str"),
          mnT.as("min_ts"), mxT.as("max_ts"))
      val entries =
        numCols.map(c => entry(c, col(s"mn_$c"), col(s"mx_$c"),
          nullS, nullS, nullT, nullT)) ++
          strCols.map(c => entry(c, nullD, nullD,
            col(s"mn_$c"), col(s"mx_$c"), nullT, nullT)) ++
          tsCols.map(c => entry(c, nullD, nullD, nullS, nullS,
            col(s"mn_$c"), col(s"mx_$c")))
      a.select(explode(array(entries: _*)).as("p")).select(col("p.*"))
    }),

    // --- referential-integrity (FK orphan) audit --------------------------------
    // The constraint-validation read over the full FK graph: per edge,
    // child rows whose foreign key has no parent (SQL FK semantics — a
    // NULL FK is not a violation, matching ANSI MATCH SIMPLE). Shape:
    // each edge is one left join against the DISTINCT parent keyset +
    // one aggregation; truly-bounded dims (nation, region) broadcast,
    // fact-sized parents (orders, part, supplier, customer — all
    // SF-proportional) go through a key-only shuffle join where the
    // probe side carries a single long column, so the shuffle moves
    // 8 bytes/row regardless of table width. At 100 TB the orphan check
    // over lineitem->orders is exactly the shape AQE skew-splits; the
    // per-edge frames are independent so all seven audit legs run
    // concurrently. Keys cast to long so one output schema covers
    // int32 (nation/region) and int64 edges.
    "q154_fk_orphans" -> ((s, d) => {
      def edge(name: String, child: DataFrame, ck: String,
               parent: DataFrame, pk: String, bcast: Boolean) =
        fkOrphanEdge(name, child, ck, parent, pk, bcast)
      val li = t(s, d, "lineitem"); val or = t(s, d, "orders")
      val cu = t(s, d, "customer"); val su = t(s, d, "supplier")
      val pa = t(s, d, "part"); val na = t(s, d, "nation")
      val re = t(s, d, "region")
      Seq(
        edge("lineitem->orders", li, "l_orderkey", or, "o_orderkey", bcast = false),
        edge("lineitem->part", li, "l_partkey", pa, "p_partkey", bcast = false),
        edge("lineitem->supplier", li, "l_suppkey", su, "s_suppkey", bcast = false),
        edge("orders->customer", or, "o_custkey", cu, "c_custkey", bcast = false),
        edge("customer->nation", cu, "c_nationkey", na, "n_nationkey", bcast = true),
        edge("supplier->nation", su, "s_nationkey", na, "n_nationkey", bcast = true),
        edge("nation->region", na, "n_regionkey", re, "r_regionkey", bcast = true)
      ).reduce(_ unionByName _)
    }),

    // --- time-weighted average (the LOCF integral) -------------------------------
    // The sensor/finance read plain AVG gets wrong: a value that held for
    // 3 days must weigh 3 days, not 1 sample. Each observation holds
    // last-observation-carried-forward until the user's next event;
    // TWA = Σ value·duration / total span, per user over their own
    // horizon (no global clock — users never couple, so the op is
    // embarrassingly parallel per entity). Exactness: value is
    // 2-decimal → integer cents (DECIMAL(18,2) cast, exact), durations
    // are int64 microseconds, the weighted sum accumulates in
    // DECIMAL(38,0) (the q100/q127 128-bit discipline — cents×µs brushes
    // int64), and the only float ops are the final divides of exact
    // integers, bit-identical across engines. Shape: ONE user_id
    // shuffle serving both the lead() window and the aggregation;
    // single-event users have zero span and surface twa NULL rather
    // than a fake instantaneous average.
    "q159_time_weighted_avg" -> ((s, d) => {
      // µs ordering == ts ordering (unix_micros is monotone), so the
      // window can ride the already-projected integer column
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("us"), col("event_id"))
      val base = t(s, d, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          (col("value").cast(DecimalType(18, 2)) * 100)
            .cast(DecimalType(38, 0)).as("cents"))
        .withColumn("next_us", lead(col("us"), 1).over(w))
      base.groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_events"),
          (max(col("us")) - min(col("us"))).as("span_us"),
          sum(col("cents") * (col("next_us") - col("us"))).as("num"))
        .select(col("user_id"), col("n_events"), col("span_us"),
          when(col("span_us") > 0,
            col("num").cast("double") / col("span_us") / 100)
            .as("twa_value"))
    }),

    // --- skew-hedged (salted) join ----------------------------------------------
    // The execution strategy the q120 skew profiler's signal feeds: join
    // events (fact) to a per-user dimension with HOT keys salted — hot
    // fact rows scatter across `SaltBuckets` sub-partitions
    // (deterministic salt from the row id, so the plan is replayable)
    // while the dimension replicates ONLY its hot rows ×SaltBuckets
    // (cold rows pay nothing; replication volume = |hot dim| × S, not
    // |dim| × S). The join key becomes (user_id, salt) — no single
    // reducer ever owns a whole hot key. Hot set = users above 2× the
    // mean event count, computed from a #users-sized aggregate and
    // broadcast. Semantics are EXACTLY the plain join's — the oracle is
    // the unsalted SQL — and the output re-aggregates so the gate pins
    // the whole salted pipeline, not just the join. This is the manual
    // tier under AQE's runtime skew split (SkewJoinSpec): AQE only
    // splits sort-merge partitions post-shuffle; salting fixes the
    // shuffle itself and survives any join strategy.
    "q158_salted_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val dim = goldenRecord(
        ev.select(col("user_id"), col("ts"), col("event_id"),
          col("event_type"), col("value")))
        .select(col("user_id"), col("modal_event_type"))
      val counts = ev.groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
      val hot = counts.join(broadcast(
          counts.agg((sum(col("cnt")) * 2 / count(lit(1))).as("cut"))))
        .filter(col("cnt") > col("cut"))
        .select(col("user_id"), lit(true).as("is_hot"))
      val S = SaltBuckets
      val fact = ev.join(broadcast(hot), Seq("user_id"), "left")
        .withColumn("__salt",
          when(col("is_hot"), pmod(hash(col("event_id")), lit(S)))
            .otherwise(lit(0)))
      val dimSalted = dim.join(broadcast(hot), Seq("user_id"), "left")
        .withColumn("__salt", explode(
          when(col("is_hot"), sequence(lit(0), lit(S - 1)))
            .otherwise(array(lit(0)))))
      fact.join(dimSalted, Seq("user_id", "__salt"))
        .groupBy(col("event_type"), col("modal_event_type"))
        .agg(count(lit(1)).as("n_events"))
    }),

    // --- 2-D skyline (Pareto frontier) ------------------------------------------
    // The information-density frontier: documents where no other doc is both
    // SHORTER (n_chars ≤) and RICHER (distinct tokens ≥), strict somewhere —
    // the curation trade-off a single quality score flattens away. The naive
    // plan is an all-pairs NOT EXISTS (the oracle — fine for DuckDB at
    // sf0.01, a cartesian at 100 TB). The distributed shape: (1) collapse to
    // the per-x staircase `x -> max_y` (one hash agg, #distinct-x rows);
    // (2) the staircase's prefix-max — "best y at any strictly smaller x" —
    // via range buckets: WITHIN a bucket a window partitioned by bucket
    // (parallel, never global), ACROSS buckets a B²-row explode/re-agg
    // prefix pass (B=32, corpus-independent); (3) a point survives iff its
    // y strictly exceeds that prefix-max; (4) one equi join back tags the
    // surviving documents. No global sort, no cartesian, and the only
    // broadcasts are the 1-row max-x scalar and the B-row bucket spine.
    "q161_skyline" -> ((s, d) => {
      val pts = t(s, d, "documents")
        .select(col("doc_id"), col("n_chars"),
          size(array_distinct(split(col("text"), " "))).cast("long")
            .as("n_distinct_tok"))
      val perX = pts.groupBy(col("n_chars"))
        .agg(max(col("n_distinct_tok")).as("max_y"))
      val B = 32
      val maxX = perX.agg(max(col("n_chars")).as("mx"))
      val bucketed = perX.join(broadcast(maxX))
        .withColumn("bucket", (col("n_chars") * B / (col("mx") + 1)).cast("int"))
      // within-bucket: max_y over strictly smaller x, same bucket
      val wIn = Window.partitionBy(col("bucket"))
        .orderBy(col("n_chars").asc)
        .rowsBetween(Window.unboundedPreceding, -1)
      val withIn = bucketed.withColumn("sup_in", max(col("max_y")).over(wIn))
      // across buckets: every bucket's max_y flows to all strictly LATER
      // buckets (any x there is strictly larger); B² tiny rows, pure agg
      val bmax = bucketed.groupBy(col("bucket")).agg(max(col("max_y")).as("by"))
      val supAcross = bmax.filter(col("bucket") < B - 1)
        .select(explode(sequence(col("bucket") + 1, lit(B - 1))).as("bucket"),
          col("by"))
        .groupBy(col("bucket")).agg(max(col("by")).as("sup_across"))
      val frontier = withIn
        .join(broadcast(supAcross), Seq("bucket"), "left")
        // greatest() skips NULLs (returns the largest non-null); both NULL
        // means nothing can dominate this point — keep it
        .filter(col("max_y") > coalesce(
          greatest(col("sup_in"), col("sup_across")), lit(Long.MinValue)))
        .select(col("n_chars").as("fx"), col("max_y").as("fy"))
      pts.join(broadcast(frontier),
          col("n_chars") === col("fx") && col("n_distinct_tok") === col("fy"))
        .select(col("doc_id"), col("n_chars"), col("n_distinct_tok"))
    }),

    // --- exact event-type co-occurrence matrix ----------------------------------
    // How many users emit BOTH type a and type b — the exact twin of the
    // q109 HLL union matrix. Shape: one distinct (user, type) pass, then a
    // self-join ON THE SAME user_id key (the shuffle is reused, not
    // repeated) with type_a < type_b so each unordered pair counts once;
    // output is #types²/2 rows regardless of corpus size.
    "q163_type_cooccurrence" -> ((s, d) => {
      val ut = t(s, d, "events")
        .select(col("user_id"), col("event_type")).distinct()
      val a = ut.as("a"); val b = ut.as("b")
      a.join(b, col("a.user_id") === col("b.user_id") &&
          col("a.event_type") < col("b.event_type"))
        .groupBy(col("a.event_type").as("type_a"),
          col("b.event_type").as("type_b"))
        .agg(count(lit(1)).as("n_users"))
    }),

    // --- marketing attribution (first/last touch in a lookback) ------------------
    // For every purchase: the first and last NON-purchase event of the same
    // user inside a 7-day lookback, exclusive of the purchase instant — the
    // funnel question "what led here". The lookback is a RANGE frame over
    // integer µs (value-based, so it is robust to event gaps), PARTITIONED
    // by user — never a global window. first/last-in-frame are computed as
    // MIN/MAX of the conditional µs (deterministic under ties, unlike
    // positional first()/last()), and the touch's type is fetched by an
    // equi join on (user_id, us) with a min_by(event_id) tiebreak. Per-user
    // frames keep this embarrassingly parallel at any corpus size.
    "q167_attribution" -> ((s, d) => {
      val sevenDaysUs = 7L * 86400 * 1000000
      val ev = t(s, d, "events").select(col("event_id"), col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      val w7 = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-sevenDaysUs, -1)
      val touchUs = when(col("event_type") =!= "purchase", col("us"))
      val purchases = ev
        .withColumn("ft_us", min(touchUs).over(w7))
        .withColumn("lt_us", max(touchUs).over(w7))
        .filter(col("event_type") === "purchase")
        .select(col("user_id"), col("event_id").as("purchase_id"),
          col("us"), col("ft_us"), col("lt_us"))
      val touch = ev.filter(col("event_type") =!= "purchase")
        .groupBy(col("user_id"), col("us").as("t_us"))
        .agg(min_by(col("event_type"), col("event_id")).as("t_type"))
      purchases
        .join(touch.select(col("user_id"), col("t_us").as("ft_us"),
          col("t_type").as("ft_type")), Seq("user_id", "ft_us"), "left")
        .join(touch.select(col("user_id"), col("t_us").as("lt_us"),
          col("t_type").as("lt_type")), Seq("user_id", "lt_us"), "left")
        .select(col("user_id"), col("purchase_id"), col("us").as("purchase_us"),
          col("ft_us"), col("ft_type"), col("lt_us"), col("lt_type"))
    }),

    // --- exact within-source percentile rank (quantile normalization) ------------
    // Each doc's length mapped to its within-source PERCENT_RANK — the
    // cross-domain score normalizer (a "long doc" means different things in
    // different sources). Computed WITHOUT a row-level window: the
    // cumulative walk runs over the (source, n_chars) histogram (corpus-
    // independent frame, source-partitioned window), and one equi join
    // stamps every doc — q128's pattern pointed at normalization. Exact
    // rational: ties share (cum_below)/(n−1) by construction, identical to
    // SQL PERCENT_RANK.
    "q168_pct_rank" -> ((s, d) => {
      val docs = t(s, d, "documents").select(col("doc_id"), col("source"),
        col("n_chars"))
      val hist = docs.groupBy(col("source"), col("n_chars"))
        .agg(count(lit(1)).as("cnt"))
      val wCum = Window.partitionBy(col("source")).orderBy(col("n_chars"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy(col("source"))
      val ranked = hist
        .withColumn("cum", sum(col("cnt")).over(wCum))
        .withColumn("n", sum(col("cnt")).over(wAll))
        .select(col("source"), col("n_chars"),
          when(col("n") > 1, (col("cum") - col("cnt")).cast("double") /
            (col("n") - 1)).otherwise(lit(0.0)).as("pct_rank"))
      docs.join(broadcast(ranked), Seq("source", "n_chars"))
        .select(col("doc_id"), col("source"), col("n_chars"), col("pct_rank"))
    }),

    // --- robust outliers via median absolute deviation ---------------------------
    // The data-quality flag mean/stddev gets wrong under heavy tails: per
    // event type, med = exact lower median of integer cents, MAD = lower
    // median of |cents − med|, outliers = rows beyond 3·MAD. TWO histogram
    // rank walks (q91's machinery — value-distinct frames, never row
    // sorts) chained by a #types-row broadcast; the final count is one
    // more pass over the first histogram (cnt-weighted), so the corpus is
    // scanned once and everything downstream is histogram-sized.
    "q169_mad_outliers" -> ((s, d) => {
      val cents = (col("value").cast(DecimalType(18, 2)) * 100).cast("long")
      // FOUR consumers (median walk, deviation histogram, final agg, and
      // the walk-internal probe) read the (type × cents) histogram: pin it
      // ONCE here — the un-pinned form re-aggregated the events scan in
      // the devHist branch AND the final agg (2 extra corpus passes,
      // 12-exchange plan with zero reuse across them)
      val hist = t(s, d, "events")
        .groupBy(col("event_type"), cents.as("c"))
        .agg(count(lit(1)).as("cnt"))
        .pin(false)
      val med = histRankWalk(hist, "event_type", "c",
        Seq("med" -> "(n + 1) div 2"))
        .select(col("event_type"), col("n"), col("med"))
      val devHist = hist.join(broadcast(med), "event_type")
        .groupBy(col("event_type"), abs(col("c") - col("med")).as("dev"))
        .agg(sum(col("cnt")).as("cnt"))
      val mad = histRankWalk(devHist, "event_type", "dev",
        Seq("mad" -> "(n + 1) div 2"))
        .select(col("event_type"), col("mad"))
      hist.join(broadcast(med), "event_type").join(broadcast(mad), "event_type")
        .groupBy(col("event_type"))
        .agg(max(col("n")).as("n_events"), max(col("med")).as("med_cents"),
          max(col("mad")).as("mad_cents"),
          sum(when(abs(col("c") - col("med")) > lit(3) * col("mad"),
            col("cnt")).otherwise(lit(0L))).as("n_outliers"))
    }),

    // --- MERGE INTO (lakehouse upsert) -------------------------------------------
    // The CDC apply step as one full-outer join: a deterministic delta
    // (keys ≡3 mod 10 update the name, ≡7 delete, a disjoint +1M key range
    // inserts) merged into customer with per-row op tags. At scale this is
    // THE nightly table-maintenance op; the shape is a single key-shuffle
    // full outer join (both sides partitioned by the merge key — no
    // row-at-a-time upserts), and the op tag makes the row-level decision
    // auditable. Semantics match SQL MERGE: update wins over base, delete
    // drops, insert appends.
    "q170_merge_upsert" -> ((s, d) => {
      val base = t(s, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_acctbal"))
      val delta = base
        .filter(col("c_custkey") % 10 === 3 || col("c_custkey") % 10 === 7 ||
          col("c_custkey") % 10 === 5)
        .select(
          when(col("c_custkey") % 10 === 5, col("c_custkey") + 1000000L)
            .otherwise(col("c_custkey")).as("k"),
          when(col("c_custkey") % 10 === 7, lit("D")).otherwise(lit("U"))
            .as("dop"),
          upper(col("c_name")).as("d_name"),
          (col("c_acctbal").cast(DecimalType(18, 2)) +
            lit(BigDecimal("0.01"))).cast("double").as("d_acctbal"))
      base.join(delta, col("c_custkey") === col("k"), "full_outer")
        .filter(coalesce(col("dop"), lit("")) =!= "D")
        .select(
          coalesce(col("c_custkey"), col("k")).as("c_custkey"),
          coalesce(col("d_name"), col("c_name")).as("c_name"),
          coalesce(col("d_acctbal"), col("c_acctbal")).as("c_acctbal"),
          when(col("c_custkey").isNull, lit("insert"))
            .when(col("dop").isNull, lit("keep"))
            .otherwise(lit("update")).as("op"))
    }),

    // --- rolling trailing-window features (RANGE frame) --------------------------
    // Per event: trailing 7-day event count and exact cents sum for the
    // same user, INCLUDING the current row — the standard rolling feature
    // for fraud/engagement models. A value-based RANGE frame over integer
    // µs, partitioned by user: per-user state only, no global ordering
    // anywhere, linear at any scale.
    "q171_rolling_time_window" -> ((s, d) => {
      val sevenDaysUs = 7L * 86400 * 1000000
      val w7 = Window.partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-sevenDaysUs, 0)
      t(s, d, "events").select(col("event_id"), col("user_id"),
          unix_micros(col("ts")).as("us"),
          (col("value").cast(DecimalType(18, 2)) * 100).cast("long").as("cents"))
        .withColumn("n_7d", count(lit(1)).over(w7))
        .withColumn("cents_7d", sum(col("cents")).over(w7))
        .select(col("event_id"), col("user_id"), col("us"), col("n_7d"),
          col("cents_7d"))
    }),

    // --- range (interval-containment) join --------------------------------------
    // Assign every event to the session interval that contains it. The
    // range predicate rides on an EQUI-join key (user_id) — the scale-safe
    // shape for interval joins whenever intervals are per-entity: one hash
    // shuffle by user, the containment check is a post-join filter, never a
    // cartesian/BNL. (For entity-free global intervals, bucket time into
    // grid cells and equi-join on the cell instead.) Sessions come from the
    // same session_window as q25, so the oracle reuses its gaps-and-islands
    // CTE with the join layered on top.
    "q49_range_join" -> ((s, d) => {
      val ev = t(s, d, "events")
      val sess = ev
        .groupBy(session_window(col("ts"), SessionGap).as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("session_start"),
          col("sw.end").as("session_end"))
      ev.select(col("user_id"), col("ts"), col("value"))
        .join(sess, Seq("user_id"))
        .filter(col("ts") >= col("session_start") && col("ts") < col("session_end"))
        .select(col("user_id"), col("ts"), col("value"), col("session_start"))
    }),

    // --- interval×interval overlap join (grid-bucketed) --------------------------
    // Which user sessions overlap which "incident" days? The two interval
    // sets share NO entity key (sessions are per-user, incidents are
    // global), so the scale-safe shape is GRID BUCKETING: each session
    // explodes into the day cells it spans (bounded — a session is a
    // 12h-gap island, and the explode happens in the scan stage), and
    // since incidents are day-aligned, interval overlap collapses to CELL
    // EQUALITY — one equi shuffle on the day cell, never a BNL/cartesian.
    // The oracle states the true overlap predicate (s_start < d+1d AND
    // s_end > d) directly; the grid join must reproduce it exactly.
    // Incident threshold is scale-free and integer-exact: a day is an
    // incident iff its distinct-user count strictly exceeds the daily
    // mean (u·n_days > Σu — no float division anywhere).
    "q172_interval_overlap" -> ((s, d) => {
      val ev = t(s, d, "events")
      val sess = ev
        .groupBy(session_window(col("ts"), SessionGap).as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"), col("sw.start").as("s_start"),
          col("sw.end").as("s_end"))
      val daily = ev
        .groupBy(date_trunc("DAY", col("ts")).as("inc_day"))
        .agg(count_distinct(col("user_id")).as("n_users"))
      val tot = daily.agg(sum(col("n_users")).as("total_u"),
        count(lit(1)).as("n_days"))
      val incidents = daily.join(broadcast(tot))
        .filter(col("n_users") * col("n_days") > col("total_u"))
        .select(col("inc_day"), col("n_users"))
      // Day cells the half-open session [s_start, s_end) touches: trunc of
      // s_start through trunc of the last INCLUDED instant (end − 1µs).
      val cells = sess.select(col("user_id"), col("s_start"), col("s_end"),
        explode(sequence(date_trunc("DAY", col("s_start")),
          date_trunc("DAY", col("s_end") - expr("INTERVAL 1 MICROSECOND")),
          expr("INTERVAL 1 DAY"))).as("cell"))
      cells.join(broadcast(incidents), col("cell") === col("inc_day"))
        .select(col("user_id"), unix_micros(col("s_start")).as("s_start_us"),
          unix_micros(col("s_end")).as("s_end_us"),
          unix_micros(col("inc_day")).as("inc_day_us"), col("n_users"))
    }),

    // --- k-anonymity / l-diversity audit ------------------------------------------
    // Privacy-risk profile of the customer table under the quasi-identifier
    // (nation, market segment, 1000-unit balance band): k = customers per
    // QI cell, l = distinct sensitive values (order priority) observed for
    // that cell, risky = k below the re-identification floor. The balance
    // band uses FLOOR division via pmod (truncating `div` would merge the
    // (−1000,0) and [0,1000) bands). Shape: k comes from the customer scan
    // ALONE (no join — custkey is unique), l from one orders⨝customer
    // shuffle pre-aggregated to distinct (QI, priority) pairs before the
    // final QI-sized count — never a distinct-expand over the fact table.
    "q173_k_anonymity" -> ((s, d) => {
      val cents = (col("c_acctbal").cast(DecimalType(18, 2)) * 100)
        .cast("long")
      val cb = t(s, d, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
          ((cents - pmod(cents, lit(100000L))) / 100000L).cast("long")
            .as("band"))
      val qi = Seq(col("c_nationkey"), col("c_mktsegment"), col("band"))
      val k = cb.groupBy(qi: _*).agg(count(lit(1)).as("k"))
      val l = cb
        .join(t(s, d, "orders").select(col("o_custkey"), col("o_orderpriority")),
          col("c_custkey") === col("o_custkey"))
        .select(col("c_nationkey"), col("c_mktsegment"), col("band"),
          col("o_orderpriority")).distinct()
        .groupBy(qi: _*).agg(count(lit(1)).as("l_div"))
      k.join(l, Seq("c_nationkey", "c_mktsegment", "band"), "left")
        .select(col("c_nationkey"), col("c_mktsegment"), col("band"),
          col("k"), coalesce(col("l_div"), lit(0L)).as("l_div"),
          (col("k") < 5).as("risky"))
    }),

    // --- two-proportion A/B z-test ------------------------------------------------
    // The experiment read-out: arm = event_id parity (the synthetic
    // randomization unit), success = purchase. Pooled two-proportion
    // z² = D²·n / (n1·n2·x·(n−x)) with D = x1·n2 − x2·n1, x = x1+x2,
    // n = n1+n2 — every product in DECIMAL(38,0) ≙ HUGEINT, so the ONLY
    // float op is the final single division (order-stable, bit-identical
    // across engines). Significance at α=0.05 never touches floats at all:
    // 10000·D²·n > 38416·n1·n2·x·(n−x) is a pure integer inequality.
    // Shape: one narrow scan → one 4-counter agg → scalar algebra; the
    // 100 TB plan is a map-side-combined count, nothing else.
    "q174_ab_ztest" -> ((s, d) => {
      val D = DecimalType(38, 0)
      val e = t(s, d, "events").select(
        (col("event_id") % 2 === 0).as("arm_a"),
        (col("event_type") === "purchase").as("success"))
      e.agg(
          sum(when(col("arm_a"), 1L).otherwise(0L)).as("n1"),
          sum(when(col("arm_a") && col("success"), 1L).otherwise(0L)).as("x1"),
          sum(when(!col("arm_a"), 1L).otherwise(0L)).as("n2"),
          sum(when(!col("arm_a") && col("success"), 1L).otherwise(0L)).as("x2"))
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          (col("x1").cast(D) * col("n2").cast(D) -
            col("x2").cast(D) * col("n1").cast(D)).as("dd"),
          (col("n1") + col("n2")).cast(D).as("n"),
          (col("x1") + col("x2")).cast(D).as("x"))
        .select(col("n1"), col("x1"), col("n2"), col("x2"),
          when(col("x") > 0 && col("x") < col("n"),
            (col("dd") * col("dd") * col("n")).cast("double") /
              (col("n1").cast(D) * col("n2").cast(D) * col("x") *
                (col("n") - col("x"))).cast("double")).as("z2"),
          when(col("x") > 0 && col("x") < col("n"),
            lit(10000).cast(D) * col("dd") * col("dd") * col("n") >
              lit(38416).cast(D) * col("n1").cast(D) * col("n2").cast(D) *
                col("x") * (col("n") - col("x")))
            .otherwise(lit(false)).as("significant"))
    }),

    // --- PIVOT (wide activity matrix) -----------------------------------------------
    // The reshaping read every BI/feature layer needs: one row per day,
    // one count column per event type. The value list is EXPLICIT
    // (Spark's pivot without values triggers a distinct-scan planning
    // pass AND makes the output schema data-dependent — at 100 TB the
    // schema must be static). Plan: single hash agg keyed by day with 5
    // conditional counts — pivot on an explicit list compiles to exactly
    // the manual CASE WHEN shape, one shuffle, no extra pass.
    "q179_pivot_matrix" -> ((s, d) => {
      val types = Seq("click", "error", "purchase", "signup", "view")
      t(s, d, "events")
        .select(date_trunc("DAY", col("ts")).as("day"), col("event_type"))
        .groupBy(col("day"))
        .pivot("event_type", types)
        .agg(count(lit(1)))
        .select(col("day") +: types.map(ty =>
          coalesce(col(ty), lit(0L)).as(s"n_$ty")): _*)
    }),

    // --- UNPIVOT / melt (wide -> long) ----------------------------------------------
    // The inverse reshaping (Dataset.unpivot, SQL UNPIVOT/stack): lineitem's
    // four numeric measures melt into (measure, value) rows, then one agg
    // recovers per-measure profiles. Values go through DECIMAL(18,2) cents
    // so sums are exact integers (the q02 discipline); the unpivot itself
    // is a zero-shuffle projection (each input row emits 4 — done in the
    // scan stage), one hash agg on a 4-value key follows.
    "q180_unpivot_profile" -> ((s, d) => {
      val cents = (c: String) =>
        (col(c).cast(DecimalType(18, 2)) * 100).cast("long").as(s"m_$c")
      t(s, d, "lineitem")
        .select(cents("l_quantity"), cents("l_extendedprice"),
          cents("l_discount"), cents("l_tax"))
        .unpivot(Array.empty, Array(col("m_l_quantity"),
          col("m_l_extendedprice"), col("m_l_discount"), col("m_l_tax")),
          "measure", "cents")
        .groupBy(col("measure"))
        .agg(count(lit(1)).as("n"), sum(col("cents")).as("sum_cents"),
          min(col("cents")).as("min_cents"), max(col("cents")).as("max_cents"))
    }),

    // --- peak concurrency (interval sweep without a global sort) --------------------
    // Max simultaneous user sessions per day — the capacity-planning read
    // over the q25 session intervals. The classic sweep (order ALL deltas,
    // running sum) is a partition-less window = one task at any scale; this
    // plan day-partitions it: (1) deltas (+1 start / −1 end) bucket into
    // their own day, prefix-summed per day ordered by (ts, delta) — the
    // −1-before-+1 tie order IS the half-open [start, end) semantics;
    // (2) sessions spanning a day boundary become a carry-in count via the
    // q172 grid explode (cells after the first = open at that day's
    // start); (3) peak(day) = carry_in + max(0, max prefix). Everything
    // shuffles by day; no global sort anywhere.
    "q181_peak_concurrency" -> ((s, d) => {
      val sess = t(s, d, "events")
        .groupBy(session_window(col("ts"), SessionGap).as("sw"), col("user_id"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("sw.start").as("s_start"), col("sw.end").as("s_end"))
      // End deltas bucket by the session's LAST INCLUDED instant
      // (trunc(end − 1µs)) — the same rule the carry cells use. A session
      // ending exactly at midnight is open through the prior day only; its
      // −1 must land there, not depress the next day's prefix from row one.
      val deltas = sess
        .select(date_trunc("DAY", col("s_start")).as("day"),
          col("s_start").as("ts"), lit(1).as("delta"))
        .unionAll(sess.select(
          date_trunc("DAY", col("s_end") - expr("INTERVAL 1 MICROSECOND"))
            .as("day"),
          col("s_end").as("ts"), lit(-1).as("delta")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("day")).orderBy(col("ts"), col("delta"))
      val prefix = deltas
        .withColumn("run", sum(col("delta")).over(w.rowsBetween(
          org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .groupBy(col("day")).agg(max(col("run")).as("max_prefix"))
      val carry = sess
        .select(explode(sequence(date_trunc("DAY", col("s_start")),
          date_trunc("DAY", col("s_end") - expr("INTERVAL 1 MICROSECOND")),
          expr("INTERVAL 1 DAY"))).as("day"), col("s_start"))
        .filter(col("day") > col("s_start"))
        .groupBy(col("day")).agg(count(lit(1)).as("carry_in"))
      // FULL outer: an interior day of a >2-day session has carry but no
      // deltas — it still has that many concurrent sessions all day.
      prefix.join(carry, Seq("day"), "full")
        .select(col("day"),
          coalesce(col("carry_in"), lit(0L)).as("carry_in"),
          (coalesce(col("carry_in"), lit(0L)) +
            greatest(lit(0L), coalesce(col("max_prefix"), lit(0L))))
            .as("peak_sessions"))
    }),

    // --- Cohen's kappa (inter-rater agreement) --------------------------------------
    // The annotation-QA statistic: agreement between two deterministic
    // binary raters of document quality (length >= 500 chars; >= 80
    // tokens), corrected for chance. kappa = (N·agree − Σ_k a_k·b_k) /
    // (N² − Σ_k a_k·b_k) — the standard (po−pe)/(1−pe) multiplied
    // through by N², so EVERY term is an exact int64 product over one
    // 4-cell contingency agg; the single final division is the only
    // float op. Products run in DECIMAL(38,0) ≙ HUGEINT (the q174
    // discipline — n² overflows int64 past ~3e9 docs, a real corpus
    // size). Shape: one narrow scan, one map-side-combined 4-counter
    // agg, scalar algebra — corpus-size-independent past the scan.
    "q182_cohens_kappa" -> ((s, d) => {
      val D = DecimalType(38, 0)
      val ra = (col("n_chars") >= 500).as("ra")
      val rb = (size(TextFns.toks(col("text"))) >= 80).as("rb")
      t(s, d, "documents").select(ra, rb)
        .agg(count(lit(1)).as("n"),
          sum(when(col("ra") && col("rb"), 1L).otherwise(0L)).as("n11"),
          sum(when(col("ra") && !col("rb"), 1L).otherwise(0L)).as("n10"),
          sum(when(!col("ra") && col("rb"), 1L).otherwise(0L)).as("n01"))
        .select(col("n"), col("n11"), col("n10"), col("n01"),
          (col("n") - col("n11") - col("n10") - col("n01")).as("n00"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          ((col("n11") + col("n10")).cast(D) * (col("n11") + col("n01")).cast(D) +
            (col("n01") + col("n00")).cast(D) * (col("n10") + col("n00")).cast(D))
            .as("pe_n2"),
          ((col("n11") + col("n00")).cast(D) * col("n").cast(D)).as("po_n2"))
        .select(col("n"), col("n11"), col("n10"), col("n01"), col("n00"),
          when(col("n").cast(D) * col("n").cast(D) === col("pe_n2"),
            lit(null).cast("double"))
            .otherwise((col("po_n2") - col("pe_n2")).cast("double") /
              (col("n").cast(D) * col("n").cast(D) - col("pe_n2")).cast("double"))
            .as("kappa"))
    }),

    // --- grouping sets via SQL ------------------------------------------------------------------
    "q24_grouping_sets" -> ((s, d) => {
      // register only what the SQL touches (registerAll would re-read all
      // ten table schemas on every invocation)
      Tables.load(s, d, "lineitem").createOrReplaceTempView("lineitem")
      s.sql("""
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
               COUNT(1) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
      """)
    })
  )

  private val oraclesBase: Map[String, String] = Map(
    "q01_filter_project" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
         FROM lineitem
         WHERE l_shipdate < TIMESTAMP '1995-06-01' AND l_quantity > 25 AND l_discount <= 0.05""",

    "q02_agg_groupby" ->
      s"""SELECT l_returnflag, l_linestatus,
            ${oSum("l_quantity")} AS sum_qty,
            ${oSum("l_extendedprice")} AS sum_base_price,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
            ${oAvg("l_quantity")} AS avg_qty,
            ${oAvg("l_discount")} AS avg_disc,
            COUNT(1) AS count_order
          FROM lineitem
          WHERE l_shipdate <= TIMESTAMP '1998-09-02'
          GROUP BY l_returnflag, l_linestatus""",

    "q03_join_broadcast" ->
      s"""SELECT p_brand, COUNT(1) AS n_items, ${oSum("l_quantity")} AS sum_qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY p_brand""",

    "q04_join_shuffle" ->
      s"""SELECT c_mktsegment, COUNT(1) AS n_orders, ${oSum("o_totalprice")} AS sum_price
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY c_mktsegment""",

    "q05_multi_join" ->
      """SELECT r_name, n_name,
            CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS revenue,
            COUNT(1) AS n_items
         FROM lineitem
         JOIN orders   ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation   ON c_nationkey = n_nationkey
         JOIN region   ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name""",

    "q06_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
         WHERE EXISTS (SELECT 1 FROM orders
                       WHERE o_custkey = c_custkey AND o_totalprice > 450000)""",

    "q07_anti_join" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer
         WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                           AND o_orderdate >= TIMESTAMP '1998-01-01')""",

    "q08_outer_join_agg" ->
      """SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders
         FROM customer LEFT JOIN orders ON c_custkey = o_custkey
         GROUP BY c_custkey, c_name""",

    "q09_distinct_agg" ->
      """SELECT l_returnflag,
            COUNT(DISTINCT l_partkey) AS n_parts,
            COUNT(DISTINCT l_suppkey) AS n_supps,
            COUNT(1) AS n_rows
         FROM lineitem GROUP BY l_returnflag""",

    "q10_rollup" ->
      s"""SELECT l_returnflag, l_linestatus,
            ${oSum("l_quantity")} AS sum_qty, COUNT(1) AS n_rows
          FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""",

    "q11_cube" ->
      s"""SELECT o_orderstatus, o_orderpriority,
            COUNT(1) AS n_orders, ${oSum("o_totalprice")} AS sum_price
          FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""",

    "q12_window_rank" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
           SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn <= 3""",

    // q27 computes the identical result to q12 with a different physical
    // strategy (bounded partial top-k aggregation), so it shares the oracle.
    "q27_topk_agg" ->
      """SELECT l_returnflag, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
           SELECT l_returnflag, l_orderkey, l_linenumber, l_extendedprice,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag
                    ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS rn
           FROM lineitem) WHERE rn <= 3""",

    "q13_window_analytic" ->
      """SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
            LAG(o_totalprice, 1) OVER w AS prev_price,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""",

    "q86_window_frames" ->
      """SELECT o_custkey, o_orderkey, o_totalprice,
            CAST(ntile(4) OVER w AS INT) AS tile,
            cume_dist() OVER w AS cd,
            percent_rank() OVER w AS pr,
            CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) OVER (
              PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS mov3_spend,
            first_value(o_orderkey) OVER (
              PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS best_order,
            last_value(o_orderkey) OVER (
              PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS worst_order
         FROM orders
         WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)""",

    "q14_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",

    "q15_set_ops" ->
      """SELECT DISTINCT c_nationkey FROM (
           (SELECT c_nationkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
            INTERSECT
            SELECT c_nationkey FROM customer WHERE c_mktsegment = 'BUILDING')
           EXCEPT
           SELECT c_nationkey FROM customer WHERE c_mktsegment = 'MACHINERY'
         )
         UNION
         SELECT DISTINCT c_nationkey FROM customer WHERE c_acctbal < -900""",

    "q16_string_funcs" ->
      """SELECT p_partkey,
            UPPER(p_name) AS uname,
            LOWER(p_brand) AS lbrand,
            SUBSTRING(p_type, 1, 5) AS type5,
            LENGTH(p_name) AS name_len,
            CONCAT_WS('|', p_brand, p_type) AS brand_type,
            REGEXP_REPLACE(p_name, 'a', '@', 'g') AS name_at,
            TRIM(p_name) AS name_trim
         FROM part""",

    "q17_date_funcs" ->
      """SELECT YEAR(o_orderdate) AS yr, MONTH(o_orderdate) AS mo,
            DATE_TRUNC('month', o_orderdate) AS month_start,
            STRFTIME(o_orderdate, '%Y-%m') AS ym,
            COUNT(1) AS n_orders, MAX(DAYOFMONTH(o_orderdate)) AS max_dom
         FROM orders GROUP BY 1, 2, 3, 4""",

    "q18_math_case" ->
      """SELECT l_orderkey, l_linenumber,
            ABS(l_discount - 0.05) AS disc_dist,
            l_extendedprice / 100.0 AS price_h,
            CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)), 1) AS DOUBLE) AS price_r,
            CAST(FLOOR(l_quantity) AS BIGINT) AS qty_floor,
            CAST(CEIL(l_quantity / 7.0) AS BIGINT) AS qty_c7,
            CASE WHEN l_quantity < 10 THEN 'low'
                 WHEN l_quantity < 30 THEN 'mid'
                 ELSE 'high' END AS qty_band,
            CAST(CAST(l_extendedprice * l_tax AS DECIMAL(18,4)) AS DOUBLE) AS tax_amt
         FROM lineitem""",

    "q19_having" ->
      s"""SELECT o_custkey, COUNT(1) AS n_orders, ${oSum("o_totalprice")} AS spend
          FROM orders GROUP BY o_custkey HAVING COUNT(1) >= 3""",

    "q20_scalar_subquery" ->
      s"""SELECT p_partkey, p_name, p_retailprice FROM part
          WHERE p_retailprice > (SELECT ${oAvg("p_retailprice")} FROM part) * 1.02""",

    "q21_events_window_min" ->
      """SELECT DATE_TRUNC('hour', ts) AS win_start, user_id,
            MIN(value) AS min_value, MAX(value) AS max_value, COUNT(1) AS n_events
         FROM events GROUP BY 1, 2""",

    "q22_events_window_avg" ->
      s"""SELECT DATE_TRUNC('day', ts) AS win_start, event_type,
            ${oAvg("value")} AS avg_value, COUNT(1) AS n_events
          FROM events GROUP BY 1, 2""",

    "q23_events_json" ->
      """SELECT event_type,
            CAST(SUM(CAST(k AS DECIMAL(18,2))) AS DOUBLE) / COUNT(k) AS avg_k,
            MAX(k) AS max_k, MIN(k) AS min_k, COUNT(1) AS n
         FROM (SELECT event_type, CAST(json_extract_string(props, '$.k') AS INT) AS k
               FROM events)
         GROUP BY event_type""",

    "q68_funnel" ->
      """WITH signup AS (
           SELECT user_id, MIN(ts) AS t_signup FROM events
           WHERE event_type = 'signup' GROUP BY user_id),
         v AS (
           SELECT e.user_id, MIN(e.ts) AS t_view
           FROM events e JOIN signup s ON e.user_id = s.user_id
           WHERE e.event_type = 'view' AND e.ts > s.t_signup
           GROUP BY e.user_id),
         p AS (
           SELECT e.user_id, MIN(e.ts) AS t_purchase
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'purchase' AND e.ts > v.t_view
           GROUP BY e.user_id)
         SELECT s.user_id, s.t_signup, v.t_view, p.t_purchase,
           CAST(1 + (CASE WHEN v.t_view IS NOT NULL THEN 1 ELSE 0 END)
                  + (CASE WHEN p.t_purchase IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS stage
         FROM signup s
         LEFT JOIN v ON s.user_id = v.user_id
         LEFT JOIN p ON s.user_id = p.user_id""",

    "q69_value_histogram" ->
      """SELECT CAST(FLOOR(value / 25.0) AS BIGINT) AS bin, COUNT(1) AS n,
           MIN(value) AS min_v, MAX(value) AS max_v
         FROM events GROUP BY 1""",

    "q79_retention_cohorts" ->
      """WITH ev AS (
           SELECT DISTINCT user_id, DATE_TRUNC('week', ts) AS w FROM events),
         cohort AS (
           SELECT user_id, MIN(w) AS cohort_week FROM ev GROUP BY user_id)
         SELECT c.cohort_week,
           CAST(datediff('day', CAST(c.cohort_week AS DATE), CAST(ev.w AS DATE))
                / 7 AS BIGINT) AS week_offset,
           COUNT(DISTINCT ev.user_id) AS n_users
         FROM ev JOIN cohort c ON ev.user_id = c.user_id
         GROUP BY 1, 2""",

    "q28_pivot" ->
      """SELECT o_orderpriority,
           CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS f_total,
           CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS o_total,
           CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE) AS p_total
         FROM orders GROUP BY o_orderpriority""",

    "q114_unpivot" ->
      """WITH w AS (
           SELECT o_orderpriority,
             COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS f_total,
             COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'O' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS o_total,
             COALESCE(CAST(SUM(CASE WHEN o_orderstatus = 'P' THEN CAST(o_totalprice AS DECIMAL(18,2)) END) AS DOUBLE), 0.0) AS p_total
           FROM orders GROUP BY o_orderpriority)
         SELECT o_orderpriority, metric, total
         FROM (UNPIVOT w ON f_total, o_total, p_total
               INTO NAME metric VALUE total)""",

    "q130_golden_record" ->
      """WITH base AS (
           SELECT user_id, ts, event_id, event_type, value FROM events),
         lastr AS (
           SELECT user_id, ts AS last_ts, event_type AS last_event_type,
                  lv AS last_value
           FROM (
             SELECT *,
               ROW_NUMBER() OVER w AS rn,
               FIRST_VALUE(value IGNORE NULLS) OVER (
                 PARTITION BY user_id ORDER BY ts DESC, event_id DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
                 AS lv
             FROM base
             WINDOW w AS (PARTITION BY user_id ORDER BY ts DESC, event_id DESC))
           WHERE rn = 1),
         agg AS (
           SELECT user_id, COUNT(1) AS n_events, MIN(ts) AS first_ts
           FROM base GROUP BY 1),
         modal AS (
           SELECT user_id, event_type AS modal_event_type FROM (
             SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY COUNT(1) DESC, event_type) AS rn
             FROM base GROUP BY user_id, event_type)
           WHERE rn = 1)
         SELECT a.user_id, a.n_events, a.first_ts, l.last_ts,
           l.last_event_type, l.last_value, m.modal_event_type
         FROM agg a
         JOIN lastr l ON a.user_id = l.user_id
         JOIN modal m ON a.user_id = m.user_id""",

    "q128_eqfreq_bins" -> {
      val cutDefs = (1 to 9).map(k =>
        s"MIN(CASE WHEN cum >= ($k * n + 9) // 10 THEN c END) AS cut$k")
        .mkString(",\n             ")
      val binSum = (1 to 9).map(k => s"CAST(c > cut$k AS BIGINT)")
        .mkString(" + ")
      s"""WITH li AS (
            SELECT l_returnflag,
              CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            FROM lineitem),
          h AS (
            SELECT l_returnflag, c, COUNT(1) AS cnt FROM li GROUP BY 1, 2),
          cum AS (
            SELECT l_returnflag, c,
              SUM(cnt) OVER (PARTITION BY l_returnflag ORDER BY c
                             ROWS UNBOUNDED PRECEDING) AS cum,
              SUM(cnt) OVER (PARTITION BY l_returnflag) AS n
            FROM h),
          cuts AS (
            SELECT l_returnflag,
             $cutDefs
            FROM cum GROUP BY 1),
          b AS (
            SELECT li.l_returnflag, c, 1 + $binSum AS bin
            FROM li JOIN cuts ON li.l_returnflag = cuts.l_returnflag)
          SELECT l_returnflag, bin, COUNT(1) AS n,
            MIN(c) AS c_min, MAX(c) AS c_max
          FROM b GROUP BY 1, 2"""
    },

    "q127_group_trend" ->
      """WITH t0 AS (SELECT MIN(epoch_us(ts)) AS us0 FROM events),
         b AS (
           SELECT event_type,
             CAST((epoch_us(ts) - us0) // 1000000 AS HUGEINT) AS x,
             CAST(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)
                  AS HUGEINT) AS y
           FROM events CROSS JOIN t0),
         m AS (
           SELECT event_type, CAST(COUNT(1) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy
           FROM b GROUP BY event_type)
         SELECT event_type, CAST(n AS BIGINT) AS n_rows,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_s,
           CAST(sy * sxx - sx * sxy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS intercept_cents
         FROM m""",

    // Lag-feature twin: identical lags, identical ((v + l1) + l2)
    // association, exact integer gap — see the Spark-side comment on why
    // the trailing mean avoids window FRAMES entirely.
    "q126_lag_features" ->
      """WITH m AS (
           SELECT event_id, user_id, value,
             LAG(value, 1) OVER w AS prev_value,
             LAG(value, 2) OVER w AS l2,
             epoch_us(ts) - epoch_us(LAG(ts, 1) OVER w) AS gap_us
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         SELECT event_id, user_id, prev_value, gap_us,
           1 + CAST(prev_value IS NOT NULL AS BIGINT)
             + CAST(l2 IS NOT NULL AS BIGINT) AS trail3_n,
           ((value + COALESCE(prev_value, 0.0)) + COALESCE(l2, 0.0))
             / CAST(1 + CAST(prev_value IS NOT NULL AS BIGINT)
                      + CAST(l2 IS NOT NULL AS BIGINT) AS DOUBLE)
             AS trail3_mean
         FROM m""",

    "q125_zorder_layout" ->
      """WITH bounds AS (
           SELECT MIN(l_orderkey) AS amin, MAX(l_orderkey) AS amax,
                  MIN(l_partkey) AS bmin, MAX(l_partkey) AS bmax
           FROM lineitem),
         b AS (
           SELECT
             CAST(least(1023, ((CAST(l_orderkey AS HUGEINT) - amin) * 1024)
                              // (amax - amin + 1)) AS BIGINT) AS xa,
             CAST(least(1023, ((CAST(l_partkey AS HUGEINT) - bmin) * 1024)
                              // (bmax - bmin + 1)) AS BIGINT) AS xb
           FROM lineitem CROSS JOIN bounds),
         zc AS (
           SELECT xa, xb,
             CAST(list_sum(list_transform(range(0, 10), k ->
               (((xa >> k) & 1) << (2 * k))
               + (((xb >> k) & 1) << (2 * k + 1)))) AS BIGINT) AS z
           FROM b)
         SELECT z >> 10 AS zbucket, COUNT(1) AS n,
           MIN(xa) AS xa_min, MAX(xa) AS xa_max,
           MIN(xb) AS xb_min, MAX(xb) AS xb_max
         FROM zc GROUP BY 1""",

    // Hilbert twin: the same 10 unrolled rotate/flip levels generated as a
    // CTE chain — both engines walk bit-identical integer arithmetic.
    "q189_hilbert_layout" -> {
      def lvl(i: Int, k: Int): String = {
        val prev = if (i == 0) "h_in" else s"h${i - 1}"
        val ss = (1L << k) * (1L << k)
        s"""h$i AS (
              SELECT xa, xb,
                CASE WHEN ry = 0 THEN
                       CASE WHEN rx = 1 THEN 1023 - hy ELSE hy END
                     ELSE hx END AS hx,
                CASE WHEN ry = 0 THEN
                       CASE WHEN rx = 1 THEN 1023 - hx ELSE hx END
                     ELSE hy END AS hy,
                hd + $ss * xor(rx * 3, ry) AS hd
              FROM (SELECT *, (hx >> $k) & 1 AS rx, (hy >> $k) & 1 AS ry
                    FROM $prev))"""
      }
      val levels = (9 to 0 by -1).zipWithIndex
        .map { case (k, i) => lvl(i, k) }.mkString(",\n")
      s"""WITH bounds AS (
            SELECT MIN(l_orderkey) AS amin, MAX(l_orderkey) AS amax,
                   MIN(l_partkey) AS bmin, MAX(l_partkey) AS bmax
            FROM lineitem),
          b AS (
            SELECT
              CAST(least(1023, ((CAST(l_orderkey AS HUGEINT) - amin) * 1024)
                               // (amax - amin + 1)) AS BIGINT) AS xa,
              CAST(least(1023, ((CAST(l_partkey AS HUGEINT) - bmin) * 1024)
                               // (bmax - bmin + 1)) AS BIGINT) AS xb
            FROM lineitem CROSS JOIN bounds),
          h_in AS (
            SELECT xa, xb, xa AS hx, xb AS hy, CAST(0 AS BIGINT) AS hd
            FROM b),
          $levels
          SELECT hd >> 10 AS hbucket, COUNT(1) AS n,
            MIN(xa) AS xa_min, MAX(xa) AS xa_max,
            MIN(xb) AS xb_min, MAX(xb) AS xb_max
          FROM h9 GROUP BY 1"""
    },

    "q122_scd2_compact" ->
      """WITH m AS (
           SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
           FROM events),
         r AS (
           SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS run_id
           FROM m),
         iv AS (
           SELECT user_id, MIN(event_type) AS event_type,
                  MIN(ts) AS valid_from, COUNT(1) AS n_events
           FROM r GROUP BY user_id, run_id)
         SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
             AS valid_to,
           n_events
         FROM iv""",

    "q134_pit_snapshot" ->
      """WITH m AS (
           SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
           FROM events),
         r AS (
           SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS run_id
           FROM m),
         iv AS (
           SELECT user_id, MIN(event_type) AS event_type,
                  MIN(ts) AS valid_from, COUNT(1) AS n_events
           FROM r GROUP BY user_id, run_id),
         iv2 AS (
           SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to,
             n_events
           FROM iv),
         b AS (SELECT date_trunc('day', MAX(ts)) AS m1 FROM events),
         x AS (
           SELECT user_id, event_type, n_events,
             CASE WHEN valid_from = date_trunc('day', valid_from)
                  THEN valid_from
                  ELSE date_trunc('day', valid_from) + INTERVAL 1 DAY
             END AS lo,
             CASE WHEN valid_to IS NULL THEN (SELECT m1 FROM b)
                  ELSE date_trunc('day',
                         valid_to - INTERVAL 1 MICROSECOND)
             END AS hi
           FROM iv2)
         SELECT user_id,
           unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS snap_ts,
           event_type, n_events
         FROM x""",

    "q146_mv_refresh" ->
      """SELECT user_id, COUNT(1) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v_sum,
           MIN(value) AS v_min, MAX(value) AS v_max,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / COUNT(1)
             AS v_avg
         FROM events GROUP BY user_id""",

    "q145_snapshot_diff" ->
      """WITH m AS (
           SELECT user_id, ts, event_id, event_type,
             CASE WHEN LAG(event_type) OVER
                    (PARTITION BY user_id ORDER BY ts, event_id)
                  IS DISTINCT FROM event_type THEN 1 ELSE 0 END AS chg
           FROM events),
         r AS (
           SELECT user_id, ts, event_type,
             SUM(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS run_id
           FROM m),
         iv AS (
           SELECT user_id, MIN(event_type) AS event_type,
                  MIN(ts) AS valid_from, COUNT(1) AS n_events
           FROM r GROUP BY user_id, run_id),
         iv2 AS (
           SELECT user_id, event_type, valid_from,
             LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from)
               AS valid_to,
             n_events
           FROM iv),
         b AS (SELECT date_trunc('day', MIN(ts)) + INTERVAL 1 DAY AS t1,
                      date_trunc('day', MAX(ts)) AS t2 FROM events),
         s1 AS (
           SELECT user_id, event_type AS state_before, n_events AS nb,
                  TRUE AS p1
           FROM iv2
           WHERE valid_from <= (SELECT t1 FROM b)
             AND (valid_to IS NULL OR valid_to > (SELECT t1 FROM b))),
         s2 AS (
           SELECT user_id, event_type AS state_after, n_events AS na,
                  TRUE AS p2
           FROM iv2
           WHERE valid_from <= (SELECT t2 FROM b)
             AND (valid_to IS NULL OR valid_to > (SELECT t2 FROM b)))
         SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
           s1.state_before, s2.state_after,
           COALESCE(s1.nb, 0) AS n_before, COALESCE(s2.na, 0) AS n_after,
           CASE WHEN s1.p1 IS NULL THEN 'added'
                WHEN s2.p2 IS NULL THEN 'removed'
                WHEN s1.state_before IS NOT DISTINCT FROM s2.state_after
                  THEN 'unchanged'
                ELSE 'changed' END AS change
         FROM s1 FULL OUTER JOIN s2 ON s1.user_id = s2.user_id""",

    "q120_key_skew" -> {
      def part(table: String, keyExpr: String, label: String) =
        s"""SELECT '$label' AS key_col, n_keys, total, max_n,
            CAST(sumsq AS BIGINT) AS sum_sq,
            CAST(max_n AS DOUBLE) / total AS top1_share,
            CAST(n_keys * sumsq AS DOUBLE)
              / CAST(CAST(total AS HUGEINT) * total AS DOUBLE) AS skew
            FROM (SELECT COUNT(1) AS n_keys, CAST(SUM(n) AS BIGINT) AS total,
                         CAST(MAX(n) AS BIGINT) AS max_n,
                         SUM(CAST(n AS HUGEINT) * n) AS sumsq
                  FROM (SELECT COUNT(1) AS n FROM $table
                        GROUP BY CAST($keyExpr AS VARCHAR)))"""
      Seq(part("events", "user_id", "events.user_id"),
        part("events", "event_type", "events.event_type"),
        part("lineitem", "l_suppkey", "lineitem.l_suppkey"),
        part("orders", "o_custkey", "orders.o_custkey"))
        .mkString("\n          UNION ALL\n          ")
    },

    "q118_pagerank" -> {
      // unrolled iterations generated with the exact Spark arithmetic:
      // (pr·w·17) // (outw·20) per edge in HUGEINT (≙ DECIMAL(38,0)),
      // floor-div back to BIGINT, base + incoming per node.
      val iters = (1 to PrIters).map { k =>
        s"""c$k AS (
            SELECT e.dst,
              CAST(SUM(CAST((CAST(p.pr AS HUGEINT) * e.w * 17)
                            // (CAST(e.outw AS HUGEINT) * 20) AS BIGINT))
                   AS BIGINT) AS inc
            FROM p${k - 1} p JOIN e ON p.node = e.src GROUP BY e.dst),
          p$k AS (
            SELECT n.node,
              CAST(CAST(3 * $PrScale AS HUGEINT) // (20 * nn.n) AS BIGINT)
                + COALESCE(c$k.inc, 0) AS pr
            FROM (SELECT node FROM p0) n CROSS JOIN nn
            LEFT JOIN c$k ON n.node = c$k.dst)"""
      }.mkString(",\n          ")
      s"""WITH edges AS (
            SELECT s.s_nationkey AS src, c.c_nationkey AS dst, COUNT(1) AS w
            FROM lineitem l
            JOIN orders o ON l.l_orderkey = o.o_orderkey
            JOIN customer c ON o.o_custkey = c.c_custkey
            JOIN supplier s ON l.l_suppkey = s.s_suppkey
            GROUP BY 1, 2),
          ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
                 FROM edges GROUP BY src),
          e AS (SELECT edges.src, edges.dst, edges.w, ow.outw
                FROM edges JOIN ow USING (src)),
          nn AS (SELECT COUNT(1) AS n FROM nation),
          p0 AS (
            SELECT n_nationkey AS node,
              CAST(CAST($PrScale AS HUGEINT) // nn.n AS BIGINT) AS pr
            FROM nation CROSS JOIN nn),
          $iters
          SELECT nation.n_name, p$PrIters.pr
          FROM p$PrIters JOIN nation ON p$PrIters.node = nation.n_nationkey"""
    },

    // Decimal→double casts go through VARCHAR: DuckDB casts a
    // hugeint-backed DECIMAL(38,s) to double as int128/10^s — TWO
    // roundings, off by an ulp once the scaled value passes 2^53 (spp at
    // sf1 trips it; Spark's BigDecimal cast is correctly rounded, and so
    // is DuckDB's string→double via fast_float).
    "q29_stats_moments" ->
      """WITH m AS (
           SELECT l_returnflag, COUNT(1) AS n,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sq,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sp,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_quantity AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqq,
             CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS spp,
             CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)) * CAST(l_extendedprice AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS sqp
           FROM lineitem GROUP BY 1)
         SELECT l_returnflag, n,
           (sqq - sq * sq / n) / (n - 1) AS var_qty,
           sqrt((sqq - sq * sq / n) / (n - 1)) AS sd_qty,
           (sqp - sq * sp / n) /
             sqrt((sqq - sq * sq / n) * (spp - sp * sp / n)) AS corr_qty_price
         FROM m""",

    "q25_session_window" ->
      s"""WITH $oSessionIslands
         SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL $SessionGapHours HOUR AS session_end,
           COUNT(1) AS n_events,
           MIN(value) AS min_value
         FROM s GROUP BY user_id, sid""",
    "q89_interval_union" ->
      """WITH ev AS (
           SELECT user_id, event_id,
             CAST(epoch_us(ts) AS BIGINT) AS st,
             CAST(epoch_us(ts) AS BIGINT) + 60000000 AS en
           FROM events),
         isl AS (
           SELECT user_id, event_id, st, en,
             CASE WHEN prev_max_en IS NULL OR st > prev_max_en
                  THEN 1 ELSE 0 END AS new_isl
           FROM (SELECT *,
                   MAX(en) OVER (PARTITION BY user_id ORDER BY st, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS prev_max_en
                 FROM ev)),
         num AS (
           SELECT user_id, st, en,
             SUM(new_isl) OVER (PARTITION BY user_id ORDER BY st, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
           FROM isl),
         grp AS (
           SELECT user_id, isl, COUNT(1) AS n_ev,
                  MIN(st) AS a, MAX(en) AS b
           FROM num GROUP BY user_id, isl)
         SELECT user_id, COUNT(1) AS n_intervals,
           CAST(SUM(n_ev) AS BIGINT) AS n_events,
           CAST(SUM(b - a) AS BIGINT) AS covered_us
         FROM grp GROUP BY user_id""",

    "q90_rate_anomaly" ->
      """WITH hc AS (
           SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(1) AS c
           FROM events GROUP BY 1, 2),
         st AS (
           SELECT user_id, COUNT(1) AS n,
             CAST(SUM(c) AS BIGINT) AS s,
             CAST(SUM(c * c) AS BIGINT) AS ss
           FROM hc GROUP BY user_id)
         SELECT hc.user_id, hc.hour, hc.c, st.n,
           (hc.c * st.n - st.s) * (hc.c * st.n - st.s)
             > 9 * (st.n * st.ss - st.s * st.s) AS is_spike
         FROM hc JOIN st ON hc.user_id = st.user_id""",

    "q104_value_drift" ->
      """WITH ev AS (
           SELECT event_type, CAST(epoch_us(ts) AS BIGINT) AS us,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events),
         bounds AS (SELECT event_type, MIN(c) AS cmin, MAX(c) AS cmax,
                      MIN(us) AS u0, MAX(us) AS u1
                    FROM ev GROUP BY 1),
         span AS (SELECT MIN(u0) AS t0, MAX(u1) AS t1 FROM bounds),
         binned AS (
           SELECT ev.event_type,
             (ev.us * 2 >= span.t0 + span.t1) AS is_new,
             least(15, CAST(((CAST(ev.c AS HUGEINT) - bounds.cmin) * 16)
                       // (bounds.cmax - bounds.cmin + 1) AS BIGINT)) AS bin
           FROM ev CROSS JOIN span
           JOIN bounds ON ev.event_type = bounds.event_type),
         cells AS (
           SELECT event_type, bin,
             CAST(SUM(CASE WHEN is_new THEN 0 ELSE 1 END) AS BIGINT) AS n_old,
             CAST(SUM(CASE WHEN is_new THEN 1 ELSE 0 END) AS BIGINT) AS n_new
           FROM binned GROUP BY 1, 2),
         tot AS (
           SELECT event_type, n_old, n_new,
             CAST(SUM(n_old) OVER (PARTITION BY event_type) AS BIGINT) AS t_old,
             CAST(SUM(n_new) OVER (PARTITION BY event_type) AS BIGINT) AS t_new
           FROM cells)
         SELECT event_type, MAX(t_old) AS n_old_total,
           MAX(t_new) AS n_new_total,
           CASE WHEN MAX(t_old) = 0 OR MAX(t_new) = 0 THEN CAST(2.0 AS DOUBLE)
                ELSE CAST(SUM(abs(CAST(n_old AS HUGEINT) * t_new
                                  - CAST(n_new AS HUGEINT) * t_old)) AS DOUBLE)
                     / CAST(CAST(MAX(t_old) AS HUGEINT) * MAX(t_new) AS DOUBLE)
           END AS drift
         FROM tot GROUP BY event_type""",

    "q100_group_correlation" ->
      """WITH b AS (
           SELECT l_returnflag,
             CAST(CAST(l_quantity AS BIGINT) AS HUGEINT) AS x,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS HUGEINT) AS y
           FROM lineitem),
         m AS (
           SELECT l_returnflag, CAST(COUNT(1) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
           FROM b GROUP BY l_returnflag)
         SELECT l_returnflag, CAST(n AS BIGINT) AS n_rows,
           CAST(n * sxy - sx * sy AS DOUBLE)
             / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
                * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS corr_qty_price
         FROM m""",

    "q98_exists_subquery" ->
      """SELECT c_custkey, c_name, c_acctbal FROM customer c
         WHERE EXISTS (SELECT 1 FROM orders o
                       WHERE o.o_custkey = c.c_custkey
                         AND o.o_orderpriority = '1-URGENT')
           AND NOT EXISTS (SELECT 1 FROM orders o
                           WHERE o.o_custkey = c.c_custkey
                             AND o.o_totalprice < 5000)""",

    "q97_time_gridfill" ->
      """WITH hc AS (
           SELECT user_id, date_trunc('hour', ts) AS hour, COUNT(1) AS c
           FROM events GROUP BY 1, 2),
         grid AS (
           SELECT user_id,
             unnest(generate_series(h0, h1, INTERVAL 1 HOUR)) AS hour
           FROM (SELECT user_id, MIN(hour) AS h0, MAX(hour) AS h1
                 FROM hc GROUP BY user_id))
         SELECT grid.user_id, grid.hour,
           CAST(coalesce(hc.c, 0) AS BIGINT) AS n_events,
           hc.c IS NULL AS filled
         FROM grid LEFT JOIN hc
           ON grid.user_id = hc.user_id AND grid.hour = hc.hour""",

    "q207_rfm_segments" -> {
      def oCuts(dim: String) =
        s"""${dim}_cuts AS (
           |  SELECT
           |    MIN(CASE WHEN cum >= (1 * n + 3) // 4 THEN v END) AS ${dim}_c1,
           |    MIN(CASE WHEN cum >= (2 * n + 3) // 4 THEN v END) AS ${dim}_c2,
           |    MIN(CASE WHEN cum >= (3 * n + 3) // 4 THEN v END) AS ${dim}_c3
           |  FROM (
           |    SELECT v,
           |      CAST(SUM(cnt) OVER (ORDER BY v
           |        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           |        AS cum,
           |      CAST(SUM(cnt) OVER () AS BIGINT) AS n
           |    FROM (SELECT $dim AS v, COUNT(1) AS cnt FROM cust GROUP BY 1)))""".stripMargin
      def oCode(dim: String) =
        s"""(1 + CAST(cust.$dim > ${dim}_c1 AS BIGINT)
           |   + CAST(cust.$dim > ${dim}_c2 AS BIGINT)
           |   + CAST(cust.$dim > ${dim}_c3 AS BIGINT))""".stripMargin
      s"""WITH o AS (
         |  SELECT o_custkey, o_orderdate,
         |    CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
         |  FROM orders),
         |maxd AS (SELECT MAX(o_orderdate) AS maxd FROM o),
         |cust AS (
         |  SELECT o_custkey,
         |    CAST(date_diff('day', MAX(o_orderdate),
         |      (SELECT maxd FROM maxd)) AS BIGINT) AS recency,
         |    COUNT(1) AS freq,
         |    CAST(SUM(cents) AS BIGINT) AS monetary
         |  FROM o GROUP BY 1),
         |${oCuts("recency")},
         |${oCuts("freq")},
         |${oCuts("monetary")}
         |SELECT segment, COUNT(1) AS n_customers,
         |  CAST(SUM(monetary) AS BIGINT) AS total_monetary_cents
         |FROM (
         |  SELECT 'R' || CAST(${oCode("recency")} AS VARCHAR)
         |      || 'F' || CAST(${oCode("freq")} AS VARCHAR)
         |      || 'M' || CAST(${oCode("monetary")} AS VARCHAR) AS segment,
         |    cust.monetary
         |  FROM cust
         |  CROSS JOIN recency_cuts CROSS JOIN freq_cuts CROSS JOIN monetary_cuts)
         |GROUP BY 1""".stripMargin
    },

    "q209_daily_percentiles" ->
      """WITH ev AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events),
         hist AS (
           SELECT event_type, day, c, COUNT(1) AS cnt
           FROM ev GROUP BY 1, 2, 3),
         cum AS (
           SELECT event_type, day, c,
             CAST(SUM(cnt) OVER (PARTITION BY event_type, day ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY event_type, day) AS BIGINT) AS n
           FROM hist)
         SELECT event_type, day, MAX(n) AS n,
           MIN(CASE WHEN cum >= (50 * n + 99) // 100 THEN c END) AS p50_cents,
           MIN(CASE WHEN cum >= (95 * n + 99) // 100 THEN c END) AS p95_cents,
           MIN(CASE WHEN cum >= (99 * n + 99) // 100 THEN c END) AS p99_cents
         FROM cum GROUP BY 1, 2""",

    "q95_winsorize" ->
      """WITH ev AS (
           SELECT event_id, event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events),
         hist AS (
           SELECT event_type, c, COUNT(1) AS cnt
           FROM ev GROUP BY 1, 2),
         cum AS (
           SELECT event_type, c, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM hist),
         cuts AS (
           SELECT event_type,
             MIN(CASE WHEN cum >= (5 * n + 99) // 100 THEN c END) AS c_lo,
             MIN(CASE WHEN cum >= (95 * n + 99) // 100 THEN c END) AS c_hi
           FROM cum GROUP BY event_type)
         SELECT ev.event_id, ev.event_type,
           CAST(ev.c AS DOUBLE) / 100.0 AS value,
           CAST(least(greatest(ev.c, cuts.c_lo), cuts.c_hi) AS DOUBLE) / 100.0
             AS value_w,
           ev.c < cuts.c_lo OR ev.c > cuts.c_hi AS clipped
         FROM ev JOIN cuts ON ev.event_type = cuts.event_type""",

    "q92_event_transitions" ->
      """WITH trans AS (
           SELECT event_type AS from_type, to_type, COUNT(1) AS n_trans
           FROM (SELECT event_type,
                   LEAD(event_type, 1) OVER (PARTITION BY user_id
                     ORDER BY ts, event_id) AS to_type
                 FROM events)
           WHERE to_type IS NOT NULL
           GROUP BY 1, 2),
         tot AS (
           SELECT from_type, CAST(SUM(n_trans) AS BIGINT) AS n_from
           FROM trans GROUP BY from_type)
         SELECT trans.from_type, trans.to_type, trans.n_trans,
           CAST(trans.n_trans AS DOUBLE) / tot.n_from AS prob
         FROM trans JOIN tot ON trans.from_type = tot.from_type""",

    "q105_event_paths" ->
      """SELECT step1, step2, step3, COUNT(1) AS n_paths,
            COUNT(DISTINCT user_id) AS n_users
         FROM (SELECT user_id, event_type AS step1,
                 LEAD(event_type, 1) OVER w AS step2,
                 LEAD(event_type, 2) OVER w AS step3
               FROM events
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
         WHERE step3 IS NOT NULL
         GROUP BY 1, 2, 3
         ORDER BY n_paths DESC, step1, step2, step3 LIMIT 25""",

    "q91_group_median" ->
      """WITH hist AS (
           SELECT o_orderpriority,
             CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS cents,
             COUNT(1) AS cnt
           FROM orders GROUP BY 1, 2),
         cum AS (
           SELECT o_orderpriority, cents, cnt,
             CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority ORDER BY cents
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
               AS cum,
             CAST(SUM(cnt) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
           FROM hist)
         SELECT o_orderpriority, MAX(n) AS n_orders,
           CAST(MIN(CASE WHEN cum >= (n + 1) // 2 THEN cents END)
              + MIN(CASE WHEN cum >= n // 2 + 1 THEN cents END) AS DOUBLE)
             / 200.0 AS median_price
         FROM cum GROUP BY o_orderpriority""",

    // q26: the exact column hash-matches; the engine-specific HLL value is
    // asserted through the approx_ok bound column (see the query comment).
    "q26_approx_distinct" ->
      """SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS exact_parts,
            TRUE AS approx_ok
         FROM lineitem GROUP BY l_returnflag""",

    "q49_range_join" ->
      s"""WITH $oSessionIslands,
         sess AS (
           SELECT user_id, MIN(ts) AS session_start,
                  MAX(ts) + INTERVAL $SessionGapHours HOUR AS session_end
           FROM s GROUP BY user_id, sid)
         SELECT e.user_id, e.ts, e.value, sess.session_start
         FROM events e JOIN sess
           ON e.user_id = sess.user_id
          AND e.ts >= sess.session_start AND e.ts < sess.session_end""",

    "q48_asof_join" ->
      """SELECT e.user_id, e.ts, e.value, c.ts AS cal_ts, c.cval AS cal_value
         FROM events e
         ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS cval
                         FROM events WHERE value > 190
                         GROUP BY user_id, ts) c
           ON e.user_id = c.user_id AND e.ts >= c.ts""",

    // Identical result contract to q48 — the native operator must land on
    // exactly the same rows as both the composed union-window plan and
    // DuckDB's built-in ASOF join.
    "q183_asof_native" ->
      """SELECT e.user_id, e.ts, e.value, c.ts AS cal_ts, c.cval AS cal_value
         FROM events e
         ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS cval
                         FROM events WHERE value > 190
                         GROUP BY user_id, ts) c
           ON e.user_id = c.user_id AND e.ts >= c.ts""",

    "q152_asof_tolerance" ->
      s"""SELECT user_id, ts, value,
           CASE WHEN cal_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(cal_ts) <= $AsofToleranceUs
                THEN cal_ts END AS cal_ts,
           CASE WHEN cal_ts IS NOT NULL
                 AND epoch_us(ts) - epoch_us(cal_ts) <= $AsofToleranceUs
                THEN cal_value END AS cal_value,
           (cal_ts IS NOT NULL
             AND epoch_us(ts) - epoch_us(cal_ts) <= $AsofToleranceUs)
             AS matched
         FROM (
           SELECT e.user_id, e.ts, e.value, c.ts AS cal_ts, c.cval AS cal_value
           FROM events e
           ASOF LEFT JOIN (SELECT user_id, ts, MAX(value) AS cval
                           FROM events WHERE value > 190
                           GROUP BY user_id, ts) c
             ON e.user_id = c.user_id AND e.ts >= c.ts)""",

    "q24_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus,
            CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
            COUNT(1) AS n_rows
         FROM lineitem
         GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))""",

    // TWA twin: identical cents/µs integer pipeline, HUGEINT ≙ Spark's
    // DECIMAL(38,0) accumulator, identical final divides of exact ints.
    "q159_time_weighted_avg" ->
      """WITH b AS (
           SELECT user_id, epoch_us(ts) AS us,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS HUGEINT) AS cents,
             LEAD(epoch_us(ts)) OVER (
               PARTITION BY user_id ORDER BY ts, event_id) AS next_us
           FROM events)
         SELECT user_id, COUNT(1) AS n_events,
           MAX(us) - MIN(us) AS span_us,
           CASE WHEN MAX(us) > MIN(us)
                THEN CAST(SUM(cents * (next_us - us)) AS DOUBLE)
                     / (MAX(us) - MIN(us)) / 100
           END AS twa_value
         FROM b GROUP BY user_id""",

    "q167_attribution" ->
      """WITH e AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS us
           FROM events),
         w AS (
           SELECT user_id, event_id, event_type, us,
             MIN(CASE WHEN event_type <> 'purchase' THEN us END) OVER f AS ft_us,
             MAX(CASE WHEN event_type <> 'purchase' THEN us END) OVER f AS lt_us
           FROM e
           WINDOW f AS (PARTITION BY user_id ORDER BY us
             RANGE BETWEEN 604800000000 PRECEDING AND 1 PRECEDING)),
         touch AS (
           SELECT user_id, us AS t_us, arg_min(event_type, event_id) AS t_type
           FROM e WHERE event_type <> 'purchase' GROUP BY 1, 2)
         SELECT w.user_id, w.event_id AS purchase_id, w.us AS purchase_us,
           w.ft_us, ft.t_type AS ft_type, w.lt_us, lt.t_type AS lt_type
         FROM w
         LEFT JOIN touch ft ON w.user_id = ft.user_id AND w.ft_us = ft.t_us
         LEFT JOIN touch lt ON w.user_id = lt.user_id AND w.lt_us = lt.t_us
         WHERE w.event_type = 'purchase'""",

    // Percentile-rank twin: the row-level window definition the Spark side
    // decomposes into a histogram walk + stamp join.
    "q168_pct_rank" ->
      """SELECT doc_id, source, n_chars,
           PERCENT_RANK() OVER (PARTITION BY source ORDER BY n_chars)
             AS pct_rank
         FROM documents""",

    "q169_mad_outliers" ->
      """WITH e AS (
           SELECT event_type,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events),
         h AS (SELECT event_type, c, COUNT(1) AS cnt FROM e GROUP BY 1, 2),
         cum AS (
           SELECT event_type, c, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY c
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
           FROM h),
         med AS (
           SELECT event_type, MAX(n) AS n,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN c END) AS med
           FROM cum GROUP BY 1),
         dh AS (
           SELECT h.event_type, abs(h.c - med.med) AS dev,
             CAST(SUM(h.cnt) AS BIGINT) AS cnt
           FROM h JOIN med ON h.event_type = med.event_type
           GROUP BY 1, 2),
         dcum AS (
           SELECT event_type, dev, cnt,
             SUM(cnt) OVER (PARTITION BY event_type ORDER BY dev
               ROWS UNBOUNDED PRECEDING) AS cum,
             SUM(cnt) OVER (PARTITION BY event_type) AS n
           FROM dh),
         mad AS (
           SELECT event_type,
             MIN(CASE WHEN cum >= (n + 1) // 2 THEN dev END) AS mad
           FROM dcum GROUP BY 1)
         SELECT h.event_type, CAST(med.n AS BIGINT) AS n_events,
           med.med AS med_cents, mad.mad AS mad_cents,
           CAST(SUM(CASE WHEN abs(h.c - med.med) > 3 * mad.mad
             THEN h.cnt ELSE 0 END) AS BIGINT) AS n_outliers
         FROM h
         JOIN med ON h.event_type = med.event_type
         JOIN mad ON h.event_type = mad.event_type
         GROUP BY 1, 2, 3, 4""",

    "q170_merge_upsert" ->
      """WITH base AS (
           SELECT c_custkey, c_name, c_acctbal FROM customer),
         delta AS (
           SELECT CASE WHEN c_custkey % 10 = 5 THEN c_custkey + 1000000
                       ELSE c_custkey END AS k,
             CASE WHEN c_custkey % 10 = 7 THEN 'D' ELSE 'U' END AS dop,
             upper(c_name) AS d_name,
             CAST(CAST(c_acctbal AS DECIMAL(18,2)) + 0.01 AS DOUBLE)
               AS d_acctbal
           FROM base
           WHERE c_custkey % 10 IN (3, 5, 7))
         SELECT COALESCE(b.c_custkey, d.k) AS c_custkey,
           COALESCE(d.d_name, b.c_name) AS c_name,
           COALESCE(d.d_acctbal, b.c_acctbal) AS c_acctbal,
           CASE WHEN b.c_custkey IS NULL THEN 'insert'
                WHEN d.dop IS NULL THEN 'keep'
                ELSE 'update' END AS op
         FROM base b FULL OUTER JOIN delta d ON b.c_custkey = d.k
         WHERE COALESCE(d.dop, '') <> 'D'""",

    "q171_rolling_time_window" ->
      """WITH e AS (
           SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS cents
           FROM events)
         SELECT event_id, user_id, us,
           COUNT(1) OVER f AS n_7d,
           CAST(SUM(cents) OVER f AS BIGINT) AS cents_7d
         FROM e
         WINDOW f AS (PARTITION BY user_id ORDER BY us
           RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)""",

    // Skyline twin: the quadratic NOT-EXISTS dominance definition — the
    // semantics, stated directly; the Spark side must reproduce it from
    // the staircase + bucket suffix-max decomposition.
    "q161_skyline" ->
      """WITH pts AS (
           SELECT doc_id, n_chars,
             CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT)
               AS n_distinct_tok
           FROM documents)
         SELECT p.doc_id, p.n_chars, p.n_distinct_tok
         FROM pts p
         WHERE NOT EXISTS (
           SELECT 1 FROM pts q
           WHERE q.n_chars <= p.n_chars AND q.n_distinct_tok >= p.n_distinct_tok
             AND (q.n_chars < p.n_chars OR q.n_distinct_tok > p.n_distinct_tok))""",

    "q163_type_cooccurrence" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events)
         SELECT a.event_type AS type_a, b.event_type AS type_b,
                COUNT(1) AS n_users
         FROM ut a JOIN ut b
           ON a.user_id = b.user_id AND a.event_type < b.event_type
         GROUP BY 1, 2""",

    // Salted-join twin: the UNSALTED plain join — the whole point. The
    // salt is an execution detail; semantics must be bit-identical.
    "q158_salted_join" ->
      """WITH dim AS (
           SELECT user_id, event_type AS modal_event_type FROM (
             SELECT user_id, event_type, COUNT(1) AS cnt,
               ROW_NUMBER() OVER (PARTITION BY user_id
                 ORDER BY COUNT(1) DESC, event_type) AS rn
             FROM events GROUP BY user_id, event_type)
           WHERE rn = 1)
         SELECT e.event_type, d.modal_event_type, COUNT(1) AS n_events
         FROM events e JOIN dim d ON e.user_id = d.user_id
         GROUP BY 1, 2""",

    "q153_data_profile" -> {
      def prof(c: String, kind: String): String = {
        val (mnN, mxN) =
          if (kind == "num")
            (s"CAST(MIN($c) AS DOUBLE)", s"CAST(MAX($c) AS DOUBLE)")
          else ("CAST(NULL AS DOUBLE)", "CAST(NULL AS DOUBLE)")
        val (mnS, mxS) =
          if (kind == "str") (s"MIN($c)", s"MAX($c)")
          else ("CAST(NULL AS VARCHAR)", "CAST(NULL AS VARCHAR)")
        val (mnT, mxT) =
          if (kind == "ts") (s"MIN($c)", s"MAX($c)")
          else ("CAST(NULL AS TIMESTAMP)", "CAST(NULL AS TIMESTAMP)")
        s"""SELECT '$c' AS col_name, COUNT(1) AS n_rows,
              COUNT(1) - COUNT($c) AS n_nulls,
              COUNT(DISTINCT $c) AS n_distinct,
              $mnN AS min_num, $mxN AS max_num,
              $mnS AS min_str, $mxS AS max_str,
              $mnT AS min_ts, $mxT AS max_ts
            FROM lineitem"""
      }
      (Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax")
        .map(prof(_, "num")) ++
        Seq("l_returnflag", "l_linestatus").map(prof(_, "str")) ++
        Seq("l_shipdate").map(prof(_, "ts")))
        .mkString(" UNION ALL ")
    },

    "q154_fk_orphans" -> {
      def edge(name: String, child: String, ck: String,
               parent: String, pk: String): String =
        s"""SELECT '$name' AS edge, COUNT(1) AS child_rows,
              COUNT(CASE WHEN p.__pk IS NULL AND CAST(c.$ck AS BIGINT)
                          IS NOT NULL THEN 1 END) AS orphan_rows,
              COUNT(DISTINCT CASE WHEN p.__pk IS NULL
                             THEN CAST(c.$ck AS BIGINT) END) AS orphan_keys
            FROM $child c
            LEFT JOIN (SELECT DISTINCT CAST($pk AS BIGINT) AS __pk
                       FROM $parent) p
              ON CAST(c.$ck AS BIGINT) = p.__pk"""
      Seq(
        edge("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        edge("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        edge("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        edge("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        edge("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
        edge("supplier->nation", "supplier", "s_nationkey", "nation", "n_nationkey"),
        edge("nation->region", "nation", "n_regionkey", "region", "r_regionkey")
      ).mkString(" UNION ALL ")
    },

    // Overlap twin: the TRUE interval-overlap predicate, stated directly —
    // the Spark side's grid-cell equi join must reproduce it exactly.
    "q172_interval_overlap" ->
      s"""WITH $oSessionIslands,
         sess AS (
           SELECT user_id, MIN(ts) AS s_start,
             MAX(ts) + INTERVAL $SessionGapHours HOUR AS s_end
           FROM s GROUP BY user_id, sid),
         daily AS (
           SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS inc_day,
             COUNT(DISTINCT user_id) AS n_users
           FROM events GROUP BY 1),
         tot AS (SELECT SUM(n_users) AS total_u, COUNT(1) AS n_days FROM daily),
         inc AS (
           SELECT inc_day, n_users FROM daily, tot
           WHERE n_users * n_days > total_u)
         SELECT sess.user_id, epoch_us(s_start) AS s_start_us,
           epoch_us(s_end) AS s_end_us, epoch_us(inc_day) AS inc_day_us,
           n_users
         FROM sess JOIN inc
           ON sess.s_start < inc.inc_day + INTERVAL 1 DAY
          AND sess.s_end > inc.inc_day""",

    "q173_k_anonymity" ->
      """WITH cb AS (
           SELECT c_custkey, c_nationkey, c_mktsegment,
             CAST((cents - ((cents % 100000) + 100000) % 100000) / 100000
               AS BIGINT) AS band
           FROM (SELECT c_custkey, c_nationkey, c_mktsegment,
                   CAST(CAST(c_acctbal AS DECIMAL(18,2)) * 100 AS BIGINT)
                     AS cents
                 FROM customer)),
         k AS (SELECT c_nationkey, c_mktsegment, band, COUNT(1) AS k
               FROM cb GROUP BY 1, 2, 3),
         l AS (SELECT c_nationkey, c_mktsegment, band,
                 COUNT(1) AS l_div
               FROM (SELECT DISTINCT c_nationkey, c_mktsegment, band,
                       o_orderpriority
                     FROM cb JOIN orders ON c_custkey = o_custkey)
               GROUP BY 1, 2, 3)
         SELECT k.c_nationkey, k.c_mktsegment, k.band, k.k,
           COALESCE(l.l_div, 0) AS l_div, k.k < 5 AS risky
         FROM k LEFT JOIN l
           ON k.c_nationkey = l.c_nationkey
          AND k.c_mktsegment = l.c_mktsegment AND k.band = l.band""",

    "q174_ab_ztest" ->
      """WITH agg AS (
           SELECT
             CAST(SUM(CASE WHEN event_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN event_id % 2 = 0
                            AND event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x1,
             CAST(SUM(CASE WHEN event_id % 2 <> 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN event_id % 2 <> 0
                            AND event_type = 'purchase' THEN 1 ELSE 0 END)
               AS BIGINT) AS x2
           FROM events),
         alg AS (
           SELECT n1, x1, n2, x2,
             CAST(x1 AS HUGEINT) * n2 - CAST(x2 AS HUGEINT) * n1 AS dd,
             CAST(n1 + n2 AS HUGEINT) AS n, CAST(x1 + x2 AS HUGEINT) AS x
           FROM agg)
         SELECT n1, x1, n2, x2,
           CASE WHEN x > 0 AND x < n THEN
             CAST(dd * dd * n AS DOUBLE) /
             CAST(CAST(n1 AS HUGEINT) * n2 * x * (n - x) AS DOUBLE)
           END AS z2,
           CASE WHEN x > 0 AND x < n THEN
             10000 * dd * dd * n >
               38416 * CAST(n1 AS HUGEINT) * n2 * x * (n - x)
           ELSE FALSE END AS significant
         FROM alg""",

    "q198_spearman" ->
      """WITH li AS (
           SELECT l_returnflag AS g,
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT) AS q,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS p
           FROM lineitem),
         rq AS (
           SELECT g, q, 2 * COALESCE(SUM(t) OVER (PARTITION BY g ORDER BY q
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + t + 1 AS r2_q
           FROM (SELECT g, q, COUNT(1) AS t FROM li GROUP BY g, q)),
         rp AS (
           SELECT g, p, 2 * COALESCE(SUM(t) OVER (PARTITION BY g ORDER BY p
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             + t + 1 AS r2_p
           FROM (SELECT g, p, COUNT(1) AS t FROM li GROUP BY g, p)),
         ranked AS (
           SELECT li.g, CAST(r2_q AS HUGEINT) AS x,
             CAST(r2_p AS HUGEINT) AS y
           FROM li JOIN rq ON li.g = rq.g AND li.q = rq.q
           JOIN rp ON li.g = rp.g AND li.p = rp.p),
         mom AS (
           SELECT g, CAST(COUNT(1) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
           FROM ranked GROUP BY g)
         SELECT g AS l_returnflag, CAST(n AS BIGINT) AS n,
           CAST(n * sxy - sx * sy AS DOUBLE) /
             sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
               * CAST(n * syy - sy * sy AS DOUBLE)) AS spearman_rho
         FROM mom""",

    // Kruskal–Wallis twin: the same fixed type order and the same textual
    // float-op sequence, so every scalar step is bit-identical.
    "q197_kruskal_wallis" -> {
      val types = Seq("click", "error", "purchase", "signup", "view")
      val histCols = types.map(ty =>
        s"""CAST(SUM(CASE WHEN event_type = '$ty' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_$ty""").mkString(",\n             ")
      val aggCols = types.map(ty =>
        s"""CAST(SUM(n_$ty) AS BIGINT) AS cnt_$ty,
            SUM(CAST(n_$ty AS HUGEINT) * (2 * cum + t + 1)) AS r2_$ty""")
        .mkString(",\n             ")
      val sumR = types.map(ty =>
        s"""CAST(r2_$ty AS DOUBLE) * CAST(r2_$ty AS DOUBLE)
            / (4.0 * CAST(cnt_$ty AS DOUBLE))""").mkString(" + ")
      s"""WITH ev AS (
            SELECT event_type,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            FROM events),
          hist AS (
            SELECT c, COUNT(1) AS t,
             $histCols
            FROM ev GROUP BY c),
          cum AS (
            SELECT *, COALESCE(SUM(t) OVER (ORDER BY c
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum
            FROM hist),
          agg AS (
            SELECT CAST(SUM(t) AS BIGINT) AS n,
              SUM(CAST(t AS HUGEINT) * t * t - t) AS ties,
             $aggCols
            FROM cum),
          alg AS (
            SELECT n, ties, ($sumR) AS sumr,
              CAST(n AS DOUBLE) AS nd
            FROM agg),
          hh AS (
            SELECT n,
              12.0 / (nd * (nd + 1)) * sumr - 3.0 * (nd + 1) AS h,
              (12.0 / (nd * (nd + 1)) * sumr - 3.0 * (nd + 1))
                / (1.0 - CAST(ties AS DOUBLE) / (nd * nd * nd - nd))
                AS h_tie_corrected
            FROM alg)
          SELECT n, h, h_tie_corrected,
            h_tie_corrected > 9.487729036781154e0 AS significant
          FROM hh"""
    },

    "q196_mann_whitney" ->
      """WITH ev AS (
           SELECT event_type, event_id % 2 = 0 AS arm_a,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events),
         hist AS (
           SELECT event_type, c,
             CAST(SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN NOT arm_a THEN 1 ELSE 0 END) AS BIGINT) AS nb
           FROM ev GROUP BY 1, 2),
         cum AS (
           SELECT *, COALESCE(SUM(nb) OVER (PARTITION BY event_type
               ORDER BY c ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
             0) AS cumb
           FROM hist),
         agg AS (
           SELECT event_type,
             CAST(SUM(na) AS BIGINT) AS n1, CAST(SUM(nb) AS BIGINT) AS n2,
             SUM(CAST(na AS HUGEINT) * (2 * CAST(cumb AS HUGEINT) + nb))
               AS u2d,
             SUM(CAST(na + nb AS HUGEINT) * (na + nb) * (na + nb)
               - (na + nb)) AS ties
           FROM cum GROUP BY 1),
         alg AS (
           SELECT event_type, n1, n2, u2d,
             CAST(n1 + n2 AS HUGEINT) AS n,
             CAST(n1 AS HUGEINT) * n2 AS n12, ties
           FROM agg)
         SELECT event_type, n1, n2, CAST(u2d AS BIGINT) AS u2,
           CAST(3 * (u2d - n12) * (u2d - n12) * n * (n - 1) AS DOUBLE)
             / CAST(n12 * (n * (n - 1) * (n + 1) - ties) AS DOUBLE) AS z2,
           10000 * (3 * (u2d - n12) * (u2d - n12) * n * (n - 1)) >
             38416 * (n12 * (n * (n - 1) * (n + 1) - ties)) AS significant
         FROM alg""",

    // KS twin: cumulatives INCLUDE the current row (ECDF at ≤ v); the D
    // numerator and the α=0.05 verdict are the same cross-multiplied
    // integer forms, HUGEINT ≙ DECIMAL(38,0).
    "q214_ks_test" ->
      """WITH ev AS (
           SELECT event_type, event_id % 2 = 0 AS arm_a,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events),
         hist AS (
           SELECT event_type, c,
             CAST(SUM(CASE WHEN arm_a THEN 1 ELSE 0 END) AS BIGINT) AS na,
             CAST(SUM(CASE WHEN NOT arm_a THEN 1 ELSE 0 END) AS BIGINT) AS nb
           FROM ev GROUP BY 1, 2),
         cum AS (
           SELECT event_type,
             SUM(na) OVER (PARTITION BY event_type ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
             SUM(nb) OVER (PARTITION BY event_type ORDER BY c
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
             SUM(na) OVER (PARTITION BY event_type) AS n_a,
             SUM(nb) OVER (PARTITION BY event_type) AS n_b
           FROM hist),
         agg AS (
           SELECT event_type,
             CAST(MAX(n_a) AS BIGINT) AS n_a, CAST(MAX(n_b) AS BIGINT) AS n_b,
             MAX(ABS(CAST(cuma AS HUGEINT) * n_b
               - CAST(cumb AS HUGEINT) * n_a)) AS d_num_h
           FROM cum GROUP BY 1)
         SELECT event_type, n_a, n_b, CAST(d_num_h AS BIGINT) AS d_num,
           CAST(d_num_h AS DOUBLE)
             / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)) AS d,
           1000000 * d_num_h * d_num_h >
             1844164 * CAST(n_a AS HUGEINT) * n_b * (n_a + n_b) AS significant
         FROM agg""",

    // Bootstrap twin: identical md5-derived uniforms, identical integer
    // CDF thresholds (the PoissonCdf16 literals), identical rank-based CI.
    "q223_bootstrap_ci" -> {
      val thr = PoissonCdf16.zipWithIndex
        .map { case (v, k) => s"WHEN u < $v THEN $k" }
        .mkString(" ")
      s"""WITH ev AS (
            SELECT event_id, event_type,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
            FROM events),
          reps AS (
            SELECT event_type, b,
              CAST(SUM(w) AS BIGINT) AS sw,
              CAST(SUM(w * c) AS BIGINT) AS swc
            FROM (
              SELECT event_type, c, j * 8 + k AS b,
                CASE $thr ELSE ${PoissonCdf16.length} END AS w
              FROM (
                SELECT event_type, c, j, CAST(k AS BIGINT) AS k,
                  CAST(concat('0x', substr(h, CAST(4 * k + 1 AS INT), 4))
                    AS BIGINT) AS u
                FROM (
                  SELECT event_type, c, CAST(i AS BIGINT) AS j,
                    md5(concat('bs|', CAST(i AS VARCHAR), '|',
                      CAST(event_id AS VARCHAR))) AS h
                  FROM ev, UNNEST(range(0, ${BootReplicas / 8})) AS r(i)),
                UNNEST(range(0, 8)) AS rk(k)))
            GROUP BY 1, 2
            HAVING SUM(w) > 0),
          means AS (
            SELECT event_type, b,
              CAST((CAST(swc AS HUGEINT) * 10000) // sw AS BIGINT) AS mean_b
            FROM reps),
          ranked AS (
            SELECT event_type, mean_b,
              ROW_NUMBER() OVER (PARTITION BY event_type
                ORDER BY mean_b, b) AS rn,
              COUNT(1) OVER (PARTITION BY event_type) AS n_boot
            FROM means),
          ci AS (
            SELECT event_type, CAST(MAX(n_boot) AS BIGINT) AS n_boot,
              MAX(CASE WHEN rn = 2 THEN mean_b END) AS ci_lo,
              MAX(CASE WHEN rn = n_boot - 1 THEN mean_b END) AS ci_hi
            FROM ranked GROUP BY 1),
          pt AS (
            SELECT event_type, CAST(COUNT(1) AS BIGINT) AS n,
              CAST((CAST(SUM(c) AS HUGEINT) * 10000) // COUNT(1) AS BIGINT)
                AS mean_u
            FROM ev GROUP BY 1)
          SELECT p.event_type, p.n, p.mean_u, ci.n_boot, ci.ci_lo, ci.ci_hi,
            ci.ci_lo <= p.mean_u AND p.mean_u <= ci.ci_hi AS covers_point
          FROM pt p JOIN ci USING (event_type)"""
    },

    // Burst twin: same (item × day) histogram, same RANGE(-7,-1) trailing
    // frame, same integer inequality with the shared constants.
    "q224_term_bursts" ->
      s"""WITH ev AS (
            SELECT CAST(json_extract_string(props, '$$.k') AS BIGINT) AS item,
              CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
            FROM events),
          hist AS (
            SELECT item, day, CAST(COUNT(1) AS BIGINT) AS n
            FROM ev GROUP BY 1, 2),
          mind AS (SELECT MIN(day) AS mind FROM hist),
          based AS (
            SELECT item, day, n,
              CAST(COALESCE(SUM(n) OVER (PARTITION BY item ORDER BY day
                RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                AS base_sum
            FROM hist)
          SELECT item, day, n, base_sum,
            (n * 7 > base_sum * $BurstFactor AND n >= $MinBurstCount)
              AS is_burst
          FROM based, mind
          WHERE day >= mind + 7""",

    // Survival twin: the q25 session-islands CTE, the same censoring rule
    // and the same integer hazard terms.
    "q229_session_survival" ->
      s"""WITH $oSessionIslands,
          sess AS (
            SELECT user_id, sid, MIN(ts) AS st, MAX(ts) AS en
            FROM s GROUP BY 1, 2),
          mx AS (SELECT MAX(en) AS max_en FROM sess),
          lifet AS (
            SELECT (epoch_us(en) - epoch_us(st)) // 3600000000 AS t,
              en < max_en - INTERVAL $SessionGapHours HOUR AS ended
            FROM sess, mx),
          hist AS (
            SELECT t,
              CAST(SUM(CASE WHEN ended THEN 1 ELSE 0 END) AS BIGINT)
                AS n_event,
              CAST(SUM(CASE WHEN NOT ended THEN 1 ELSE 0 END) AS BIGINT)
                AS n_censor
            FROM lifet GROUP BY 1),
          tot AS (SELECT CAST(SUM(n_event + n_censor) AS BIGINT) AS total
                  FROM hist),
          risk AS (
            SELECT t, n_event, n_censor,
              total - CAST(COALESCE(SUM(n_event + n_censor) OVER (
                ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                0) AS BIGINT) AS n_risk
            FROM hist, tot)
          SELECT t, n_risk, n_event, n_censor,
            CAST(SUM((1000000 * n_event) // n_risk) OVER (ORDER BY t
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS cum_hazard_u
          FROM risk""",

    // CUSUM twin: same micro-cent means, same prefix-sum/prefix-min
    // identity, same dials.
    "q230_cusum_shift" ->
      s"""WITH daily AS (
            SELECT event_type,
              CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day,
              CAST(COUNT(1) AS BIGINT) AS n,
              CAST(SUM(CAST(value AS DECIMAL(18,2)) * 100) AS BIGINT) AS sc
            FROM events GROUP BY 1, 2),
          mu AS (
            SELECT event_type,
              CAST((CAST(SUM(sc) AS HUGEINT) * 10000) // SUM(n) AS BIGINT)
                AS mu
            FROM daily GROUP BY 1),
          y AS (
            SELECT daily.event_type, day, n,
              CAST((CAST(sc AS HUGEINT) * 10000) // n AS BIGINT) - mu
                - $CusumAllowanceU AS y
            FROM daily JOIN mu USING (event_type)),
          c AS (
            SELECT event_type, day, n, y,
              CAST(SUM(y) OVER w AS BIGINT) AS cu
            FROM y
            WINDOW w AS (PARTITION BY event_type ORDER BY day
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
          SELECT event_type, day, n, y,
            cu - LEAST(CAST(MIN(cu) OVER w AS BIGINT), 0) AS cusum,
            (cu - LEAST(CAST(MIN(cu) OVER w AS BIGINT), 0))
              > $CusumThresholdU AS alarm
          FROM c
          WINDOW w AS (PARTITION BY event_type ORDER BY day
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)""",

    // Rolling-uniques twin: the same lead()-derived disjoint cover
    // intervals, exploded via range() (end-exclusive, hence e − day + 1).
    "q216_rolling_uniques" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS day
           FROM events),
         mx AS (SELECT MAX(day) AS maxd FROM act),
         iv AS (
           SELECT user_id, day,
             LEAST(COALESCE(LEAD(day) OVER (PARTITION BY user_id
                 ORDER BY day) - 1, 9223372036854775807),
               day + 6, maxd) AS e
           FROM act CROSS JOIN mx),
         cov AS (
           SELECT user_id, day + i AS day
           FROM iv, UNNEST(range(0, e - day + 1)) AS r(i))
         SELECT day, CAST(COUNT(1) AS BIGINT) AS rolling_users
         FROM cov GROUP BY day""",

    // Compaction twin: same manifest build, same largest-first total order,
    // same cum-before // target binning.
    "q219_compaction_plan" ->
      s"""WITH files AS (
           SELECT source, doc_id // 4 AS file_id,
             CAST(SUM(n_chars) AS BIGINT) AS bytes
           FROM documents GROUP BY 1, 2),
         cum AS (
           SELECT source, file_id, bytes,
             CAST(COALESCE(SUM(bytes) OVER (PARTITION BY source
               ORDER BY bytes DESC, file_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cumb
           FROM files)
         SELECT source, cumb // $CompactTargetBytes AS bin_id,
           CAST(COUNT(1) AS BIGINT) AS n_files,
           CAST(SUM(bytes) AS BIGINT) AS bin_bytes,
           MIN(file_id) AS min_file, MAX(file_id) AS max_file
         FROM cum GROUP BY 1, 2""",

    "q194_benford_audit" -> {
      // e-notation forces DuckDB to parse each literal as DOUBLE directly;
      // a bare decimal literal becomes DECIMAL first and loses a ulp.
      val ps = (1 to 9).map(dd => s"${math.log10(1.0 + 1.0 / dd)}e0")
        .mkString("[", ", ", "]")
      s"""WITH digits AS (
            SELECT CAST(substr(CAST(
                CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                AS VARCHAR), 1, 1) AS INT) AS digit,
              COUNT(1) AS n
            FROM lineitem
            GROUP BY 1),
          tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM digits)
          SELECT digit, CAST(n AS BIGINT) AS n,
            CAST(n AS DOUBLE) / total AS observed,
            ($ps)[digit] AS benford_p,
            CAST(n AS DOUBLE) / total - ($ps)[digit] AS deviation
          FROM digits, tot"""
    },

    "q193_cuped" ->
      """WITH ev AS (
           SELECT user_id, ts,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events WHERE event_type = 'purchase'),
         cut AS (
           SELECT CAST(MAX(ts) AS DATE) - INTERVAL 15 DAY AS cut_day
           FROM ev),
         per_user AS (
           SELECT user_id % 2 = 0 AS arm_a,
             CAST(SUM(CASE WHEN ts < CAST(cut_day AS TIMESTAMP)
                           THEN c ELSE 0 END) AS HUGEINT) AS x,
             CAST(SUM(CASE WHEN ts >= CAST(cut_day AS TIMESTAMP)
                           THEN c ELSE 0 END) AS HUGEINT) AS y
           FROM ev, cut GROUP BY user_id),
         arms AS (
           SELECT arm_a, CAST(COUNT(1) AS HUGEINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * x) AS sxx, SUM(x * y) AS sxy, SUM(y * y) AS syy
           FROM per_user GROUP BY arm_a),
         g AS (
           SELECT SUM(n) AS gn, SUM(sx) AS gsx, SUM(sy) AS gsy,
             SUM(sxx) AS gsxx, SUM(sxy) AS gsxy
           FROM arms),
         alg AS (
           SELECT arm_a, n, sx, sy, sxx, sxy, syy,
             CAST(gn * gsxy - gsx * gsy AS DOUBLE)
               / CAST(gn * gsxx - gsx * gsx AS DOUBLE) AS theta,
             CAST(gsx AS DOUBLE) / CAST(gn AS DOUBLE) AS gxbar
           FROM arms, g)
         SELECT arm_a, CAST(n AS BIGINT) AS n_users,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS mean_y,
           CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
             - theta * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) - gxbar)
             AS mean_cuped,
           (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1) AS var_y,
           (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
              / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1)
             - 2.0 * theta * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1))
             + theta * theta * ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1)) AS var_cuped,
           1.0 - ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                 * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1)
               - 2.0 * theta * ((CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1))
               + theta * theta * ((CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)
                 * CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1)))
             / ((CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
                 * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                 / (CAST(n AS DOUBLE) - 1)) AS var_reduction
         FROM alg""",

    "q188_decayed_counts" ->
      """WITH ev AS (
           SELECT event_type,
             CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS c
           FROM events),
         mx AS (SELECT MAX(day) AS max_day FROM ev),
         w AS (
           SELECT event_type, c,
             CASE WHEN date_diff('day', day, max_day) <= 30
                  THEN CAST(1 AS BIGINT)
                       << CAST(30 - date_diff('day', day, max_day) AS INT)
                  ELSE 0 END AS wgt
           FROM ev, mx)
         SELECT event_type, COUNT(1) AS n_events,
           CAST(CAST(SUM(CAST(wgt AS HUGEINT)) AS DOUBLE)
             / 1073741824 AS DOUBLE) AS decayed_count,
           CAST(CAST(SUM(CAST(wgt AS HUGEINT) * c) AS DOUBLE)
             / 1073741824 AS DOUBLE) AS decayed_cents
         FROM w GROUP BY event_type""",

    // Native percentile_cont is the independent check on the rank-walk +
    // dyadic interpolation path.
    "q186_percentile_cont" ->
      """SELECT l_returnflag, COUNT(1) AS n_rows,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY c) AS p25,
           percentile_cont(0.5)  WITHIN GROUP (ORDER BY c) AS p50,
           percentile_cont(0.75) WITHIN GROUP (ORDER BY c) AS p75
         FROM (SELECT l_returnflag,
                 CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
                   AS c
               FROM lineitem)
         GROUP BY l_returnflag""",

    "q179_pivot_matrix" ->
      """SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_click,
           CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_error,
           CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_purchase,
           CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_signup,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_view
         FROM events GROUP BY 1""",

    "q180_unpivot_profile" ->
      """WITH cents AS (
           SELECT
             CAST(CAST(l_quantity AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS m_l_quantity,
             CAST(CAST(l_extendedprice AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS m_l_extendedprice,
             CAST(CAST(l_discount AS DECIMAL(18,2)) * 100 AS BIGINT)
               AS m_l_discount,
             CAST(CAST(l_tax AS DECIMAL(18,2)) * 100 AS BIGINT) AS m_l_tax
           FROM lineitem),
         longf AS (
           SELECT 'm_l_quantity' AS measure, m_l_quantity AS cents FROM cents
           UNION ALL
           SELECT 'm_l_extendedprice', m_l_extendedprice FROM cents
           UNION ALL
           SELECT 'm_l_discount', m_l_discount FROM cents
           UNION ALL
           SELECT 'm_l_tax', m_l_tax FROM cents)
         SELECT measure, COUNT(1) AS n,
           CAST(SUM(cents) AS BIGINT) AS sum_cents,
           MIN(cents) AS min_cents, MAX(cents) AS max_cents
         FROM longf GROUP BY measure""",

    "q181_peak_concurrency" ->
      s"""WITH $oSessionIslands,
         sess AS (
           SELECT MIN(ts) AS s_start,
             MAX(ts) + INTERVAL $SessionGapHours HOUR AS s_end
           FROM s GROUP BY user_id, sid),
         deltas AS (
           SELECT CAST(date_trunc('day', s_start) AS TIMESTAMP) AS day,
                  s_start AS ts, 1 AS delta FROM sess
           UNION ALL
           SELECT CAST(date_trunc('day', s_end - INTERVAL 1 MICROSECOND)
                    AS TIMESTAMP) AS day,
                  s_end AS ts, -1 AS delta FROM sess),
         prefix AS (
           SELECT day, MAX(run) AS max_prefix FROM (
             SELECT day,
               SUM(delta) OVER (PARTITION BY day ORDER BY ts, delta
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
             FROM deltas) GROUP BY day),
         carry AS (
           SELECT day, COUNT(1) AS carry_in FROM (
             SELECT unnest(generate_series(
                 CAST(date_trunc('day', s_start) AS TIMESTAMP),
                 CAST(date_trunc('day', s_end - INTERVAL 1 MICROSECOND)
                   AS TIMESTAMP),
                 INTERVAL 1 DAY)) AS day, s_start
             FROM sess)
           WHERE day > s_start GROUP BY day)
         SELECT COALESCE(p.day, c.day) AS day,
           COALESCE(c.carry_in, 0) AS carry_in,
           CAST(COALESCE(c.carry_in, 0) +
             GREATEST(0, COALESCE(p.max_prefix, 0)) AS BIGINT)
             AS peak_sessions
         FROM prefix p FULL OUTER JOIN carry c ON p.day = c.day""",

    "q182_cohens_kappa" ->
      """WITH cells AS (
           SELECT COUNT(1) AS n,
             CAST(SUM(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
               AS n11,
             CAST(SUM(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT)
               AS n10,
             CAST(SUM(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
               AS n01
           FROM (SELECT n_chars >= 500 AS ra,
                   len(string_split(text, ' ')) >= 80 AS rb
                 FROM documents)),
         full_c AS (
           SELECT n, n11, n10, n01, n - n11 - n10 - n01 AS n00 FROM cells),
         alg AS (
           SELECT n, n11, n10, n01, n00,
             CAST(n11 + n10 AS HUGEINT) * (n11 + n01) +
               CAST(n01 + n00 AS HUGEINT) * (n10 + n00) AS pe_n2,
             CAST(n11 + n00 AS HUGEINT) * n AS po_n2
           FROM full_c)
         SELECT n, n11, n10, n01, n00,
           CASE WHEN CAST(n AS HUGEINT) * n = pe_n2 THEN NULL
                ELSE CAST(po_n2 - pe_n2 AS DOUBLE) /
                     CAST(CAST(n AS HUGEINT) * n - pe_n2 AS DOUBLE)
           END AS kappa
         FROM alg"""
  )

  /** Full oracle map: the base entries plus q195, whose oracle re-derives
    * both per-row code columns (the same CTE fragments as q125/q189's
    * oracles) and buckets them at the odd 512-cell granularity. */
  val oracles: Map[String, String] = {
    val binned =
      """bounds AS (
           SELECT MIN(l_orderkey) AS amin, MAX(l_orderkey) AS amax,
                  MIN(l_partkey) AS bmin, MAX(l_partkey) AS bmax
           FROM lineitem),
         b AS (
           SELECT
             CAST(least(1023, ((CAST(l_orderkey AS HUGEINT) - amin) * 1024)
                              // (amax - amin + 1)) AS BIGINT) AS xa,
             CAST(least(1023, ((CAST(l_partkey AS HUGEINT) - bmin) * 1024)
                              // (bmax - bmin + 1)) AS BIGINT) AS xb
           FROM lineitem CROSS JOIN bounds)"""
    val zc =
      """zc AS (
           SELECT xa, xb,
             CAST(list_sum(list_transform(range(0, 10), k ->
               (((xa >> k) & 1) << (2 * k))
               + (((xb >> k) & 1) << (2 * k + 1)))) AS BIGINT) AS code
           FROM b)"""
    def lvl(i: Int, k: Int): String = {
      val prev = if (i == 0) "h_in" else s"h${i - 1}"
      val ss = (1L << k) * (1L << k)
      s"""h$i AS (
            SELECT xa, xb,
              CASE WHEN ry = 0 THEN
                     CASE WHEN rx = 1 THEN 1023 - hy ELSE hy END
                   ELSE hx END AS hx,
              CASE WHEN ry = 0 THEN
                     CASE WHEN rx = 1 THEN 1023 - hx ELSE hx END
                   ELSE hy END AS hy,
              hd + $ss * xor(rx * 3, ry) AS hd
            FROM (SELECT *, (hx >> $k) & 1 AS rx, (hy >> $k) & 1 AS ry
                  FROM $prev))"""
    }
    val hilbert = ("""h_in AS (
           SELECT xa, xb, xa AS hx, xb AS hy, CAST(0 AS BIGINT) AS hd
           FROM b)""" +:
      (9 to 0 by -1).zipWithIndex.map { case (k, i) => lvl(i, k) })
      .mkString(",\n")
    oraclesBase +
      // identical rows to q189: the clustered write is row-preserving, so
      // the read-back bucket audit has the same oracle
      ("q175_hilbert_clustered" -> oraclesBase("q189_hilbert_layout")) +
      ("q195_layout_quality" ->
        s"""WITH $binned,
            $zc,
            $hilbert,
            zb AS (
              SELECT code >> 9 AS bucket, COUNT(1) AS n,
                (MAX(xa) - MIN(xa)) + (MAX(xb) - MIN(xb)) AS sp
              FROM zc GROUP BY 1),
            hb AS (
              SELECT hd >> 9 AS bucket, COUNT(1) AS n,
                (MAX(xa) - MIN(xa)) + (MAX(xb) - MIN(xb)) AS sp
              FROM h9 GROUP BY 1)
            SELECT 'zorder' AS layout, COUNT(1) AS n_buckets,
              CAST(SUM(n) AS BIGINT) AS total_rows,
              CAST(SUM(n * sp) AS DOUBLE) / SUM(n) AS avg_semiperimeter
            FROM zb
            UNION ALL
            SELECT 'hilbert', COUNT(1), CAST(SUM(n) AS BIGINT),
              CAST(SUM(n * sp) AS DOUBLE) / SUM(n)
            FROM hb""")
  }
}
