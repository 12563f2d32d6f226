package graft.operators

import graft.Pinned._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import TextFns._

/** Corpus-curation operators a production training-data pipeline runs after
  * dedup/quality filtering: PII redaction, benchmark decontamination,
  * per-stratum deterministic sampling, inverted-index construction, and
  * Unicode canonicalization.
  *
  * Scale stances (100 TB):
  *  - PII redaction and NFC normalization are narrow per-row projections —
  *    zero shuffles, whole-stage codegen end to end.
  *  - Decontamination exploits the real-world asymmetry: the benchmark
  *    n-gram set is tiny (benchmark suites are MBs) while the corpus is the
  *    100 TB side, so the benchmark grams are broadcast and the corpus
  *    never shuffles.
  *  - Stratified sampling and posting lists use bounded partial
  *    aggregation ([[MinKByHash]]/[[MinKLongs]]): per-group state is capped
  *    at k on the map side, so group size never dictates shuffle volume —
  *    the failure mode of row_number-per-stratum and collect_list-per-term.
  */
object Curation {

  private def t(s: SparkSession, d: String) = Tables.load(s, d, "documents")

  /** q166 phrase: two common corpus words so every SF has matches. ONE
    * definition feeds both the Spark postings filter and the oracle SQL. */
  val PhraseW1 = "data"
  val PhraseW2 = "fast"

  /** Redaction patterns, identical syntax in Java regex and DuckDB's RE2:
    * character classes, bounded repetition, the (?i) flag, and ASCII \b
    * word boundaries behave the same in both. */
  val EmailRegex = """(?i)[a-z0-9._%+-]+@[a-z0-9.-]+\.[a-z]{2,}"""
  val Ipv4Regex = """\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"""

  /** The testdata corpus is clean word-salad, so PII is synthesized
    * deterministically from (doc_id, source) — identically in the oracle —
    * to give the redaction path real matches to find. ~1/3 of docs get an
    * email, ~1/2 an IPv4. */
  private val piiText = concat(
    when(col("doc_id") % 3 === 0,
      concat(lit("contact u"), col("doc_id").cast("string"), lit("@"),
        col("source"), lit(".example.com "))).otherwise(lit("")),
    when(col("doc_id") % 2 === 0,
      concat(lit("from 10."), (col("doc_id") % 256).cast("string"), lit(".0."),
        ((col("doc_id") * 7) % 256).cast("string"), lit(" "))).otherwise(lit("")),
    col("text"))

  /** Decontamination shingle width: wide enough that chance overlap on the
    * synthetic vocabulary is rare, narrow enough to catch near-duplicates
    * (real pipelines use 8-13 word grams against eval benchmarks). */
  val DecontamN = 4

  /** Benchmark slice stand-in: one source plays the eval suite. */
  val BenchSource = "src0"

  /** Raw prefix for q64: combining-mark sequences (e + U+0301, n + U+0303)
    * that NFC folds to precomposed é / ñ — 2 codepoints in, 1 out. */
  val NonNfcPrefix = "café niño: "

  /** Redacted form of a text column: emails then IPv4s struck. */
  def redact(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    regexp_replace(regexp_replace(c, EmailRegex, "<EMAIL>"), Ipv4Regex, "<IP>")

  /** PII scan over a (doc_id, <textCol>) frame: match counts + redacted
    * fingerprint. Narrow — one codegen'd pass, zero shuffles. */
  def piiScan(docs: DataFrame, textCol: org.apache.spark.sql.Column): DataFrame = {
    val red = redact(textCol)
    docs.select(
      col("doc_id"),
      regexp_count(textCol, lit(EmailRegex)).cast("long").as("n_email"),
      regexp_count(textCol, lit(Ipv4Regex)).cast("long").as("n_ip"),
      md5(red).as("red_fp"),
      substring(red, 1, 24).as("red_head"))
  }

  /** Benchmark decontamination over a (doc_id, source, text) frame: flags
    * corpus docs (source != benchSource) sharing any n-gram with the
    * benchmark slice. The corpus side stays put: distinct per-doc grams are
    * generated narrowly, the benchmark gram set (small by nature — eval
    * suites are MBs) is broadcast, and hit counts come from one hash
    * aggregation keyed by doc_id. */
  def decontaminate(docs: DataFrame, benchSource: String, n: Int): DataFrame = {
    val grams = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(shingles(toks(col("text")), n))).as("gram"))
    val benchGrams = grams.filter(col("source") === benchSource)
      .select(col("gram")).distinct()
    val hits = grams.filter(col("source") =!= benchSource)
      .join(broadcast(benchGrams), "gram")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("hits"))
    docs.filter(col("source") =!= benchSource)
      .select(col("doc_id"), col("source"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("hits"), lit(0L)).as("n_contam_grams"),
        (coalesce(col("hits"), lit(0L)) > 0).as("contaminated"))
  }

  /** Positional contamination profile — the GPT-3-appendix-C view of
    * [[decontaminate]]: instead of a boolean "shares any benchmark n-gram",
    * report per doc HOW MUCH overlaps (hit fraction over positional grams)
    * and HOW CONTIGUOUSLY (longest run of consecutive contaminated gram
    * positions — a run of r grams is an r+n-1-token verbatim benchmark
    * span). The dirty rule is the production shape: high overlap mass
    * (8·hits > grams, i.e. >12.5%) OR any long verbatim span (run >= 5).
    *
    * Scale shape (100 TB): grams shrink to md5 digests before they ever
    * leave the scan; the benchmark digest set is broadcast (eval suites are
    * MBs); the only shuffle is keyed by doc_id (one window + two hash aggs
    * over the same key, so AQE reuses the exchange). All ratios are exact
    * int/int rationals; the run arithmetic is the gaps-and-islands
    * row_number trick, invariant to the 0- vs 1-based position origin.
    */
  def contaminationSpans(docs: DataFrame, benchSource: String, n: Int): DataFrame = {
    val sh = shingles(toks(col("text")), n)
    val positional = docs.filter(col("source") =!= benchSource)
      .select(col("doc_id"), posexplode(sh).as(Seq("pos", "gram")))
      .select(col("doc_id"), col("pos"), md5(col("gram")).as("g"))
    val benchGrams = docs.filter(col("source") === benchSource)
      .select(explode(array_distinct(sh)).as("gram"))
      .select(md5(col("gram")).as("g")).distinct()
      .withColumn("hit", lit(true))
    val flagged = positional.join(broadcast(benchGrams), Seq("g"), "left")
      .select(col("doc_id"), col("pos"),
        coalesce(col("hit"), lit(false)).as("hit"))
    val agg = flagged.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("hit"), 1L).otherwise(0L)).as("n_hits"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val longest = flagged.filter(col("hit"))
      .withColumn("grp", col("pos") - row_number().over(w))
      .groupBy(col("doc_id"), col("grp")).agg(count(lit(1)).as("run"))
      .groupBy(col("doc_id")).agg(max(col("run")).as("longest_run"))
    docs.filter(col("source") =!= benchSource)
      .select(col("doc_id"), col("source"))
      .join(agg, Seq("doc_id"), "left")
      .join(longest, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        when(coalesce(col("n_grams"), lit(0L)) > 0,
          coalesce(col("n_hits"), lit(0L)).cast("double") / col("n_grams"))
          .otherwise(lit(0.0)).as("hit_frac"),
        coalesce(col("longest_run"), lit(0L)).as("longest_run"),
        (coalesce(col("n_hits"), lit(0L)) * 8 > coalesce(col("n_grams"), lit(0L)) ||
          coalesce(col("longest_run"), lit(0L)) >= 5).as("dirty"))
  }

  /** Bloom-filter decontamination — the 100 TB shape of [[decontaminate]]:
    * instead of broadcasting the benchmark GRAM SET (which grows with the
    * eval suite), broadcast a FIXED-SIZE Bloom filter of it
    * ([[Sketches.BloomAggregate]], BloomWords int64 words regardless of
    * benchmark size) and probe each corpus gram's K bits narrowly. No
    * false negatives — every truly contaminated doc is flagged — and false
    * positives at the dialed rate over-flag only (the safe direction for
    * decontamination). The probe is pure codegen (`bit_get` over the
    * broadcast words); the corpus never shuffles. Oracle-exact: DuckDB
    * rebuilds the identical bit set, so hits (FPs included) match
    * hash-for-hash. */
  def bloomDecontaminate(docs: DataFrame, benchSource: String, n: Int): DataFrame = {
    val grams = docs.select(col("doc_id"), col("source"),
      explode(array_distinct(shingles(toks(col("text")), n))).as("gram"))
    val bloom = grams.filter(col("source") === benchSource)
      .agg(udaf(Sketches.BloomAggregate, org.apache.spark.sql.Encoders.STRING)(
        col("gram")).as("words"))
    val pos = array((0 until Sketches.BloomHashes)
      .map(r => Sketches.bloomPos(col("gram"), lit(r))): _*)
    val hits = grams.filter(col("source") =!= benchSource)
      .join(broadcast(bloom))
      .select(col("doc_id"),
        forall(pos, p => call_function("bit_get",
          element_at(col("words"), (p / 64).cast("int") + 1),
          (p % 64).cast("int")) === 1).as("hit"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("hit").cast("long")).as("n_bloom_hits"))
    docs.filter(col("source") =!= benchSource)
      .select(col("doc_id"), col("source"))
      .join(hits, Seq("doc_id"), "left")
      .select(col("doc_id"), col("source"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_bloom_hits"), lit(0L)).as("n_bloom_hits"),
        (coalesce(col("n_bloom_hits"), lit(0L)) > 0).as("bloom_contaminated"))
  }

  /** Frozen-Bloom decontamination scan — the PRODUCTION deployment shape of
    * [[bloomDecontaminate]]: the benchmark Bloom filter is trained once in
    * batch (the `BloomAggregate` fold), then frozen into this transform as
    * 64 literal int64 words and applied as a PURE NARROW projection — no
    * join, no aggregation, no state. That makes it mode-agnostic like
    * [[piiScan]]: the same Column expressions score a batch DataFrame or a
    * readStream micro-batch bit-identically, which is exactly how streaming
    * ingest decontaminates against a suite frozen at train-cutoff time.
    * Per-doc output matches [[bloomDecontaminate]] row for row (same
    * hashes, same bits, FPs included).
    *
    * Scale shape (100 TB): the filter rides in the plan (fixed size — the
    * real deployment dials BloomBits, it stays KBs-to-MBs and shuffles
    * nothing); per-doc cost is grams × BloomHashes md5s, embarrassingly
    * parallel, zero exchanges. */
  def bloomScan(docs: DataFrame, bloomWords: Array[Long], n: Int): DataFrame = {
    val words = array(bloomWords.toIndexedSeq.map(lit): _*)
    val grams = array_distinct(shingles(toks(col("text")), n))
    val hit = (g: org.apache.spark.sql.Column) => {
      val pos = array((0 until Sketches.BloomHashes)
        .map(r => Sketches.bloomPos(g, lit(r))): _*)
      forall(pos, p => call_function("bit_get",
        element_at(words, (p / 64).cast("int") + 1),
        (p % 64).cast("int")) === 1)
    }
    docs.select(col("doc_id"), col("source"),
      size(grams).cast("long").as("n_grams"),
      size(filter(grams, hit)).cast("long").as("n_bloom_hits"),
      (size(filter(grams, hit)) > 0).as("bloom_contaminated"))
  }

  /** The frozen words for [[bloomScan]]: the benchmark slice's distinct
    * n-grams folded through the same `BloomAggregate` the q71 query uses.
    * Store-backed ([[graft.ModelStore]]): the deployment story for this
    * variant is precisely "train the suite filter once at train-cutoff
    * time, serve it for every later ingest", so the words persist
    * content-addressed on (benchmark-slice digest, n, filter geometry)
    * and a new session reloads the identical bits instead of re-folding
    * the slice. The fold is order-independent (bitwise OR), so retrain
    * and reload agree exactly (ModelStoreSpec pins the INT64 transport). */
  def trainBloom(docs: DataFrame, benchSource: String, n: Int): Array[Long] = {
    val slice = docs.filter(col("source") === benchSource)
    graft.ModelStore.rowsToLongs(
      graft.ModelStore.getOrTrain(docs.sparkSession, "bloom_words",
        graft.ModelStore.digestOf(slice, Seq("doc_id", "text")),
        s"n=$n,bits=${Sketches.BloomBits},hashes=${Sketches.BloomHashes}")(
        graft.ModelStore.longsToRows(
          slice
            .select(explode(array_distinct(shingles(toks(col("text")), n))).as("gram"))
            .agg(udaf(Sketches.BloomAggregate, org.apache.spark.sql.Encoders.STRING)(
              col("gram")).as("words"))
            .collect()(0).getSeq[Long](0).toArray)))
  }

  /** Deterministic k-per-stratum sample of a (<strata>, doc_id) frame.
    * Sample identity is a pure function of doc_id (md5 order): reproducible
    * across runs, engines, and partitionings, and stable under corpus
    * growth. Bounded partial aggregation ([[MinKByHash]]) caps any
    * stratum's map-side state at k slots. */
  def stratifiedSample(docs: DataFrame, strata: String, k: Int): DataFrame = {
    val mink = udaf(new MinKByHash(k))
    docs
      .select(col(strata), md5(col("doc_id").cast("string")).as("h"),
        col("doc_id"))
      .groupBy(col(strata))
      .agg(mink(col("h"), col("doc_id")).as("sample"))
      .select(col(strata), posexplode(col("sample")).as(Seq("pos", "r")))
      .select(col(strata), (col("pos") + 1).cast("long").as("rank"),
        col("r.id").as("doc_id"), col("r.h").as("h"))
  }

  /** Inverted index over a (doc_id, text) frame: exact document frequency
    * (terms pre-deduped per doc) + a posting list capped at k ids, so a
    * stopword-grade term costs k slots, not a single row holding every
    * doc_id in the corpus. Postings are emitted as a canonical CSV string
    * (the oracle gate hashes scalar cells). At scale the output would be
    * range-partitioned by term; here one hash aggregation suffices. */
  def invertedIndex(docs: DataFrame, k: Int): DataFrame = {
    val mink = udaf(new MinKLongs(k))
    docs
      .select(col("doc_id"), explode(array_distinct(toks(col("text")))).as("term"))
      .groupBy(col("term"))
      .agg(count(lit(1)).as("df"), mink(col("doc_id")).as("mk"))
      .select(col("term"), col("df"),
        concat_ws(",", transform(col("mk"), x => x.cast("string"))).as("postings"))
  }

  /** Chunk width / stride (tokens) for [[chunkDocs]]. Overlap = 8 tokens. */
  val ChunkLen = 32
  val ChunkStride = 24

  /** Overlapping token-window chunking — the retrieval/embedding-prep twin
    * of [[packSequences]] (which packs docs end-to-end; this splits each doc
    * in place). Chunk starts are 1, 1+stride, 1+2·stride, … up to
    * n − (len − stride), so every token lands in ≥1 chunk, interior chunks
    * are full-width, and only the final chunk may run short. Per-row
    * `sequence`+`explode` — a narrow projection whose output is bounded by
    * n_tok/stride rows per doc, no shuffle at all; at 100 TB this runs
    * entirely inside the scan stage. The chunk fingerprint (md5 of the
    * joined window) is what a downstream chunk-level dedup or embedding
    * cache would key on. */
  def chunkDocs(docs: DataFrame, chunkLen: Int, stride: Int): DataFrame = {
    require(stride >= 1 && chunkLen >= stride,
      s"need 1 <= stride <= chunkLen, got len=$chunkLen stride=$stride")
    docs
      .select(col("doc_id"), toks(col("text")).as("tk"))
      .withColumn("n", size(col("tk")))
      .select(col("doc_id"), col("tk"), col("n"),
        explode(sequence(lit(1),
          greatest(lit(1), col("n") - lit(chunkLen - stride)),
          lit(stride))).as("s"))
      .select(col("doc_id"),
        col("s").cast("long").as("chunk_start"),
        least(lit(chunkLen), col("n") - col("s") + 1).cast("long").as("chunk_len"),
        md5(concat_ws(" ", slice(col("tk"), col("s"), lit(chunkLen)))).as("chunk_md5"))
  }

  /** Total sample budget for [[temperatureMix]] (q147). */
  val TempMixK = 100

  /** Temperature-scaled mixture sampling (q147) — the multilingual-corpus
    * rebalancing move (mT5/XLM-R style): per-source sampling mass
    * ∝ tokens^(1/T) flattens the head and boosts the tail. T = 2 on
    * purpose: the exponent becomes sqrt, the ONE libm function that is
    * IEEE-correctly-rounded everywhere (a fractional pow would not be
    * bit-portable across engines — the q84 lesson), and the weight is
    * floored to int64 immediately so quota arithmetic is EXACT integer:
    * quota_s = round-half-up(K · w_s / W) = (2·K·w_s + W) div (2·W).
    * Rounded-proportional (not largest-remainder) by design — it needs no
    * cross-source ranking, so allocation stays a per-row projection off
    * one broadcast 1-row total; |Σquota − K| ≤ #sources/2, spec-bounded.
    * Selection inside a source is the q58 md5-prefix order, capped by
    * [[MinKByHash]] bounded partials — at 100 TB the corpus aggregates
    * once per source (map-side K-slot state), the quota table is
    * #sources-sized and broadcast, and nothing corpus-scale sorts. */
  def temperatureMix(docs: DataFrame, k: Int): DataFrame = {
    val perSource = docs
      .select(col("source"), size(toks(col("text"))).cast("long").as("n_tok"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
      .withColumn("w", floor(sqrt(col("sum_tok").cast("double"))).cast("long"))
    val tot = perSource.agg(sum(col("w")).as("tot_w"))
    val quotas = perSource.join(broadcast(tot))
      .select(col("source"), col("sum_tok"), col("w"),
        expr(s"(2 * $k * w + tot_w) div (2 * tot_w)").as("quota"))
    val mink = udaf(new MinKByHash(k))
    docs
      .select(col("source"), md5(col("doc_id").cast("string")).as("h"),
        col("doc_id"))
      .groupBy(col("source"))
      .agg(mink(col("h"), col("doc_id")).as("sample"))
      .join(broadcast(quotas), Seq("source"))
      .select(col("source"), col("sum_tok"), col("w"), col("quota"),
        posexplode(col("sample")).as(Seq("pos", "r")))
      .select(col("source"), col("sum_tok"), col("w"), col("quota"),
        (col("pos") + 1).cast("long").as("rank"), col("r.id").as("doc_id"))
      .filter(col("rank") <= col("quota"))
  }

  /** Deterministic WEIGHTED sample, k per stratum — the biased counterpart
    * of [[stratifiedSample]] for mixtures that should favor long documents
    * (e.g. sampling held-out eval docs proportional to length). The
    * Efraimidis–Spirakis exponential-race is replaced by its integer
    * surrogate: priority = hash(doc_id) div weight, smallest k win — a doc
    * with twice the weight halves its expected priority, selection is a
    * pure function of (doc_id, weight) (reproducible across runs, engines,
    * partitionings), and every comparison is exact int64 (no libm pow/ln,
    * which are not bit-portable across engines). Same bounded-partial
    * shape as [[stratifiedSample]]: [[MinKWeighted]] caps any stratum's
    * map-side state at k slots. */
  def weightedSample(docs: DataFrame, strata: String, weight: String, k: Int): DataFrame = {
    val mink = udaf(new MinKWeighted(k))
    docs
      .select(col(strata), col("doc_id"),
        expr(s"cast(conv(substring(md5(cast(doc_id as string)), 1, 15), 16, 10) as bigint)" +
          s" div greatest($weight, 1)").as("pri"))
      .groupBy(col(strata))
      .agg(mink(col("pri"), col("doc_id")).as("sample"))
      .select(col(strata), posexplode(col("sample")).as(Seq("pos", "r")))
      .select(col(strata), (col("pos") + 1).cast("long").as("rank"),
        col("r.id").as("doc_id"), col("r.pri").as("pri"))
  }

  /** Sample size per source for the q187 priority-sampling audit. */
  val PrioritySampleK = 16

  /** Duffield–Lund–Thorup priority sampling (q187): the weighted sampling
    * scheme with a PROVABLY near-optimal subset-sum estimator. Per doc,
    * priority q = w·2^60/u with u the md5-derived uniform; the k largest
    * priorities per source are the sample, τ = the (k+1)-th priority, and
    * the estimator Σ max(w_i, τ) over the sample is unbiased for the
    * stratum's total weight. Determinism: u is a pure function of doc_id;
    * priorities are single IEEE divisions (bit-identical across engines);
    * and the estimate is rearranged to Σ_{w≥τ} w (exact integer) +
    * count·τ (ONE float product + ONE add) so no float SUM order exists
    * to disagree on. Scale: [[MaxKPriority]] bounds any stratum's
    * map-side state at k+1 slots — no per-source sort, no window. */
  def prioritySample(docs: DataFrame, k: Int): DataFrame = {
    val maxk = udaf(new MaxKPriority(k + 1))
    val base = docs.select(col("source"), col("doc_id"),
      greatest(col("n_chars"), lit(1L)).as("w"),
      (expr("cast(conv(substring(md5(concat('ps|', cast(doc_id as string))), 1, 15), 16, 10) as bigint)")
        + 1).as("u"))
    val withPri = base.withColumn("pri",
      col("w").cast("double") * lit(1152921504606846976L).cast("double") /
        col("u"))
    withPri.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("w")).as("total_w"),
        maxk(col("pri"), col("doc_id"), col("w")).as("cand"))
      .select(col("source"), col("n_docs"), col("total_w"),
        when(size(col("cand")) === k + 1,
          element_at(col("cand"), k + 1).getField("pri")).as("tau"),
        explode(slice(col("cand"), lit(1), least(size(col("cand")), lit(k))))
          .as("x"))
      .groupBy(col("source"), col("n_docs"), col("total_w"), col("tau"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(when(col("tau").isNull ||
            col("x.w").cast("double") >= col("tau"), col("x.w"))
          .otherwise(0L)).as("big_w"),
        sum(when(col("tau").isNotNull &&
            col("x.w").cast("double") < col("tau"), 1L)
          .otherwise(0L)).as("n_small"))
      .select(col("source"), col("n_docs"), col("total_w"), col("n_sampled"),
        (col("big_w").cast("double") +
          when(col("tau").isNull, lit(0.0))
            .otherwise(col("n_small").cast("double") * col("tau")))
          .as("est_total_w"))
  }

  /** Per-source sample size for the q200 pipeline's final stage. */
  val PipelineV2K = 8

  /** The SAMPLED-DOCS face of Duffield priority sampling (q187 emits the
    * estimator face): k largest-priority docs per source under an
    * arbitrary weight column, same md5-derived priorities, same bounded
    * [[MaxKPriority]] map-side state. */
  def prioritySampleDocs(docs: DataFrame, weightCol: String, k: Int): DataFrame = {
    val maxk = udaf(new MaxKPriority(k))
    docs.select(col("source"), col("doc_id"),
        greatest(col(weightCol), lit(1L)).as("w"),
        (expr("cast(conv(substring(md5(concat('ps|', cast(doc_id as string))), 1, 15), 16, 10) as bigint)")
          + 1).as("u"))
      .withColumn("pri",
        col("w").cast("double") * lit(1152921504606846976L).cast("double") /
          col("u"))
      .groupBy(col("source"))
      .agg(maxk(col("pri"), col("doc_id"), col("w")).as("cand"))
      .select(col("source"), explode(col("cand")).as("x"))
      .select(col("source"), col("x.id").as("doc_id"), col("x.w").as("w"))
  }

  /** Deterministic span-corruption preview (T5-style denoising prep): for
    * every token position, the mask decision is a pure function of
    * (doc_id, position) — first hex char of md5("mask|doc_id|i") < '4', a
    * 25% rate — so the corruption pattern is reproducible across runs,
    * engines, and partitionings (the same property q36 gives the split).
    * Emits the masked positions, not the rewritten text: the boundary list
    * is what a denoising data loader consumes, and keeping it positional
    * makes the operator one narrow zero-shuffle projection (runs in the
    * scan stage at any scale). */
  def spanCorruption(docs: DataFrame): DataFrame = {
    val tk = toks(col("text"))
    val masked = filter(
      sequence(lit(1), size(tk)),
      i => substring(md5(concat_ws("",
        lit("mask|"), col("doc_id").cast("string"), lit("|"),
        i.cast("string"))), 1, 1) < "4")
    docs.select(col("doc_id"),
      size(tk).cast("long").as("n_tok"),
      size(masked).cast("long").as("n_masked"),
      concat_ws(",", transform(masked, x => x.cast("string"))).as("masked_idx"))
  }

  /** Tokens per training sequence for [[packSequences]]. */
  val SeqLen = 2048

  /** Shard count per source for packing windows. Local test value; at scale
    * this is sized so each (source, shard) slice fits one task — the window
    * below partitions on it, so shards bound the sort, not the corpus. */
  val PackShards = 8

  /** Concatenate-and-chunk sequence packing (the standard pretraining
    * layout): docs are laid end-to-end in deterministic (doc_id) order
    * within a (source, shard) slice and cut into SeqLen-token sequences.
    * Each doc is tagged with the sequence its first token falls in and its
    * offset there. The running total is a windowed sum partitioned by
    * (source, shard) — integer-exact, and never a global or single-task
    * sort: shard count scales with the corpus. */
  def packSequences(docs: DataFrame): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("source"), col("shard")).orderBy(col("doc_id"))
    docs
      .select(col("doc_id"), col("source"),
        pmod(col("doc_id"), lit(PackShards)).as("shard"),
        size(toks(col("text"))).cast("long").as("n_tok"))
      .withColumn("tok_end", sum(col("n_tok")).over(w))
      // integer `div`, not fractional `/`: a (source, shard) running total
      // past 2^53 would round in double space and mis-assign boundary docs
      .select(col("doc_id"), col("source"), col("shard"), col("n_tok"),
        expr(s"(tok_end - n_tok) div $SeqLen").as("seq_id"),
        ((col("tok_end") - col("n_tok")) % SeqLen).as("seq_offset"))
  }

  /** End-to-end curation — the composition the individual operators exist
    * for, in the order a production training-data pipeline runs them:
    *
    *   1. exact dedup: keep the min doc_id per content hash (q40's rule);
    *   2. near-dup canonical: LSH pairs + connected components over the
    *      exact-deduped survivors, drop every cluster non-minimum (q42/q46/
    *      q47 machinery);
    *   3. quality filter: [[TextAnalysis.gopherPass]] on the raw text;
    *   4. benchmark decontamination: drop survivors sharing any
    *      [[DecontamN]]-gram with the benchmark slice (taken from the FULL
    *      original corpus — the eval suite is external data and is not
    *      itself curated) plus the benchmark slice itself (q57's rule);
    *   5. split assignment + PII-redacted fingerprint (q36 + q56 rules).
    *
    * Emits one row per surviving doc: (doc_id, source, split, n_tok,
    * red_fp). Scale shape is inherited stage by stage from the operators it
    * composes: hash-agg dedup (digests shuffle, not text), bucketed LSH
    * (never all-pairs), pair-sized CC, narrow quality/redaction passes, and
    * a broadcast benchmark gram set. Oracle-checked end to end as q70.
    *
    * `corpusPairs`: optionally, the near-dup pair list of the FULL corpus
    * (the shared [[Dedup.corpusTrigramPairs]] memo). When present, stage 2
    * does not re-shingle the survivors: a pair's membership in the LSH
    * output depends only on its two endpoints (see the identity note on
    * [[Dedup.corpusTrigramPairs]]), so the survivor pair list is exactly
    * the corpus list filtered to pairs whose BOTH endpoints survived
    * stage 1 — two pair-sized semi joins replace the corpus-scale
    * signature pass, and only the cheap CC re-runs on the filtered edges.
    * (The survivor CC itself still cannot reuse the corpus CC LABELS: a
    * component can fall apart when exact-dup members are removed, so
    * labels are recomputed — but from the shared pairs, which is the
    * expensive part.) CurationSpec pins path equality; at 100 TB this is
    * the difference between one corpus signature scan per pipeline run and
    * one per MATERIALIZATION EPOCH shared with every other near-dup
    * consumer. */
  def curate(docs: DataFrame,
             corpusPairs: Option[DataFrame] = None): DataFrame = {
    // 1. exact dedup — semi join against the per-hash winners. The
    // survivors feed three later stages (LSH pairs, the canonical
    // anti-join, both decontam scans), so they are tokenized ONCE and
    // materialized eagerly (localCheckpoint) rather than re-deriving the
    // md5-groupBy semi-join and the token split per consumer. At 100 TB
    // this is the standard stage boundary: each pipeline stage persists its
    // survivor set (a strict subset of its input) before fan-out.
    val exactKeep = docs
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select(col("doc_id"))
    val dd = TextFns.fanCpu(
      docs.join(exactKeep, Seq("doc_id"), "left_semi"), col("doc_id"))
      .select(col("doc_id"), col("source"), col("text"),
        toks(col("text")).as("tk"))
      .pin(true)
    // 2. near-dup canonical over the deduped survivors. Preferred path:
    // filter the corpus-wide shared pair list to survivor endpoints (two
    // semi joins on pair-sized data — no signature pass). Fallback path
    // (no corpus list supplied): re-shingle the survivors from the
    // checkpointed token arrays. Both produce the identical edge set —
    // spec-pinned — with identical LSH parameters (seedBase 0, trigram
    // shingles) to Dedup's shared stage.
    val pairs = corpusPairs match {
      case Some(cp) =>
        val ids = dd.select(col("doc_id"))
        cp.join(ids.select(col("doc_id").as("i")), Seq("i"), "left_semi")
          .join(ids.select(col("doc_id").as("j")), Seq("j"), "left_semi")
          .select(col("i"), col("j"))
      case None =>
        Dedup.lshPairsFromShingles(
            dd.select(col("doc_id"), shingles(col("tk"), 3).as("sh")),
            numHashes = Dedup.NumHashes, bandSize = Dedup.BandSize, seedBase = 0,
            tNum = Dedup.TrigramTNum, tDen = Dedup.TrigramTDen)
          .select(col("i"), col("j"))
    }
    val losers = Dedup.connectedComponents(pairs)
      .filter(col("doc_id") =!= col("component"))
      .select(col("doc_id"))
    val canon = dd.join(losers, Seq("doc_id"), "left_anti")
    // 3. quality filter — materialized once: the decontam stage scans the
    // qualified survivors twice (gram hits + the keep-side anti-join)
    val qual = canon.filter(TextAnalysis.gopherPass(col("text")))
      .pin(true)
    // qual's eager checkpoint supersedes the stage-1 survivors: every
    // remaining stage reads qual or the raw corpus, so dd's pinned blocks
    // are dead — drop them now rather than waiting for a driver full-GC
    // (repeated pipeline runs otherwise accumulate until CC slows down)
    graft.FrameBlocks.release(dd)
    // 4. decontamination — benchmark grams from the ORIGINAL corpus (the
    // eval suite is external data and is not itself curated)
    val benchGrams = docs.filter(col("source") === BenchSource)
      .select(explode(array_distinct(shingles(toks(col("text")), DecontamN)))
        .as("gram"))
      .distinct()
    val contaminated = qual.filter(col("source") =!= BenchSource)
      .select(col("doc_id"),
        explode(array_distinct(shingles(col("tk"), DecontamN))).as("gram"))
      .join(broadcast(benchGrams), "gram")
      .select(col("doc_id"))
      .distinct()
    val clean = qual.filter(col("source") =!= BenchSource)
      .join(contaminated, Seq("doc_id"), "left_anti")
    // 5. split + redacted fingerprint
    clean.select(
      col("doc_id"), col("source"),
      when(md5(col("doc_id").cast("string")) < "0d", "test")
        .when(md5(col("doc_id").cast("string")) < "1a", "valid")
        .otherwise("train").as("split"),
      size(col("tk")).cast("long").as("n_tok"),
      md5(redact(piiText)).as("red_fp"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- the end-to-end curation pipeline ---------------------------------
    // Hands stage 2 the session-shared corpus pair list so the pipeline's
    // survivor clustering is a pair-sized filter + CC, not a second
    // corpus-scale signature scan (identity + spec: see `curate`).
    "q70_curation_pipeline" -> ((s, d) =>
      curate(t(s, d), Some(Dedup.corpusTrigramPairs(s, d)))),

    // --- PII detection + redaction ----------------------------------------
    // No repartition: the projection is narrow over the scan, so plan
    // parallelism = file splits (the honest zero-shuffle shape at scale).
    "q56_pii_redact" -> ((s, d) => piiScan(t(s, d), piiText)),

    // --- benchmark decontamination (n-gram overlap) -----------------------
    "q57_decontam" -> ((s, d) => decontaminate(t(s, d), BenchSource, DecontamN)),

    // --- Bloom-filter decontamination (fixed-size broadcast) --------------
    "q71_bloom_decontam" -> ((s, d) =>
      bloomDecontaminate(t(s, d), BenchSource, DecontamN)),

    // --- positional contamination spans (overlap mass + longest run) ------
    "q111_contam_spans" -> ((s, d) =>
      contaminationSpans(t(s, d), BenchSource, DecontamN)),

    // --- deterministic stratified sample (k per stratum) ------------------
    "q58_stratified_sample" -> ((s, d) => stratifiedSample(t(s, d), "source", 10)),

    // --- priority sampling + subset-sum estimator audit (q187) -------------
    "q187_priority_sample" -> ((s, d) =>
      prioritySample(t(s, d), PrioritySampleK)),

    // --- curation pipeline v2 (the round-7 tiers composed end-to-end) ------
    // q70's sibling built from this round's operators: (1) ExactSubstr
    // clip accounting over the SHARED window memo — a doc survives iff its
    // first-occurrence-clean mass is >= 32 tokens AND >= half the doc
    // (verbatim-recycled content is dropped, canonical copies stay);
    // (2) the q37 Gopher quality verdict on raw text (the same expression
    // object as q37/q70 — filters cannot drift); (3) per-source Duffield
    // priority sampling weighted by CLEAN token mass, k=8, bounded MaxK
    // map-side state. Every corpus-scale artifact (dup windows, owners) is
    // the memoized index-store frame; the pipeline itself adds only
    // doc-sized joins and a vocabulary of scalars.
    "q200_curation_pipeline_v2" -> ((s, d) => {
      val clip = Dedup.queries("q177_exactsubstr_clip")(s, d)
      val survivors = t(s, d).join(clip, "doc_id")
        .filter(col("kept_tokens") >= 32 &&
          col("kept_tokens") * 2 >= col("n_tok"))
      val qual = survivors.filter(TextAnalysis.gopherPass(col("text")))
      prioritySampleDocs(qual, "kept_tokens", PipelineV2K)
        .select(col("source"), col("doc_id"), col("w").as("kept_tokens"))
    }),

    // --- deterministic weighted sample (length-biased, k per stratum) -----
    "q84_weighted_sample" -> ((s, d) =>
      weightedSample(t(s, d), "source", "n_chars", 5)),

    // --- temperature-scaled mixture sampling ------------------------------
    "q147_temperature_mix" -> ((s, d) => temperatureMix(t(s, d), TempMixK)),

    // --- overlapping token-window chunking --------------------------------
    "q83_chunk_overlap" -> ((s, d) => chunkDocs(t(s, d), ChunkLen, ChunkStride)),

    // --- deterministic span-corruption preview (denoising prep) -----------
    "q102_span_corruption" -> ((s, d) => spanCorruption(t(s, d))),

    // --- inverted index with bounded posting lists ------------------------
    "q59_inverted_index" -> ((s, d) =>
      invertedIndex(TextFns.fanCpu(t(s, d), col("doc_id")), 8)),

    // --- positional phrase search (the q59 index with positions) ----------
    // Exact phrase retrieval ("data fast") the way a real FTS engine runs
    // it: per-term POSITIONAL posting lists, then an equi self-join of the
    // two terms' postings on (doc_id, adjusted position) — position
    // adjacency becomes an equi key by shifting the second term's postings
    // left by one, so the plan is a hash join on (doc_id, pos), never a
    // positions-range inequality. Both posting legs are term-filtered
    // BEFORE the join (the filter pushes into the posexplode projection),
    // so the join input is df(term)-sized, not corpus-sized; a k-term
    // phrase chains k−1 such joins. Output: per-doc occurrence count and
    // first match position (0-based token index).
    "q166_phrase_search" -> ((s, d) => {
      val pos = t(s, d).select(col("doc_id"),
        posexplode(toks(col("text"))).as(Seq("pos", "term")))
      val p1 = pos.filter(col("term") === lit(PhraseW1))
        .select(col("doc_id"), col("pos"))
      val p2 = pos.filter(col("term") === lit(PhraseW2))
        .select(col("doc_id"), (col("pos") - 1).as("pos"))
      p1.join(p2, Seq("doc_id", "pos"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_occ"),
          min(col("pos")).cast("long").as("first_pos"))
    }),

    // --- sequence packing (concatenate-and-chunk) -------------------------
    "q66_sequence_pack" -> ((s, d) => packSequences(t(s, d))),

    // --- mixture weights (per-source token budgeting) ---------------------
    // Data mixing for a target corpus: every source gets an equal token
    // budget (total_budget / n_sources) and a sampling weight
    // min(1, budget/tokens) — under-represented sources keep everything,
    // over-represented ones are downsampled proportionally. One hash agg +
    // a broadcast 1-row frame; all ratios exact-rational so both engines
    // agree bit-for-bit. (Real pipelines plug learned per-domain weights
    // into the same shape.)
    "q67_mixture_weights" -> ((s, d) => {
      val perSource = t(s, d)
        .select(col("source"), size(toks(col("text"))).cast("long").as("n_tok"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("sum_tok"))
      val totals = perSource.agg(
        count(lit(1)).as("n_sources"), sum(col("sum_tok")).as("tot_tok"))
      perSource.join(broadcast(totals))
        .select(col("source"), col("n_docs"), col("sum_tok"),
          (col("tot_tok").cast("double") /
            (col("n_sources") * lit(2))).as("budget_tok"),
          least(lit(1.0), col("tot_tok").cast("double") /
            (col("n_sources") * lit(2)) / col("sum_tok")).as("weight"))
    }),

    // --- Unicode NFC canonicalization (native expression) -----------------
    // Prepends a combining-mark sequence to each doc (the testdata is pure
    // ASCII) so the normalizer has real work; the oracle applies DuckDB's
    // nfc_normalize to the same construction and the md5 fingerprints must
    // agree byte-for-byte. Narrow, codegen'd, zero shuffles.
    "q64_nfc_normalize" -> ((s, d) => {
      graft.functions.GraftFunctions.register(s)
      val raw = concat(lit(NonNfcPrefix), substring(col("text"), 1, 40))
      val norm = call_function("graft_nfc", raw)
      t(s, d)
        .select(
          col("doc_id"),
          length(raw).cast("long").as("raw_len"),
          length(norm).cast("long").as("norm_len"),
          md5(norm).as("norm_fp"),
          substring(norm, 1, 10).as("norm_head"))
    }),

    // --- Deterministic epoch shuffle (training-order assignment) ----------
    // A trainer consumes the corpus in a shuffled order per epoch, sharded
    // so each worker streams one shard sequentially. Order is a pure
    // function of (epoch salt, doc_id) — reproducible across runs,
    // engines, and partitionings, and STABLE under corpus growth (a new
    // doc lands somewhere without reshuffling everything, the q58 sample
    // discipline applied to ordering). Shard COUNT derives from corpus
    // size (broadcast 1-row count; [[EpochShardDocs]] docs per shard), so
    // per-shard work is bounded at any corpus size: the per-shard
    // position is a window over ~[[EpochShardDocs]] rows — partition
    // count grows with the corpus, never partition size (the q66 packing
    // rule). At 100 TB this materializes exactly what a data-loader
    // needs: (doc -> shard, position) with no global sort anywhere.
    "q204_epoch_shuffle" -> ((s, d) => {
      val docs = t(s, d).select(col("doc_id"),
        expr(s"md5(concat('$EpochSalt', cast(doc_id as string)))").as("h"))
      val n = docs.agg(count(lit(1)).as("n"))
      docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("h"),
          expr(s"cast(conv(substring(h, 1, 12), 16, 10) as bigint) % " +
            s"((n + ${EpochShardDocs - 1}) div $EpochShardDocs)").as("shard"))
        .select(col("doc_id"), col("shard"),
          row_number().over(Window.partitionBy(col("shard"))
            .orderBy(col("h"), col("doc_id"))).cast("long").as("pos"))
    }),

    // --- Shard balance audit ----------------------------------------------
    // The dual check a sharded epoch needs: does the hash sharding balance
    // BYTES (not just doc counts)? Per shard: docs, total chars, and the
    // exact integer imbalance |total_chars·n_shards − grand_total| — the
    // deviation from perfect balance over the common denominator n_shards,
    // comparable across shards without a float division. Histogram-sized
    // after one scan (shards × 3 numbers); the grand totals ride on a
    // broadcast 1-row aggregate.
    "q205_shard_balance" -> ((s, d) => {
      val docs = t(s, d).select(col("doc_id"), col("n_chars"),
        expr(s"md5(concat('$EpochSalt', cast(doc_id as string)))").as("h"))
      val n = docs.agg(count(lit(1)).as("n"))
      val sharded = docs.crossJoin(broadcast(n))
        .select(col("doc_id"), col("n_chars"),
          expr(s"cast(conv(substring(h, 1, 12), 16, 10) as bigint) % " +
            s"((n + ${EpochShardDocs - 1}) div $EpochShardDocs)").as("shard"))
      val per = sharded.groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"))
      val tot = per.agg(sum(col("total_chars")).as("grand_chars"),
        count(lit(1)).as("n_shards"))
      per.crossJoin(broadcast(tot))
        .select(col("shard"), col("n_docs"), col("total_chars"),
          abs(col("total_chars") * col("n_shards") - col("grand_chars"))
            .as("imbalance_num"))
    }),

    // --- Global rank without a global sort ---------------------------------
    // The primitive under any "give every row its exact position in a
    // total order" ask (epoch order materialization, stable pagination,
    // percentile-exact export) — done WITHOUT a single-task global sort:
    // two-level bucket rank. The bucket is the order key's own 2-hex-char
    // prefix (256 buckets; fixed-width prefix order == total order
    // prefix, so bucket-then-within-bucket IS the global order, ties
    // across buckets impossible); bucket offsets are a prefix sum over
    // the 256-row histogram (the sanctioned post-aggregation bounded
    // global window — CatalogPlanSpec's walk proves the input is
    // aggregate-bounded); within-bucket positions are a window PARTITIONED
    // by bucket. Per-bucket size is n/256 — the deploy dial is the prefix
    // LENGTH (k hex chars → 16^k buckets, chosen so buckets fit a task),
    // which is exactly how range-partitioned sorts pick their splits, but
    // with deterministic hash splits instead of sampled ones.
    "q211_global_rank" -> ((s, d) => {
      val docs = t(s, d).select(col("doc_id"),
        expr(s"md5(concat('$EpochSalt', cast(doc_id as string)))").as("h"))
        .withColumn("bucket",
          expr("cast(conv(substring(h, 1, 2), 16, 10) as bigint)"))
      val counts = docs.groupBy(col("bucket")).agg(count(lit(1)).as("c"))
      val offs = counts.select(col("bucket"),
        (sum(col("c")).over(Window.orderBy(col("bucket"))) - col("c"))
          .as("off"))
      docs.join(broadcast(offs), Seq("bucket"))
        .select(col("doc_id"),
          (col("off") + row_number().over(Window.partitionBy(col("bucket"))
            .orderBy(col("h"), col("doc_id")))).cast("long").as("rank"))
    }),

    // --- Consistent sharding (highest-random-weight) ------------------------
    // The q204 hash-mod sharding is stable only while the shard COUNT
    // holds; growing k moves ~(k−1)/k of all docs — a full re-layout of a
    // 100 TB corpus for one added shard. Rendezvous (HRW) hashing is the
    // standard fix: shard(doc) = argmax_j md5(j | doc_id) over the j
    // shards, a pure per-row computation (k md5s, k fixed by deployment,
    // zero shuffles), under which growing k→k+1 moves EXACTLY the docs
    // whose new shard wins the argmax — 1/(k+1) of the corpus in
    // expectation, the information-theoretic floor. q213 turns that
    // movement bound itself into an oracle-gated aggregate.
    "q212_hrw_shard" -> ((s, d) =>
      t(s, d).select(col("doc_id"), hrwShard(col("doc_id"), HrwShards))),

    // --- Reshard movement audit (the minimal-movement witness) --------------
    "q213_reshard_movement" -> ((s, d) =>
      t(s, d).select(col("doc_id"),
        hrwShard(col("doc_id"), HrwShards),
        hrwShard(col("doc_id"), HrwShards + 1).as("shard_after"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("shard") =!= col("shard_after"), 1L).otherwise(0L))
            .as("n_moved")))
  )

  /** HRW dials: shard count fixed by deployment (k md5s per row). */
  val HrwShards = 16

  /** argmax_j md5(j | doc_id) as one codegen'd expression tree: the max is
    * over a k-element literal-seeded struct array — no explode, no
    * shuffle, no window; ties impossible in practice but broken by larger
    * j deterministically (struct max compares h first, then j). */
  private def hrwShard(docId: org.apache.spark.sql.Column, k: Int) = {
    import org.apache.spark.sql.Column
    val cands: Seq[Column] = (0 until k).map { j =>
      struct(md5(concat(lit(s"$j|"), docId.cast("string"))).as("h"),
        lit(j.toLong).as("j"))
    }
    array_max(array(cands: _*)).getField("j").as("shard")
  }

  /** Epoch-shuffle dials: the salt names the epoch (a new epoch = a new
    * salt = an independent order); shard size bounds per-shard work. */
  val EpochSalt = "ep1|"
  val EpochShardDocs = 256

  private val oPiiText =
    """CASE WHEN doc_id % 3 = 0
         THEN 'contact u' || CAST(doc_id AS VARCHAR) || '@' || source || '.example.com '
         ELSE '' END
       || CASE WHEN doc_id % 2 = 0
         THEN 'from 10.' || CAST(doc_id % 256 AS VARCHAR) || '.0.' || CAST((doc_id * 7) % 256 AS VARCHAR) || ' '
         ELSE '' END
       || text"""

  val oracles: Map[String, String] = Map(

    // Stage-by-stage mirror of [[curate]]: every CTE reuses the SQL fragment
    // already hash-proven for the operator it composes (q40 dedup rule, the
    // q42/q46 LSH+CC machinery via Dedup.oComponents over the deduped CTE,
    // q37 gopher metrics, q57 gram overlap, q36 split, q56 redaction).
    "q70_curation_pipeline" ->
      s"""WITH RECURSIVE
            keepers AS (SELECT MIN(doc_id) AS doc_id FROM documents GROUP BY md5(text)),
            dd AS (SELECT d.* FROM documents d JOIN keepers k ON d.doc_id = k.doc_id),
            ${Dedup.oComponents("dd")},
            canon AS (SELECT dd.* FROM dd
                      WHERE NOT EXISTS (SELECT 1 FROM comp c
                                        WHERE c.doc_id = dd.doc_id
                                          AND c.component <> c.doc_id)),
            qm AS (SELECT doc_id,
                     len(tk) AS n_tok,
                     CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
                       / len(tk) AS mean_tok_len,
                     CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g')) AS DOUBLE)
                       / length(text) AS sym_ratio,
                     CASE WHEN len(sh) > 0
                          THEN 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)
                          ELSE 0.0 END AS rep_ratio
                   FROM (SELECT doc_id, text, $oToksFrag AS tk,
                           ${oShingles(oToksFrag, 3)} AS sh FROM canon)),
            qual AS (SELECT c.* FROM canon c JOIN qm m ON c.doc_id = m.doc_id
                     WHERE m.n_tok >= 20 AND m.n_tok <= 90
                       AND m.mean_tok_len >= 3.0 AND m.mean_tok_len <= 10.0
                       AND m.sym_ratio < 0.1 AND m.rep_ratio < 0.2),
            bench AS (SELECT DISTINCT gram FROM
                        (SELECT unnest(${oShingles(oToksFrag, DecontamN)}) AS gram
                         FROM documents WHERE source = '$BenchSource')),
            contam AS (SELECT DISTINCT g.doc_id FROM
                         (SELECT doc_id,
                            unnest(list_distinct(${oShingles(oToksFrag, DecontamN)})) AS gram
                          FROM qual WHERE source <> '$BenchSource') g
                       JOIN bench b ON g.gram = b.gram),
            clean AS (SELECT q.* FROM qual q
                      WHERE q.source <> '$BenchSource'
                        AND NOT EXISTS (SELECT 1 FROM contam c
                                        WHERE c.doc_id = q.doc_id))
          SELECT doc_id, source,
            CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '0d' THEN 'test'
                 WHEN md5(CAST(doc_id AS VARCHAR)) < '1a' THEN 'valid'
                 ELSE 'train' END AS split,
            CAST(len($oToksFrag) AS BIGINT) AS n_tok,
            md5(regexp_replace(regexp_replace($oPiiText, '$EmailRegex', '<EMAIL>', 'g'),
                               '$Ipv4Regex', '<IP>', 'g')) AS red_fp
          FROM clean""",

    "q56_pii_redact" ->
      s"""SELECT doc_id,
            len(regexp_extract_all(pii, '$EmailRegex')) AS n_email,
            len(regexp_extract_all(pii, '$Ipv4Regex')) AS n_ip,
            md5(red) AS red_fp,
            substr(red, 1, 24) AS red_head
          FROM (SELECT doc_id,
                  pii,
                  regexp_replace(regexp_replace(pii, '$EmailRegex', '<EMAIL>', 'g'),
                                 '$Ipv4Regex', '<IP>', 'g') AS red
                FROM (SELECT doc_id, $oPiiText AS pii FROM documents))""",

    "q57_decontam" ->
      s"""WITH grams AS (
            SELECT doc_id, source,
              unnest(list_distinct(${oShingles(oToksFrag, DecontamN)})) AS gram
            FROM documents),
          bench AS (SELECT DISTINCT gram FROM grams WHERE source = '$BenchSource'),
          hits AS (
            SELECT g.doc_id, COUNT(1) AS hits
            FROM grams g JOIN bench b ON g.gram = b.gram
            WHERE g.source <> '$BenchSource'
            GROUP BY g.doc_id)
          SELECT d.doc_id, d.source,
            COALESCE(h.hits, 0) AS n_contam_grams,
            COALESCE(h.hits, 0) > 0 AS contaminated
          FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
          WHERE d.source <> '$BenchSource'""",

    "q111_contam_spans" ->
      s"""WITH sh AS (
            SELECT doc_id, source,
              ${oShingles(oToksFrag, DecontamN)} AS sh
            FROM documents),
          bench AS (
            SELECT DISTINCT md5(unnest(sh)) AS g
            FROM sh WHERE source = '$BenchSource'),
          pos AS (
            SELECT doc_id, md5(unnest(sh)) AS g,
              generate_subscripts(sh, 1) AS pos
            FROM sh WHERE source <> '$BenchSource'),
          flag AS (
            SELECT p.doc_id, p.pos, b.g IS NOT NULL AS hit
            FROM pos p LEFT JOIN bench b ON p.g = b.g),
          agg AS (
            SELECT doc_id, COUNT(1) AS n_grams,
              CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_hits
            FROM flag GROUP BY doc_id),
          islands AS (
            SELECT doc_id,
              pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
            FROM flag WHERE hit),
          runs AS (
            SELECT doc_id, COUNT(1) AS run
            FROM islands GROUP BY doc_id, grp),
          longest AS (
            SELECT doc_id, MAX(run) AS longest_run FROM runs GROUP BY doc_id)
          SELECT d.doc_id, d.source,
            COALESCE(a.n_grams, 0) AS n_grams,
            COALESCE(a.n_hits, 0) AS n_hits,
            CASE WHEN COALESCE(a.n_grams, 0) > 0
                 THEN CAST(COALESCE(a.n_hits, 0) AS DOUBLE) / a.n_grams
                 ELSE 0.0 END AS hit_frac,
            COALESCE(l.longest_run, 0) AS longest_run,
            (8 * COALESCE(a.n_hits, 0) > COALESCE(a.n_grams, 0)
             OR COALESCE(l.longest_run, 0) >= 5) AS dirty
          FROM documents d
          LEFT JOIN agg a ON d.doc_id = a.doc_id
          LEFT JOIN longest l ON d.doc_id = l.doc_id
          WHERE d.source <> '$BenchSource'""",

    "q71_bloom_decontam" ->
      s"""WITH grams AS (
            SELECT doc_id, source,
              unnest(list_distinct(${oShingles(oToksFrag, DecontamN)})) AS gram
            FROM documents),
          gpos AS (
            SELECT doc_id, source, gram, ${Sketches.oBloomPos("gram", "r")} AS pos
            FROM grams CROSS JOIN (SELECT unnest(range(0, ${Sketches.BloomHashes})) AS r)),
          bloom AS (SELECT DISTINCT pos FROM gpos WHERE source = '$BenchSource'),
          ghit AS (
            SELECT doc_id, gram, BOOL_AND(pos IN (SELECT pos FROM bloom)) AS hit
            FROM gpos WHERE source <> '$BenchSource'
            GROUP BY doc_id, gram),
          hits AS (
            SELECT doc_id, COUNT(1) AS n_grams,
              CAST(SUM(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits
            FROM ghit GROUP BY doc_id)
          SELECT d.doc_id, d.source,
            COALESCE(h.n_grams, 0) AS n_grams,
            COALESCE(h.n_bloom_hits, 0) AS n_bloom_hits,
            COALESCE(h.n_bloom_hits, 0) > 0 AS bloom_contaminated
          FROM documents d LEFT JOIN hits h ON d.doc_id = h.doc_id
          WHERE d.source <> '$BenchSource'""",

    // Pipeline-v2 twin: q177's oracle wrapped as the clip CTE (one source
    // of truth for the span accounting), the q70 gopher fragment, and the
    // ranked-window form of priority sampling.
    "q200_curation_pipeline_v2" ->
      s"""WITH clipc AS (${Dedup.oracles("q177_exactsubstr_clip")}),
          surv AS (
            SELECT d.doc_id, d.source, d.text, c.kept_tokens
            FROM documents d JOIN clipc c ON d.doc_id = c.doc_id
            WHERE c.kept_tokens >= 32 AND c.kept_tokens * 2 >= c.n_tok),
          qm AS (
            SELECT doc_id,
              len(tk) AS n_tok,
              CAST(list_sum(list_transform(tk, w -> length(w))) AS DOUBLE)
                / len(tk) AS mean_tok_len,
              CAST(length(regexp_replace(text, '[a-z0-9 ]', '', 'g'))
                AS DOUBLE) / length(text) AS sym_ratio,
              CASE WHEN len(sh) > 0
                   THEN 1.0 - CAST(len(list_distinct(sh)) AS DOUBLE) / len(sh)
                   ELSE 0.0 END AS rep_ratio
            FROM (SELECT doc_id, text, $oToksFrag AS tk,
                    ${oShingles(oToksFrag, 3)} AS sh FROM surv)),
          qual AS (
            SELECT s.source, s.doc_id, s.kept_tokens
            FROM surv s JOIN qm m ON s.doc_id = m.doc_id
            WHERE m.n_tok >= 20 AND m.n_tok <= 90
              AND m.mean_tok_len >= 3.0 AND m.mean_tok_len <= 10.0
              AND m.sym_ratio < 0.1 AND m.rep_ratio < 0.2),
          pri AS (
            SELECT source, doc_id, GREATEST(kept_tokens, 1) AS w,
              CAST(concat('0x', substr(md5(concat('ps|',
                CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) + 1 AS u
            FROM qual),
          ranked AS (
            SELECT source, doc_id, w,
              ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY CAST(w AS DOUBLE) * 1152921504606846976 / u DESC,
                  doc_id) AS rn
            FROM pri)
          SELECT source, doc_id, CAST(w AS BIGINT) AS kept_tokens
          FROM ranked WHERE rn <= $PipelineV2K""",

    "q187_priority_sample" ->
      s"""WITH base AS (
            SELECT source, doc_id, GREATEST(n_chars, 1) AS w,
              CAST(concat('0x', substr(md5(concat('ps|',
                CAST(doc_id AS VARCHAR))), 1, 15)) AS BIGINT) + 1 AS u
            FROM documents),
          pri AS (
            SELECT source, doc_id, w,
              CAST(w AS DOUBLE) * 1152921504606846976 / u AS pri
            FROM base),
          ranked AS (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY source
              ORDER BY pri DESC, doc_id) AS rn
            FROM pri),
          tot AS (
            SELECT source, COUNT(1) AS n_docs,
              CAST(SUM(w) AS BIGINT) AS total_w
            FROM base GROUP BY source),
          tauv AS (SELECT source, pri AS tau FROM ranked
                   WHERE rn = ${PrioritySampleK + 1}),
          samp AS (
            SELECT r.source, r.w, t.tau
            FROM ranked r LEFT JOIN tauv t USING (source)
            WHERE r.rn <= $PrioritySampleK),
          est AS (
            SELECT source, COUNT(1) AS n_sampled,
              CAST(SUM(CASE WHEN tau IS NULL
                             OR CAST(w AS DOUBLE) >= tau
                            THEN w ELSE 0 END) AS BIGINT) AS big_w,
              CAST(SUM(CASE WHEN tau IS NOT NULL
                             AND CAST(w AS DOUBLE) < tau
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_small,
              MIN(tau) AS tau
            FROM samp GROUP BY source)
          SELECT t.source, t.n_docs, t.total_w, e.n_sampled,
            CAST(e.big_w AS DOUBLE) +
              CASE WHEN e.tau IS NULL THEN 0.0
                   ELSE CAST(e.n_small AS DOUBLE) * e.tau END AS est_total_w
          FROM tot t JOIN est e USING (source)""",

    "q58_stratified_sample" ->
      """SELECT source, rank, doc_id, h FROM (
           SELECT source, doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             ROW_NUMBER() OVER (PARTITION BY source
               ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
           FROM documents)
         WHERE rank <= 10""",

    "q147_temperature_mix" ->
      s"""WITH per AS (
            SELECT source, CAST(SUM(len($oToksFrag)) AS BIGINT) AS sum_tok
            FROM documents GROUP BY source),
          wt AS (
            SELECT source, sum_tok,
              CAST(floor(sqrt(CAST(sum_tok AS DOUBLE))) AS BIGINT) AS w
            FROM per),
          tot AS (SELECT CAST(SUM(w) AS BIGINT) AS tot_w FROM wt),
          q AS (
            SELECT source, sum_tok, w,
              CAST((2 * $TempMixK * w + tot_w) // (2 * tot_w) AS BIGINT)
                AS quota
            FROM wt CROSS JOIN tot),
          ranked AS (
            SELECT source, doc_id,
              ROW_NUMBER() OVER (PARTITION BY source
                ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rank
            FROM documents)
          SELECT r.source, q.sum_tok, q.w, q.quota,
            CAST(r.rank AS BIGINT) AS rank, r.doc_id
          FROM ranked r JOIN q ON r.source = q.source
          WHERE r.rank <= q.quota""",

    "q84_weighted_sample" ->
      """SELECT source, rank, doc_id, pri FROM (
           SELECT source, doc_id, pri,
             ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rank
           FROM (SELECT source, doc_id,
                   CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15)) AS BIGINT)
                     // greatest(n_chars, 1) AS pri
                 FROM documents))
         WHERE rank <= 5""",

    "q102_span_corruption" ->
      s"""WITH tk AS (SELECT doc_id, $oToksFrag AS t FROM documents),
          m AS (SELECT doc_id, len(t) AS n_tok,
                  list_filter(range(1, len(t) + 1),
                    i -> substr(md5('mask|' || doc_id || '|' || i), 1, 1) < '4')
                    AS masked
                FROM tk)
          SELECT doc_id, CAST(n_tok AS BIGINT) AS n_tok,
            CAST(len(masked) AS BIGINT) AS n_masked,
            -- DuckDB's array_to_string([]) is NULL where Spark's concat_ws
            -- is '' — an all-kept doc ((3/4)^n_tok survives at 50k docs)
            -- must read as "zero masked positions", not NULL
            COALESCE(array_to_string(
              list_transform(masked, x -> CAST(x AS VARCHAR)), ','), '')
              AS masked_idx
          FROM m""",

    "q83_chunk_overlap" ->
      s"""WITH tk AS (SELECT doc_id, $oToksFrag AS t FROM documents),
          st AS (SELECT doc_id, t, len(t) AS n,
                   unnest(generate_series(1,
                     greatest(1, len(t) - ${ChunkLen - ChunkStride}),
                     $ChunkStride)) AS s
                 FROM tk)
          SELECT doc_id,
            CAST(s AS BIGINT) AS chunk_start,
            CAST(least($ChunkLen, n - s + 1) AS BIGINT) AS chunk_len,
            md5(array_to_string(t[s:least(s + ${ChunkLen - 1}, n)], ' ')) AS chunk_md5
          FROM st""",

    "q59_inverted_index" ->
      s"""SELECT term, COUNT(1) AS df,
            array_to_string((list(doc_id ORDER BY doc_id))[1:8], ',') AS postings
          FROM (SELECT doc_id, unnest(list_distinct($oToksFrag)) AS term
                FROM documents)
          GROUP BY term""",

    // Phrase twin: per-row adjacency scan over the token list (DuckDB list
    // lambdas capture row columns); the Spark side must reproduce it from
    // the shifted-postings equi join. hits are 1-based — −1 converts to
    // the 0-based token index the postings carry.
    "q166_phrase_search" ->
      s"""WITH d AS (SELECT doc_id, $oToksFrag AS tk FROM documents),
          m AS (
            SELECT doc_id,
              list_filter(range(1, len(tk)),
                i -> tk[i] = '$PhraseW1' AND tk[i + 1] = '$PhraseW2') AS hits
            FROM d)
          SELECT doc_id, CAST(len(hits) AS BIGINT) AS n_occ,
            CAST(hits[1] - 1 AS BIGINT) AS first_pos
          FROM m WHERE len(hits) > 0""",

    "q67_mixture_weights" ->
      s"""WITH per AS (
            SELECT source, COUNT(1) AS n_docs,
              CAST(SUM(len($oToksFrag)) AS BIGINT) AS sum_tok
            FROM documents GROUP BY source),
          tot AS (
            SELECT COUNT(1) AS n_sources, CAST(SUM(sum_tok) AS BIGINT) AS tot_tok
            FROM per)
          SELECT source, n_docs, sum_tok,
            CAST(tot_tok AS DOUBLE) / (n_sources * 2) AS budget_tok,
            LEAST(CAST(1.0 AS DOUBLE),
              CAST(tot_tok AS DOUBLE) / (n_sources * 2) / sum_tok) AS weight
          FROM per CROSS JOIN tot""",

    "q66_sequence_pack" ->
      s"""SELECT doc_id, source, shard, n_tok,
            CAST(((tok_end - n_tok) // $SeqLen) AS BIGINT) AS seq_id,
            CAST((tok_end - n_tok) % $SeqLen AS BIGINT) AS seq_offset
          FROM (SELECT doc_id, source, shard, n_tok,
                  SUM(n_tok) OVER (PARTITION BY source, shard
                    ORDER BY doc_id) AS tok_end
                FROM (SELECT doc_id, source, doc_id % $PackShards AS shard,
                        len($oToksFrag) AS n_tok
                      FROM documents))""",

    "q64_nfc_normalize" ->
      s"""SELECT doc_id,
            length(raw) AS raw_len,
            length(nfc_normalize(raw)) AS norm_len,
            md5(nfc_normalize(raw)) AS norm_fp,
            substr(nfc_normalize(raw), 1, 10) AS norm_head
          FROM (SELECT doc_id, '$NonNfcPrefix' || substr(text, 1, 40) AS raw
                FROM documents)""",

    "q204_epoch_shuffle" ->
      s"""WITH h AS (SELECT doc_id,
                       md5(concat('$EpochSalt', CAST(doc_id AS VARCHAR))) AS h
                     FROM documents),
            ns AS (SELECT (count(*) + ${EpochShardDocs - 1}) // $EpochShardDocs AS k
                   FROM documents)
          SELECT doc_id, shard,
            ROW_NUMBER() OVER (PARTITION BY shard ORDER BY h, doc_id) AS pos
          FROM (SELECT doc_id, h,
                  CAST(concat('0x', substr(h, 1, 12)) AS BIGINT)
                    % (SELECT k FROM ns) AS shard
                FROM h)""",

    "q205_shard_balance" ->
      s"""WITH h AS (SELECT doc_id, n_chars,
                       md5(concat('$EpochSalt', CAST(doc_id AS VARCHAR))) AS h
                     FROM documents),
            ns AS (SELECT (count(*) + ${EpochShardDocs - 1}) // $EpochShardDocs AS k
                   FROM documents),
            per AS (SELECT CAST(concat('0x', substr(h, 1, 12)) AS BIGINT)
                      % (SELECT k FROM ns) AS shard,
                      count(*) AS n_docs,
                      CAST(sum(n_chars) AS BIGINT) AS total_chars
                    FROM h GROUP BY 1),
            tot AS (SELECT CAST(sum(total_chars) AS BIGINT) AS grand_chars,
                      count(*) AS n_shards
                    FROM per)
          SELECT shard, n_docs, total_chars,
            abs(total_chars * n_shards - grand_chars) AS imbalance_num
          FROM per CROSS JOIN tot""",

    "q211_global_rank" ->
      s"""SELECT doc_id,
            ROW_NUMBER() OVER (ORDER BY h, doc_id) AS rank
          FROM (SELECT doc_id,
                  md5(concat('$EpochSalt', CAST(doc_id AS VARCHAR))) AS h
                FROM documents)""",

    "q212_hrw_shard" ->
      s"""SELECT doc_id, j AS shard FROM (
            SELECT d.doc_id, t.j,
              ROW_NUMBER() OVER (PARTITION BY d.doc_id
                ORDER BY md5(CAST(t.j AS VARCHAR) || '|'
                  || CAST(d.doc_id AS VARCHAR)) DESC, t.j DESC) AS rn
            FROM documents d CROSS JOIN range($HrwShards) t(j))
          WHERE rn = 1""",

    "q213_reshard_movement" ->
      s"""WITH s AS (SELECT doc_id, j AS shard FROM (
              SELECT d.doc_id, t.j,
                ROW_NUMBER() OVER (PARTITION BY d.doc_id
                  ORDER BY md5(CAST(t.j AS VARCHAR) || '|'
                    || CAST(d.doc_id AS VARCHAR)) DESC, t.j DESC) AS rn
              FROM documents d CROSS JOIN range($HrwShards) t(j))
            WHERE rn = 1),
          s2 AS (SELECT doc_id, j AS shard FROM (
              SELECT d.doc_id, t.j,
                ROW_NUMBER() OVER (PARTITION BY d.doc_id
                  ORDER BY md5(CAST(t.j AS VARCHAR) || '|'
                    || CAST(d.doc_id AS VARCHAR)) DESC, t.j DESC) AS rn
              FROM documents d CROSS JOIN range(${HrwShards + 1}) t(j))
            WHERE rn = 1)
          SELECT count(*) AS n_docs,
            CAST(sum(CASE WHEN s.shard <> s2.shard THEN 1 ELSE 0 END)
              AS BIGINT) AS n_moved
          FROM s JOIN s2 USING (doc_id)"""
  )

  private def oToksFrag: String = "string_split(text, ' ')"
}
