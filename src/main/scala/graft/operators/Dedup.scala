package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import TextFns._

/** Deduplication operators over `documents` (and embedding near-dup over
  * `embeddings`): exact hash dedup, MinHash+LSH, SimHash, n-gram Jaccard,
  * embedding-cosine near-dup.
  *
  * Scale stance: no query here ever does an unblocked all-pairs comparison.
  * Every near-dup variant first computes a per-row bucket key (minhash band,
  * simhash, or hyperplane-LSH bucket) and self-joins on that key, so the
  * shuffle is an equi-join keyed by bucket and the quadratic cost is bounded
  * by bucket size. Exact Jaccard/cosine runs only on candidate pairs. This is
  * the shape that survives 100 TB: signature pass is embarrassingly parallel,
  * the band join is a standard shuffled equi-join, and AQE handles skewed
  * buckets.
  */
object Dedup {

  val NumHashes = 8   // minhash signature length
  val BandSize = 2    // rows per LSH band -> 4 bands
  val NumBands: Int = NumHashes / BandSize
  val SimhashBits = 8
  val JaccardThreshold = 0.7   // trigram verify threshold (q42)
  val BigramThreshold = 0.8    // bigram n-gram-Jaccard threshold (q44)
  val CosineThreshold = 0.4    // embedding near-dup threshold (q45)

  private def docs(s: SparkSession, d: String) = Tables.load(s, d, "documents")
  private def embs(s: SparkSession, d: String) = Tables.load(s, d, "embeddings")

  /** doc_id + trigram shingle array. */
  private def shingled(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(col("doc_id"), shingles(toks(col("text")), 3).as("sh"))

  /** Signature frame: doc_id, sh, mh0..mh7, b0..b3. */
  private def signatures(s: SparkSession, d: String): DataFrame = {
    val sig = shingled(s, d).select(
      col("doc_id") +: col("sh") +:
        (0 until NumHashes).map(i => minhash(col("sh"), i).as(s"mh$i")): _*)
    sig.select(
      sig.columns.map(col) ++
        (0 until NumBands).map(j =>
          bandKey((0 until BandSize).map(r => col(s"mh${j * BandSize + r}")))
            .as(s"b$j")): _*)
  }

  /** (doc_id, band-index, band-key) — the LSH bucket relation. */
  private def banded(s: SparkSession, d: String): DataFrame =
    signatures(s, d).select(
      col("doc_id"),
      explode(array((0 until NumBands).map(j =>
        struct(lit(j).as("b"), col(s"b$j").as("k"))): _*)).as("bk"))
      .select(col("doc_id"), col("bk.b").as("b"), col("bk.k").as("k"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // --- exact dedup: hash-groupBy, keep min doc_id per content hash -------
    "q40_dedup_exact" -> ((s, d) =>
      docs(s, d)
        .groupBy(md5(col("text")).as("h"))
        .agg(min(col("doc_id")).as("keep_id"),
          count(lit(1)).as("n_copies"))),

    // --- MinHash signatures + LSH band keys per document -------------------
    "q41_dedup_minhash" -> ((s, d) => signatures(s, d).drop("sh")),

    // --- MinHash-LSH candidate pairs, verified by exact trigram Jaccard ----
    "q42_dedup_lsh_pairs" -> ((s, d) => {
      val bd = banded(s, d)
      val cand = bd.as("x").join(bd.as("y"),
          col("x.b") === col("y.b") && col("x.k") === col("y.k") &&
            col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"))
        .distinct()
      val base = shingled(s, d)
      cand
        .join(base.select(col("doc_id").as("i"), col("sh").as("shi")), "i")
        .join(base.select(col("doc_id").as("j"), col("sh").as("shj")), "j")
        .select(col("i"), col("j"), jaccard(col("shi"), col("shj")).as("jac"))
        .filter(col("jac") >= JaccardThreshold)
    }),

    // --- SimHash (8-bit random-hyperplane sketch over tokens) --------------
    "q43_dedup_simhash" -> ((s, d) => {
      val base = docs(s, d).select(col("doc_id"), toks(col("text")).as("tk"))
      val votes = base.select(
        col("doc_id") +:
          (0 until SimhashBits).map(b => simhashVote(col("tk"), b).as(s"v$b")): _*)
      votes.select(
        col("doc_id"),
        simhashFromVotes((0 until SimhashBits).map(b => col(s"v$b")))
          .cast("long").as("simhash"))
    }),

    // --- n-gram (bigram) Jaccard near-dup, minhash-blocked -----------------
    "q44_dedup_ngram_jaccard" -> ((s, d) => {
      val g = docs(s, d).select(
        col("doc_id"),
        array_distinct(shingles(toks(col("text")), 2)).as("g"))
        .withColumn("blk", minhash(col("g"), 9))
      g.as("x").join(g.as("y"),
          col("x.blk") === col("y.blk") && col("x.doc_id") < col("y.doc_id"))
        .select(col("x.doc_id").as("i"), col("y.doc_id").as("j"),
          jaccard(col("x.g"), col("y.g")).as("jac"))
        .filter(col("jac") >= BigramThreshold)
    }),

    // --- embedding-cosine near-dup, hyperplane-LSH-blocked -----------------
    "q45_dedup_embcos" -> ((s, d) => {
      val e = embs(s, d)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
        .withColumn("bucket", lshBucket(col("v")))
      e.as("x").join(e.as("y"),
          col("x.bucket") === col("y.bucket") && col("x.vec_id") < col("y.vec_id"))
        .select(col("x.vec_id").as("i"), col("y.vec_id").as("j"),
          cosine(col("x.v"), col("y.v")).as("sim"))
        .filter(col("sim") >= CosineThreshold)
    })
  )

  // ------------------------- oracle SQL twins ----------------------------

  private val oToks = "string_split(text, ' ')"
  private val oSh = oShingles(oToks, 3)

  private val oSigSelect: String = {
    val mhs = (0 until NumHashes).map(i => s"${oMinhash("sh", i)} AS mh$i")
    s"SELECT doc_id, sh, ${mhs.mkString(", ")} FROM (SELECT doc_id, $oSh AS sh FROM documents)"
  }

  private val oBandExprs: Seq[String] = (0 until NumBands).map { j =>
    val cat = (0 until BandSize).map(r => s"mh${j * BandSize + r}").mkString(" || ")
    s"md5($cat) AS b$j"
  }

  private val oBanded: String =
    (0 until NumBands).map { j =>
      val cat = (0 until BandSize).map(r => s"mh${j * BandSize + r}").mkString(" || ")
      s"SELECT doc_id, $j AS b, md5($cat) AS k FROM sig"
    }.mkString(" UNION ALL ")

  val oracles: Map[String, String] = Map(
    "q40_dedup_exact" ->
      """SELECT md5(text) AS h, MIN(doc_id) AS keep_id, COUNT(1) AS n_copies
         FROM documents GROUP BY 1""",

    "q41_dedup_minhash" ->
      s"""SELECT doc_id, ${(0 until NumHashes).map(i => s"mh$i").mkString(", ")},
             ${oBandExprs.mkString(", ")}
          FROM ($oSigSelect)""",

    "q42_dedup_lsh_pairs" ->
      s"""WITH base AS (SELECT doc_id, $oSh AS sh FROM documents),
            sig AS (SELECT doc_id, ${(0 until NumHashes).map(i => s"${oMinhash("sh", i)} AS mh$i").mkString(", ")} FROM base),
            banded AS ($oBanded),
            cand AS (SELECT DISTINCT x.doc_id AS i, y.doc_id AS j
                     FROM banded x JOIN banded y
                       ON x.b = y.b AND x.k = y.k AND x.doc_id < y.doc_id)
          SELECT i, j, jac FROM (
            SELECT cand.i, cand.j, ${oJaccard("bx.sh", "by.sh")} AS jac
            FROM cand JOIN base bx ON cand.i = bx.doc_id
                      JOIN base by ON cand.j = by.doc_id)
          WHERE jac >= $JaccardThreshold""",

    "q43_dedup_simhash" ->
      s"""SELECT doc_id, CAST(${(0 until SimhashBits).map(b =>
              s"(CASE WHEN v$b >= 0 THEN ${1 << b} ELSE 0 END)").mkString(" + ")} AS BIGINT) AS simhash
          FROM (SELECT doc_id, ${(0 until SimhashBits).map(b =>
              s"${oSimhashVote("tk", b)} AS v$b").mkString(", ")}
                FROM (SELECT doc_id, $oToks AS tk FROM documents))""",

    "q44_dedup_ngram_jaccard" ->
      s"""WITH g AS (SELECT doc_id, list_distinct(${oShingles(oToks, 2)}) AS g,
                       ${oMinhash(s"list_distinct(${oShingles(oToks, 2)})", 9)} AS blk
                     FROM documents)
          SELECT i, j, jac FROM (
            SELECT x.doc_id AS i, y.doc_id AS j, ${oJaccard("x.g", "y.g")} AS jac
            FROM g x JOIN g y ON x.blk = y.blk AND x.doc_id < y.doc_id)
          WHERE jac >= $BigramThreshold""",

    "q45_dedup_embcos" ->
      s"""WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                       ${oLshBucket("CAST(embedding AS DOUBLE[])")} AS bucket
                     FROM embeddings)
          SELECT i, j, sim FROM (
            SELECT x.vec_id AS i, y.vec_id AS j, ${oCosine("x.v", "y.v")} AS sim
            FROM e x JOIN e y ON x.bucket = y.bucket AND x.vec_id < y.vec_id)
          WHERE sim >= $CosineThreshold"""
  )
}
