package graft.queries

import graft.{Q, Tables}
import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication family over `documents` — the training-data-pipeline
  * mandate. Exact dedup is one keyed exchange; near-dup is LSH candidate
  * generation (shuffle on *bucket* keys — linear-ish, never an all-pairs
  * cross join) + an exact-Jaccard verification join, so the OUTPUT is
  * exact (and hash-comparable against DuckDB's all-pairs oracle, which is
  * only feasible because the oracle runs at toy scale).
  *
  * Recall safety at the oracle gate: the corpus' near-dup pairs sit at
  * J >= 0.97 with nothing between 0.5 and 0.97 (measured at sf0.01).
  * MinHash with 16 bands x 4 rows misses a J=0.97 pair with probability
  * (1 - .97^4)^16 ~ 1e-15; SimHash banding at 8x8 finds every pair within
  * Hamming distance 7 *deterministically* (pigeonhole).
  */
object DedupQs {

  /** The common oracle: exact all-pairs shingle Jaccard >= `thr`. Fine in
    * DuckDB at sf0.01 (500 docs); the Spark side must never do this.
    */
  private def jaccardOracleSql(thr: Double): String = s"""
      WITH sh AS (
        SELECT doc_id, list_distinct([string_split(text, ' ')[i] || ' ' || string_split(text, ' ')[i+1]
                 || ' ' || string_split(text, ' ')[i+2]
               for i in range(1, greatest(len(string_split(text, ' ')) - 2, 0) + 1)]) AS shingles
        FROM documents)
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
        CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) AS jaccard
      FROM sh a JOIN sh b ON a.doc_id < b.doc_id
      WHERE CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
          / (len(a.shingles) + len(b.shingles) - len(list_intersect(a.shingles, b.shingles))) >= $thr
      ORDER BY doc_a, doc_b"""

  /** doc_id + distinct 3-gram shingle set, persisted: the near-dup
    * queries consume it 3-4 times (banding + both sides of the exact
    * verify), and Spark's CacheManager dedups identical plans, so every
    * call site shares one materialization. MEMORY_AND_DISK — spillable
    * at scale (O(docs x shingles)).
    */
  private def shingled(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), TextOps.shingles(col("text")).as("shingles"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Exact verification of candidate pairs: join shingle sets back, keep
    * pairs with true Jaccard >= thr. Candidates are tiny post-LSH, so both
    * joins broadcast the candidate side at scale.
    */
  private def verified(s: SparkSession, d: String, cands: DataFrame, thr: Double): DataFrame = {
    val sa = shingled(s, d).select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = shingled(s, d).select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cands
      .join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("jaccard", DedupOps.jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= thr)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Exact dedup by a business key, deterministic window form (D1/D2;
    * reference `src/movie.py:275,295`): one survivor per (lang, n_chars),
    * lowest doc_id wins. Single hash exchange, no collect.
    */
  val q35 = Q(
    "q35_exact_dedup_key",
    (s, d) => {
      DedupOps.exactDedup(
          Tables.documents(s, d).select("doc_id", "lang", "n_chars"),
          Seq("lang", "n_chars"), Seq(col("doc_id")))
        .orderBy("lang", "n_chars")
    },
    Some("""
      SELECT doc_id, lang, n_chars FROM (
        SELECT doc_id, lang, n_chars,
          row_number() OVER (PARTITION BY lang, n_chars ORDER BY doc_id) AS rn
        FROM documents) t
      WHERE rn = 1 ORDER BY lang, n_chars"""))

  /** MinHash-LSH near-dup detection: shingle → 64-perm minhash signature →
    * 16x4 banding → bucket self-join → exact-Jaccard verify >= 0.8.
    */
  val q36 = Q(
    "q36_minhash_lsh",
    (s, d) => {
      // persist the band relation: the self-join consumes it twice, and
      // one side feeds a BroadcastExchange, so ReusedExchange cannot fire
      // — without the cache the whole minhash subplan runs twice
      // (measured ~2x). MEMORY_AND_DISK: at scale this relation is
      // O(docs x bands), spillable.
      val bands = DedupOps.minhashBands(
          shingled(s, d).filter(size(col("shingles")) > 0),
          "doc_id", numPerm = 64, bands = 16)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def side(n: String): DataFrame =
        bands.select(col("doc_id").as(s"doc_$n"), col("band_idx"), col("band_hash"))
      val cands = side("a").join(side("b"), Seq("band_idx", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      verified(s, d, cands, 0.8)
    },
    Some(jaccardOracleSql(0.8)),
    headline = true)

  /** SimHash near-dup detection: 64-bit sign-hash of the token stream,
    * 8x8-bit banding (deterministic recall for Hamming <= 7), exact verify.
    * Same oracle as q36 — two independent candidate generators must
    * converge on the same exact answer.
    */
  val q37 = Q(
    "q37_simhash",
    (s, d) => {
      val bands = DedupOps.simhashBands(
          Tables.documents(s, d)
            .select(col("doc_id"), TextOps.tokens(col("text")).as("tokens")),
          "doc_id", bitsPerBand = 8)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def side(n: String): DataFrame =
        bands.select(col("doc_id").as(s"doc_$n"), col("band_idx"), col("band_hash"))
      val cands = side("a").join(side("b"), Seq("band_idx", "band_hash"))
        .filter(col("doc_a") < col("doc_b"))
        .select("doc_a", "doc_b").distinct()
      verified(s, d, cands, 0.8)
    },
    Some(jaccardOracleSql(0.8)))

  /** Exact n-gram Jaccard pairs (J >= 0.5) via inverted-index join:
    * explode shingles, shuffle on the SHINGLE (the standard exact path —
    * common-shingle counting, no cross join), then closed-form Jaccard
    * from the two set sizes.
    *
    * Scale note: cost is sum over shingles of df(sh)^2. On natural text
    * the shingle space is sparse and this is near-linear; THIS corpus
    * has a 31-word vocabulary, so every shingle is hyper-frequent and
    * the pair blow-up is quadratic — which is exactly why q36/q37 (LSH
    * candidates + exact verify) are the headline dedup path, and any
    * production run would cap shingle document-frequency first.
    */
  val q38 = Q(
    "q38_ngram_jaccard",
    (s, d) => {
      def inv(side: String): DataFrame =
        shingled(s, d).select(col("doc_id").as(s"doc_$side"), explode(col("shingles")).as("sh"))
      val inter = inv("a").join(inv("b"), "sh")
        .filter(col("doc_a") < col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(count(lit(1)).as("n_inter"))
      val sizes = shingled(s, d).select(col("doc_id"), size(col("shingles")).as("n_sh"))
      inter
        .join(sizes.select(col("doc_id").as("doc_a"), col("n_sh").as("n_a")), "doc_a")
        .join(sizes.select(col("doc_id").as("doc_b"), col("n_sh").as("n_b")), "doc_b")
        .withColumn("jaccard",
          col("n_inter").cast("double") / (col("n_a") + col("n_b") - col("n_inter")).cast("double"))
        .filter(col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
        .orderBy("doc_a", "doc_b")
    },
    Some(jaccardOracleSql(0.5)))

  val defs: Seq[Q] = Seq(q35, q36, q37, q38)
}
