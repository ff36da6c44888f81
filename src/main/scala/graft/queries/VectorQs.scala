package graft.queries

import graft.{Det, Q, Tables}
import graft.ops.VectorOps
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (64-dim float vectors).
  *
  * q41 is the exact baseline: broadcast the (small) query set against one
  * linear corpus scan — no shuffle, no corpus x corpus cross join. q42 is
  * the scale path: IVF cell assignment (linear) + probe-3 search, fully
  * deterministic, so even the approximate index hash-matches its oracle.
  * q43 is random-hyperplane LSH near-dup (sign-bucket join + exact cosine
  * verify) — recall is probabilistic, hence rows-only (no SQL oracle).
  *
  * All ranking cosines use [[VectorOps]]' exact-decimal inner products —
  * order-independent, bit-identical across engines.
  */
object VectorQs {

  /** DuckDB mirror of [[VectorOps.dotD]] for 64-dim vectors (list_sum is
    * a sequential left fold — verified bit-identical to Spark's). */
  private def dotSql(a: String, b: String): String =
    s"list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, 65)])"

  private def cosSql(a: String, b: String): String =
    s"(${dotSql(a, b)} / (sqrt(${dotSql(a, a)}) * sqrt(${dotSql(b, b)})))"

  private def corpus(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(col("vec_id").as("id"), col("embedding").as("vec"))

  /** Validity bound for broadcasting the embeddings relation into the SRP
    * verify joins (q43/q139) — [[DedupQs.docBroadcastOk]]'s vector twin.
    * Without the hint the post-LSH candidate relation has no stats, so
    * both verify joins go sort-merge, and the SECOND sort carries every
    * candidate row with a 64-float array already attached (~300 B/row):
    * at the 100× tier (500 k vectors, capped candidate mass ~10⁸–10⁹
    * rows) that sort spilled past 45 GB of local disk and died. With the
    * embeddings side broadcast, candidates stream map-side carrying only
    * ids, and nothing array-laden ever shuffles. Estimate = vectors × 64
    * floats (one count, memoized per (session, corpus)); bound conf
    * `spark.graft.vec.broadcastMaxFloats`, default 64 M floats ≈ 256 MB
    * packed — a few × that as a HashedRelation, inside a production
    * executor's broadcast budget, and 500 k × 64 = 32 M sits within it.
    * Past the bound the join degrades to the shuffled form. */
  private val vecBroadcastEst =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Long]()

  private[graft] def vecBroadcastOk(s: SparkSession, d: String): Boolean = {
    // memoFill, not computeIfAbsent: the fill runs a Spark count (see
    // the non-blocking-memo note at [[memoFill]])
    val est = memoFill(vecBroadcastEst, (s, d))(
      Long.box(Tables.embeddings(s, d).count() * 64L))
    val bound = s.conf.getOption("spark.graft.vec.broadcastMaxFloats")
      .map(_.toLong).getOrElse(64000000L)
    est <= bound
  }

  private def maybeBVec(s: SparkSession, d: String, df: DataFrame): DataFrame =
    if (vecBroadcastOk(s, d)) broadcast(df) else df

  private def queries(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), col("embedding").as("qvec"))

  /** Brute-force exact cosine top-10 for 5 query vectors. */
  val q41 = Q(
    "q41_cosine_topk",
    (s, d) => {
      VectorOps.bruteForceTopK(corpus(s, d), queries(s, d), k = 10)
        .select(col("qid"), col("id").as("vec_id"), col("cos"), col("rn"))
        .orderBy("qid", "rn")
    },
    Some(s"""
      WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5)
      SELECT qid, vec_id, cos, rn FROM (
        SELECT q.qid, e.vec_id, ${cosSql("q.qe", "e.embedding")} AS cos,
          CAST(row_number() OVER (PARTITION BY q.qid
            ORDER BY ${cosSql("q.qe", "e.embedding")} DESC, e.vec_id) AS INT) AS rn
        FROM q JOIN embeddings e ON e.vec_id <> q.qid) t
      WHERE rn <= 10 ORDER BY qid, rn"""),
    headline = true)

  /** Shared DuckDB CTE chain producing `cent1`, the Lloyd-TRAINED
    * centroid set (one quantized-mean update of the `vec_id % 50` seeds
    * — [[VectorOps.kmeansUpdate]]'s exact floor(v·2^40) integer-mean
    * mirror). Used by q59 (whose final assignment it IS) and by q42
    * (whose index now probes trained cells — round 12: trained centroids
    * plus the raised probe budget are what lifted measured recall@5 to
    * ≥ 0.8 at every scale tier, SURVEY §2.0.2's recall-vs-probe table).
    */
  private def kmeansCentSql: String = s"""
      cent0 AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0),
      a1 AS (
        SELECT vec_id, vec, cell FROM (
          SELECT e.vec_id, e.embedding AS vec, c.cid AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.cid) AS rn
          FROM embeddings e CROSS JOIN cent0 c) t WHERE rn = 1),
      qz AS (
        SELECT cell, pos, CAST(floor(CAST(v AS DOUBLE) * 1099511627776.0) AS BIGINT) AS q
        FROM (SELECT cell, generate_subscripts(vec, 1) AS pos, unnest(vec) AS v FROM a1) u),
      mz AS (
        SELECT cell, pos,
          CAST((CAST(sum(q) AS DOUBLE) / count(*)) * power(2.0, -40) AS REAL) AS m
        FROM qz GROUP BY cell, pos),
      cent1 AS (SELECT cell AS cid, list(m ORDER BY pos) AS cvec FROM mz GROUP BY cell)"""

  /** The `vec_id % 50` centroid/seed/sample relations, optionally capped
    * to ids below `idCap`. The cap exists for `tools/ScaleEvidence`'s
    * fixed-k measurements: on an N× id-shifted replication the modulus
    * alone would grow these relations N× with the corpus (and the
    * broadcast-argmax work N²×), measuring harness-k growth instead of
    * the operators' linear-in-rows-at-fixed-k claim; capping to copy 0
    * keeps them 1×-sized. `Long.MaxValue` (every graded query) adds no
    * filter, so graded plans are untouched. */
  private def fifties(s: SparkSession, d: String, idCap: Long): DataFrame = {
    val base = Tables.embeddings(s, d).filter(col("vec_id") % 50 === 0)
    if (idCap == Long.MaxValue) base else base.filter(col("vec_id") < idCap)
  }

  /** IVF approximate search: Lloyd-trained centroids ([[trainedCents]]),
    * nearest-cell assignment, probe the [[DefaultIvfProbes]] closest
    * cells per query, exact re-rank of the candidates, top-5.
    */
  /** Default probe budget for the IVF searches (q42/q66). The corpus is
    * ISOTROPIC (within-label mean cosine 0.0016 vs 0.0003 cross — no
    * cluster structure for an index to exploit), so recall@5 is governed
    * almost entirely by the scanned fraction probes/k: the measured
    * recall-vs-probe curve (SURVEY §2.0.2) is near-linear from 0.28 at
    * probes=3 to ~1.0 at probes=k. 24 is the measured knee that holds
    * recall@5 ≥ 0.8 at EVERY scale tier (1×/10×/100×, trained
    * centroids) — on clustered production embeddings the same budget
    * buys far more, and the knob walks the curve per-session. */
  private[graft] val DefaultIvfProbes = 24

  /** Probe count for the IVF searches (q42/q66) — the standard
    * recall/cost lever: candidates (and search time) grow linearly with
    * it, recall approaches the exhaustive bound as it nears the cell
    * count. Default [[DefaultIvfProbes]] = the graded/benched plan
    * (recall@5 ≥ 0.8 at every measured tier); lower per-session when
    * throughput beats recall. Same opt-in-knob posture as q43's
    * `spark.graft.srp.bandBits`: a non-default value intentionally
    * diverges from the pinned oracle answer. */
  private def probeCount(s: SparkSession): Int = {
    val p = s.conf.getOption("spark.graft.ivf.probes").map(_.toInt)
      .getOrElse(DefaultIvfProbes)
    require(p > 0, s"spark.graft.ivf.probes must be > 0: $p")
    p
  }

  /** The IVF index's centroid set: one Lloyd update of the `vec_id % 50`
    * seeds (q59's iters=2 kmeans, CENTROID half) — Memo-cached because
    * it IS the index (rebuild-per-query would charge every search with
    * an O(corpus) training pass; at 100 TB this relation is the
    * artifact a deployment persists). Training is one linear assignment
    * pass + one map-side-combined quantized-mean aggregate; the output
    * is k-sized and broadcasts. Trained cells quantize the corpus
    * measurably better than raw seeds (recall@5 at the same probe
    * budget: +0.08 at the 1× tier, SURVEY §2.0.2), and every step is
    * engine-exact, so q42 stays hash-graded.
    */
  private[graft] def trainedCents(s: SparkSession, d: String,
      idCap: Long = Long.MaxValue): DataFrame = {
    val capTag = if (idCap == Long.MaxValue) "" else s"_cap$idCap"
    graft.Memo.cached(s, d, "ivf_trained_cents" + capTag) {
      val seeds = fifties(s, d, idCap)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      VectorOps.kmeansUpdate(VectorOps.ivfAssign(corpus(s, d), seeds))
    }
  }

  /** `trainedIndex = false` swaps the raw `%50` seed centroids back in —
    * the UNTRAINED index, kept only so `tools.RecallCurve` can measure
    * what the Lloyd update buys at each probe budget (the graded q42 and
    * every production path use the trained default). */
  private[graft] def ivfQuery(s: SparkSession, d: String,
      idCap: Long = Long.MaxValue, trainedIndex: Boolean = true): DataFrame = {
      val cents =
        if (trainedIndex) trainedCents(s, d, idCap)
        else fifties(s, d, idCap)
          .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val assigned = VectorOps.ivfAssign(corpus(s, d), cents)
      val wProbe = Window.partitionBy("qid").orderBy(col("pcos").desc, col("cid"))
      val probes = queries(s, d)
        .withColumn("q_norm", VectorOps.sqNormD(col("qvec")))
        .crossJoin(broadcast(cents))
        .withColumn("pcos", VectorOps.cosine(col("qvec"), col("cvec")))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= probeCount(s))
        .select("qid", "qvec", "q_norm", "cid")
      val wRank = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
      // probes is 3 rows per query — broadcast it against the corpus-sized
      // cell assignment (without the hint this planned as a sort-merge
      // join, shuffling both sides)
      assigned
        .join(broadcast(probes), col("cid") === col("cell"))
        .filter(col("id") =!= col("qid"))
        // norms precomputed per row (q_norm / sq_norm) — same doubles as
        // the inline cosine, hoisted out of the per-pair expression.
        // Project down to (qid, id, cos) BEFORE the ranking window: the
        // window sorts whole rows within per-qid partitions, and leaving
        // the two 64-float vectors aboard made the 100×-scale sort move
        // ~550 B/candidate instead of ~24 B (measured 18× at 100× rows,
        // ~5× after the projection — ScaleEvidence deep tier)
        .select(col("qid"), col("id"),
          (VectorOps.dotD(col("qvec"), col("vec")) /
            (sqrt(col("q_norm")) * sqrt(col("sq_norm")))).as("cos"))
        .withColumn("rn", row_number().over(wRank).cast("int"))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("id").as("vec_id"), col("cos"), col("rn"))
        .orderBy("qid", "rn")
  }

  val q42 = Q(
    "q42_ann_ivf",
    (s, d) => ivfQuery(s, d),
    Some(s"""
      WITH $kmeansCentSql,
      assign AS (
        SELECT vec_id, cell FROM (
          SELECT e.vec_id, cent1.cid AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "cent1.cvec")} DESC, cent1.cid) AS crn
          FROM embeddings e CROSS JOIN cent1) t WHERE crn = 1),
      q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      probes AS (
        SELECT qid, cell FROM (
          SELECT q.qid, cent1.cid AS cell,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY ${cosSql("q.qe", "cent1.cvec")} DESC, cent1.cid) AS prn
          FROM q CROSS JOIN cent1) t WHERE prn <= $DefaultIvfProbes),
      cand AS (
        SELECT DISTINCT p.qid, a.vec_id FROM probes p
        JOIN assign a ON p.cell = a.cell WHERE a.vec_id <> p.qid)
      SELECT qid, vec_id, cos, rn FROM (
        SELECT c.qid, c.vec_id, ${cosSql("q.qe", "e.embedding")} AS cos,
          CAST(row_number() OVER (PARTITION BY c.qid
            ORDER BY ${cosSql("q.qe", "e.embedding")} DESC, c.vec_id) AS INT) AS rn
        FROM cand c
        JOIN embeddings e ON e.vec_id = c.vec_id
        JOIN q ON q.qid = c.qid) t
      WHERE rn <= 5 ORDER BY qid, rn"""),
    headline = true)

  /** The seeded SRP plane matrix — object-level so the QUERY and its
    * ORACLE derive from one definition (round 13: q43 flipped from
    * rows-only to fully graded; the oracle inlines these planes as
    * exact-decimal double literals). */
  private[graft] lazy val srpPlanes: Seq[Seq[Float]] = srpPlanesL(0)

  /** Plane matrix for table set ℓ of the MULTI-table construction (seed
    * 7 + ℓ, so set 0 IS q43's matrix — q139's tables are a superset of
    * q43's structure at any width). Cached: the 64×64 gaussian draw is
    * deterministic but not free, and the probe/evidence tools request
    * the same matrices repeatedly. */
  private val srpPlanesCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Seq[Seq[Float]]]()
  private[graft] def srpPlanesL(l: Int): Seq[Seq[Float]] =
    srpPlanesCache.computeIfAbsent(l, { k =>
      val r = new java.util.Random(7 + k)
      Seq.fill(64)(Seq.fill(64)(r.nextGaussian().toFloat))
    })

  /** Random-hyperplane (SRP) LSH near-dup: 8 tables x 8 sign bits,
    * same-bucket candidates, exact-cosine verify >= 0.45.
    *
    * FULLY GRADED as of round 13 (was rows-only): every stage is a
    * deterministic function of the seeded plane literals — sign bit p
    * is `dot(vec, plane_p) > 0` in the same left-fold doubles both
    * engines compute (q41's verified convention), bucket keys are
    * integer bit-packs of those signs, candidates are bucket equality,
    * and the verify compares identical doubles against 0.45 — so even
    * AT a boundary both engines make the same call. The oracle inlines
    * the planes as exact-decimal literals (`BigDecimal(f.toDouble)
    * .toPlainString` — the double's exact value, so DuckDB's strtod
    * reconstructs it bit-for-bit) and replays bits → buckets → join →
    * verify. The 1000-cap on buckets is inert at the graded scale
    * (max occupancy ~tens of 500 vectors over 256 buckets/table) and
    * the oracle asserts nothing about it, same as q36/q37.
    * `DedupVectorSpec` still measures recall against brute force —
    * grading pins the answer, the spec pins the quality.
    */
  val q43 = Q(
    "q43_embedding_near_dup",
    (s, d) => {
      // All 64 plane projections run in ONE codegen'd expression
      // (`vec_srp_bits`): the plane matrix is a plan-time literal, the 64
      // sign bits come back packed in a single long, and band t's bucket
      // key is an 8-bit slice of it. Neither per-plane alternative
      // survives at scale: the aggregate(zip_with(...)) HOF chain is
      // interpreted per element, and 64 separate vec_dot calls inline 64
      // loops into one whole-stage-codegen method — past the JVM's 8 KB
      // JIT limit, measured ~6x slower than even the HOF form. Planes are
      // float and seeded, so buckets stay deterministic across runs.
      val planes = srpPlanes
      // cached like q36's minhash bands: the cap's aggregate + semi-join
      // and both self-join sides consume this relation, and one side
      // feeds a BroadcastExchange so ReusedExchange can't fire — without
      // the cache the projection subplan runs 4x. O(vectors x tables)
      // rows, spillable.
      // Band width is the bucket-saturation knob (SURVEY §2.0.2's q43
      // row): buckets per table = 2^bandBits, and per-bucket occupancy —
      // hence candidate-pair generation — grows with corpus/2^bandBits.
      // 8 bits suits the graded corpus; at production density widen to
      // 16/32 (fewer, more selective tables from the same 64 packed
      // bits — recall shifts toward higher-cosine pairs, the pairs span
      // dedup actually targets). Conf: spark.graft.srp.bandBits.
      val bandBits = s.conf.getOption("spark.graft.srp.bandBits")
        .map(_.toInt).getOrElse(8)
      require(bandBits > 0 && bandBits <= 32 && 64 % bandBits == 0,
        s"srp.bandBits must divide 64 and be <= 32, got $bandBits")
      val tables = 64 / bandBits
      val mask = (1L << bandBits) - 1
      val bands = graft.Memo.cached(s, d,
        if (bandBits == 8) "srp_bands" else s"srp_bands_b$bandBits") {
        Tables.embeddings(s, d)
          .select(col("vec_id"),
            call_function("vec_srp_bits",
              col("embedding"), typedlit(planes), lit(bandBits)).as("__packed"))
          .select(col("vec_id"),
            // bits stays LONG: a 32-bit slice exceeds Int range, and the
            // ANSI int cast made the documented 32-bit knob a runtime
            // CAST_OVERFLOW (caught round 13 measuring the width ladder)
            explode(array((0 until tables).map(t =>
              struct(lit(t).as("table_idx"),
                shiftrightunsigned(col("__packed"), t * bandBits)
                  .bitwiseAND(lit(mask)).as("bits"))): _*)).as("b"))
          .select(col("vec_id"),
            col("b.table_idx").as("table_idx"), col("b.bits").as("bits"))
      }
      // same oversized-bucket guard as the text LSH paths (inert at test
      // scales, bounds per-task pair generation at 100 TB); memoized so
      // the cap's bucket-count subplan runs once, not once per join side
      val cappedBands = graft.Memo.cached(s, d,
        (if (bandBits == 8) "srp_bands" else s"srp_bands_b$bandBits") + "_capped") {
        graft.ops.DedupOps.capBuckets(bands, Seq("table_idx", "bits"), 1000)
      }
      def capped(side: String): DataFrame =
        cappedBands.select(col("vec_id").as(s"vec_$side"),
          col("table_idx"), col("bits"))
      val cands = capped("a").join(capped("b"), Seq("table_idx", "bits"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      val ea = maybeBVec(s, d, Tables.embeddings(s, d)
        .select(col("vec_id").as("vec_a"), col("embedding").as("e_a")))
      val eb = maybeBVec(s, d, Tables.embeddings(s, d)
        .select(col("vec_id").as("vec_b"), col("embedding").as("e_b")))
      cands.join(ea, "vec_a").join(eb, "vec_b")
        .withColumn("cos", VectorOps.cosine(col("e_a"), col("e_b")))
        .filter(col("cos") >= 0.45)
        .select("vec_a", "vec_b", "cos")
        .orderBy("vec_a", "vec_b")
    },
    Some {
      // exact-decimal double literals of the seeded planes (see scaladoc)
      val planesLit = srpPlanes.map(row => row.map(f =>
        new java.math.BigDecimal(f.toDouble).toPlainString)
        .mkString("[", ", ", "]")).mkString("[", ", ", "]")
      s"""
      WITH bits AS (
        SELECT e.vec_id, t.p,
          CASE WHEN list_sum([CAST(e.embedding[i] AS DOUBLE) * pl.pl[t.p][i]
                              for i in range(1, 65)]) > 0
               THEN 1 ELSE 0 END AS b
        FROM embeddings e,
             (SELECT unnest(range(1, 65)) AS p) t,
             (SELECT $planesLit AS pl) pl),
      bk AS (
        SELECT vec_id, CAST((p - 1) // 8 AS INT) AS table_idx,
          CAST(sum(b << CAST((p - 1) % 8 AS INT)) AS BIGINT) AS bits
        FROM bits GROUP BY 1, 2),
      cands AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM bk a JOIN bk b
          ON a.table_idx = b.table_idx AND a.bits = b.bits AND a.vec_id < b.vec_id)
      SELECT c.vec_a, c.vec_b, ${cosSql("ea.embedding", "eb.embedding")} AS cos
      FROM cands c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b
      WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45
      ORDER BY vec_a, vec_b"""
    },
    // headline since round 5 (annex row in BASELINE.md — the frozen
    // round-4 table is untouched): the embedding-LSH path deserves a
    // perf gate now that its projections are a custom expression
    headline = true)

  /** Conf bound for the DENSITY ROUTER: when the capped SRP band
    * relation's estimated candidate mass (Σ per-bucket c·(c−1)/2, the
    * exact pre-distinct join cardinality) exceeds this, [[srpMultiQuery]]
    * fails over to the cell-bounded semantic path instead of running the
    * band self-join. Default 10⁸ pairs — round 15's measurements put the
    * graded configuration at 16.7 k candidates at 1× and 1.36 G (595 s,
    * recall truncated 0.857 → 0.444 by the cap) at 100× density: past
    * ~10⁸ the SRP family's answer is BOTH slow and silently
    * recall-starved, which is exactly when weak-cosine dedup belongs to
    * the cell-bounded path (q78/q42's machinery). */
  private[graft] val SrpMaxCandsKey = "spark.graft.srp.maxCandidates"

  /** Conf bound for the router's MULTIPROBE escalation tier: the
    * expansion-row budget (vectors × tables × probes) the 16-bit
    * query-directed form may cost before the router falls through to
    * the cell-bounded path. The expansion stream is the escalated
    * form's dominant cost (its candidate mass is tiny — 2^16-value
    * buckets), measured ~0.8 s per ~1 M expanded rows at the 50 k/200 k
    * tiers (§2.0.2 multiprobe tables), so the 2×10⁹ default bounds the
    * escalated job at roughly half an hour — a maintenance-window cost,
    * past which (≈490 k+ vectors at the 4×-table/T=32 budget — the
    * same rows-per-vector as the old 2×/T=64 pairing)
    * the cell path is the only family member left.
    * `spark.graft.srp.escalateMultiprobe=false` skips the tier
    * entirely. */
  private[graft] val SrpMaxProbeRowsKey = "spark.graft.srp.maxProbeRows"
  private[graft] val SrpEscalateKey = "spark.graft.srp.escalateMultiprobe"

  /** Probes per band row for the escalation tier's QUERY-DIRECTED
    * multiprobe (margin-ranked prefix of the weight-≤2 neighborhood;
    * ≥ the 137-mask ball = the full flip-2 form). Default is
    * HEAP-KEYED with the table multiplier (see the router): 32 at four
    * times the query's table budget on a ≥40 GiB heap — the measured
    * recall-per-row optimum (round 18, §2.0.2: at the 200 k cliff and
    * the IDENTICAL 819 M expansion-row budget, 128 tables/T=32 reads
    * recall 0.987 where 64 tables/T=64 reads 0.948 — table diversity
    * beats probe depth at equal rows, the Indyk–Motwani amplifier
    * prediction measured both ways at two tiers) — and 64 at twice the
    * budget below it, the form measured to SURVIVE a default 8 GiB
    * heap. */
  private[graft] val SrpQdProbesKey = "spark.graft.srp.qdProbes"

  /** Conf override for the escalation tier's TABLE MULTIPLIER — the
    * heap-keyed 4×-vs-2× choice ([[qdForm]]) becomes the DEFAULT only.
    * Together with [[SrpQdProbesKey]] this pins the FULL escalated form
    * explicitly, so a routed query's candidate set and recall are
    * reproducible by configuration alone across machines with different
    * heaps (round-18 ADVICE: nothing could pin the multiplier). */
  private[graft] val SrpQdTableMultKey = "spark.graft.srp.qdTableMultiplier"

  /** Conf override (bytes) for the scratch-space budget the escalation's
    * DISK gate prices against — see [[qdScratchBudgetBytes]]. */
  private[graft] val SrpQdScratchKey = "spark.graft.srp.qdScratchBytes"

  /** Measured shuffle-scratch cost per expansion row for the escalated
    * qd form, keyed on the SHUFFLE COMPRESSION CODEC (round-19 ADVICE:
    * the single lz4 constant was conservative by ~1.6× under zstd and
    * refused escalations that fit). Two measured points:
    *  - lz4 (Spark's default `spark.io.compression.codec`): round-18
    *    §2.0.2 calibration — the 128-table/T=64 rung at 200 k vectors
    *    = 1.638 G expansion rows died at ENOSPC with ~77 GB written
    *    → ~47 B/row, rounded up to 48;
    *  - zstd: round-19 per-task instrumentation
    *    (`SrpMultiProbe --calibrate`) measured 28.6–29.0 B/row at the
    *    50 k 32/128-table rungs → 32, still rounded up.
    * Unknown codecs take the larger lz4 constant — over-refusing is
    * the safe direction for an ENOSPC gate. The dominant term is the
    * expansion join's shuffle spill — slim (vec_a, table_idx, bits)
    * rows, but written once per sort pass on both the expansion and
    * distinct exchanges. */
  private[graft] def qdScratchBytesPerRow(codec: String): Long =
    // contains, not equals: spark.io.compression.codec legally holds the
    // short name OR the fully-qualified class name
    // (org.apache.spark.io.ZstdCompressionCodec) — an exact match would
    // silently price a zstd cluster at the lz4 constant
    if (codec.toLowerCase.contains("zstd")) 32L else 48L

  /** The JVM heap the escalated form's hash builds will actually get —
    * the EXECUTOR's, because the OOM this key guards against is
    * executor-side (134–165 MB dedicated hash-map pages × tasks in the
    * 128-table build, captured round 18). In local mode the driver JVM
    * IS the executor, so `Runtime.maxMemory` is exact — every measured
    * configuration. On a real cluster the planner runs on the driver
    * and its own heap is irrelevant: the key reads
    * `spark.executor.memory` (the executor JVM's -Xmx; Spark's default
    * 1g when unset). Round-19 fix — the round-18 form read
    * `Runtime.maxMemory` unconditionally, so a 64 g-driver/8 g-executor
    * deployment would have shipped the measured-OOM form and an
    * 8 g-driver/64 g-executor one silently forfeited 0.04 recall. */
  private[graft] def qdEffectiveHeapBytes(master: String,
      executorMemory: Option[String], runtimeMax: Long): Long =
    // `local-cluster[n,c,mem]` is NOT local for this purpose: its
    // executors are separate JVMs sized independently of the driver —
    // exactly the split this key exists to respect
    if (master.startsWith("local") && !master.startsWith("local-cluster"))
      runtimeMax
    else org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
      executorMemory.getOrElse("1g"))

  /** The escalated form — (table multiplier, probes per band row) — for
    * an effective executor heap, with conf overrides applied. Pure so
    * VecProbeSpec pins BOTH cluster regimes without a second JVM: the
    * (4×, T=32) pairing is the measured recall-per-row optimum (0.987
    * at the 200 k cliff) but its 128-table hash builds measured-OOM an
    * 8 GiB heap, while (2×, T=64) is measured-survivable there (0.948);
    * the boundary sits above the failing point with margin. */
  private[graft] def qdForm(effectiveHeap: Long, confMult: Option[Int],
      confProbes: Option[Int]): (Int, Int) = {
    // loud on nonsense overrides: a zero/negative multiplier or T would
    // silently produce an empty probe stream (recall 0, no error)
    confMult.foreach(m => require(m > 0,
      s"$SrpQdTableMultKey must be positive, got $m"))
    confProbes.foreach(t => require(t > 0,
      s"$SrpQdProbesKey must be positive, got $t"))
    val bigHeap = effectiveHeap >= (40L << 30)
    (confMult.getOrElse(if (bigHeap) 4 else 2),
      confProbes.getOrElse(if (bigHeap) 32 else 64))
  }

  /** The scratch budget the escalated tier's expansion shuffle must fit
    * (the HEAP lesson applied to disk — round-18 measured the dense
    * 128-table/T=64 rung dying at ENOSPC, ~77 GB on a 78 GB disk, with
    * nothing gating it: a user raising [[SrpQdProbesKey]] re-created the
    * death). In local mode the budget is the measured usable space of
    * the shuffle dirs (`spark.local.dir`, default java.io.tmpdir) — the
    * JVM writing the spill is THIS one. On a real cluster executor
    * disks parallelize the scratch (exactly the resource the single-node
    * ceiling identified), and the driver's own disk says nothing about
    * them — so the default is unbounded and [[SrpQdScratchKey]] is the
    * explicit per-deployment bound. */
  private[graft] def qdScratchBudgetBytes(s: SparkSession): Long =
    s.conf.getOption(SrpQdScratchKey).map(_.toLong).getOrElse {
      if (!s.conf.get("spark.master", "local").startsWith("local"))
        Long.MaxValue
      else {
        val dirs = s.conf.getOption("spark.local.dir")
          .orElse(sys.env.get("SPARK_LOCAL_DIRS"))
          .getOrElse(System.getProperty("java.io.tmpdir"))
          .split(",").map(_.trim).filter(_.nonEmpty).distinct
        usableSpaceByStore(dirs)
      }
    }

  /** Sum of usable space across `dirs`, counted ONCE per underlying
    * FILESYSTEM (round-19 ADVICE: two `spark.local.dir` entries on the
    * same volume double-counted its free space, inflating the budget
    * and letting the disk gate re-admit the ENOSPC form it exists to
    * block — `getUsableSpace` reports the STORE's free bytes, not the
    * directory's share). A dir that does not exist yet (Spark creates
    * local dirs lazily) resolves through its deepest existing ancestor;
    * a store that cannot be resolved at all contributes 0 — under-
    * counting is the safe direction for an ENOSPC gate. */
  private[graft] def usableSpaceByStore(dirs: Seq[String]): Long =
    dirs.flatMap { p =>
      var f = new java.io.File(p).getAbsoluteFile
      while (f != null && !f.exists()) f = f.getParentFile
      if (f == null) None
      else
        // FileStore.toString is "mountpoint (device)" — distinct per
        // mount even when devices share a name (multiple tmpfs mounts)
        try Some(java.nio.file.Files.getFileStore(f.toPath).toString ->
          f.getUsableSpace)
        catch { case scala.util.control.NonFatal(_) => None }
    }.toMap.values.sum

  /** Non-blocking memo fill for the per-corpus verdict maps below:
    * `computeIfAbsent` holds the hash bin's lock for the mapping
    * function's whole duration, and these fills run FULL SPARK JOBS — a
    * concurrent caller hashing to the same bin would stall behind the
    * job (and ConcurrentHashMap documents mapping functions "short and
    * simple"). Compute OUTSIDE the map instead: at worst two concurrent
    * callers duplicate one bounded aggregate, and `putIfAbsent` keeps
    * the first verdict so every caller agrees. */
  private def memoFill[K, V <: AnyRef](
      map: java.util.concurrent.ConcurrentHashMap[K, V], k: K)(
      compute: => V): V = {
    val hit = map.get(k)
    if (hit != null) hit
    else {
      val v = compute
      val prev = map.putIfAbsent(k, v)
      if (prev != null) prev else v
    }
  }

  private val srpCandEst =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), java.lang.Long]()
  /** Memoized "no bucket exceeds the cap" verdicts for the qd path's cap
    * elision — per (session, corpus, band tag), same immutable-corpus
    * convention as [[srpCandEst]]/[[embCount]]. */
  private val srpCapNoop =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String, String), java.lang.Boolean]()
  /** Memoized corpus cardinality for the escalation gate's probe-row
    * pricing — without it every escalated call pays a full embeddings
    * count scan, in exactly the large-corpus regime the tier exists
    * for. Per-(session, corpus) bounded, like [[srpCandEst]] — and it
    * SHARES srpCandEst's immutable-corpus-per-dir convention: a corpus
    * regenerated in place under the same dir within one session would
    * price the gate on the stale count (and serve stale candidate
    * estimates anyway). Writers that regenerate use a fresh dir
    * (ScaleEvidence keys replicated corpora by factor in the path). */
  private val embCount =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Long]()
  private val log = org.apache.logging.log4j.LogManager.getLogger(getClass)

  /** q139's body with width and table count as parameters — the graded
    * query pins one (bandBits, L) point; `tools.SrpMultiProbe` sweeps L
    * at each width to record the recall-vs-L curve beside the width
    * ladder (SURVEY §2.0.2). Same cap-join-verify pipeline as q43, over
    * [[VectorOps.srpBandsMulti]]'s L-matrix band relation.
    *
    * DENSITY-ROUTED: before the band self-join runs, the capped
    * relation's per-bucket occupancy (one bounded aggregate over the
    * memoized bands, itself memoized per corpus) prices the candidate
    * union exactly; past [[SrpMaxCandsKey]] the query routes to
    * [[cellBoundedPairs]] with the trade logged. Round 15 measured the
    * cliff this guard encodes — at 100× density the graded (8-bit, L=4,
    * cap-1000) point costs 595 s for recall 0.444, with no in-family
    * (width, L, cap) escape — and concluded in prose that the
    * cell-bounded path owns that regime; this puts the conclusion in
    * the operator. The graded 1×/bench densities sit orders of
    * magnitude under the default bound, so oracle-graded plans are
    * untouched (PlanSpec pins both sides). */
  private[graft] def srpMultiQuery(s: SparkSession, d: String,
      bandBits: Int, numMatrices: Int): DataFrame = {
    val planesL = (0 until numMatrices).map(srpPlanesL)
    val tag = s"srp_multi_b${bandBits}_L$numMatrices"
    val bands = graft.Memo.cached(s, d, tag) {
      VectorOps.srpBandsMulti(Tables.embeddings(s, d), "vec_id", "embedding",
        planesL, bandBits)
    }
    val capped = graft.Memo.cached(s, d, tag + "_capped") {
      graft.ops.DedupOps.capBuckets(bands, Seq("table_idx", "bits"), 1000)
    }
    val bound = s.conf.getOption(SrpMaxCandsKey).map(_.toLong)
      .getOrElse(100000000L)
    val est: Long = memoFill(srpCandEst, (s, d, tag)) {
      val row = capped.groupBy("table_idx", "bits")
        .agg(count(lit(1)).as("c"))
        .agg(sum(expr("c * (c - 1) div 2"))).head()
      Long.box(if (row.isNullAt(0)) 0L else row.getLong(0))
    }
    if (est > bound) {
      // ESCALATION TIER (round 17, measured at §2.0.2's multiprobe
      // table): before conceding the density to the recall-poor cell
      // fallback, try the width+multiprobe point — 16-bit codes at the
      // SAME table budget (w 8→16 halves tables per matrix, so 2L
      // matrices keep tables = L·64/8 constant) with flip-2 Hamming-ball
      // probes buying the recall exact 16-bit matching loses. At the
      // 200 k-vector tier where the 8-bit join reads 595 s / recall
      // 0.444 (cap-truncated), this form reads 1 812 s / recall 0.808;
      // the cell path reads ~1 s / 0.062. The escalated form's cost is
      // the probe-expansion stream, priced below against its own bound.
      // The escalated form (round 18 measurements, §2.0.2's default-heap
      // table): 16-bit codes at FOUR times the query's table budget with
      // T=32 margin-ranked probes per band, pairs normalized
      // least/greatest (either side's probes may discover the pair). The
      // (4×, 32) pairing is the measured recall-per-row optimum: at the
      // 200k cliff and the IDENTICAL 819 M expansion-row budget it reads
      // recall 0.987 where (2×, 64) reads 0.948 — table diversity beats
      // probe depth at equal rows, measured both ways at two tiers
      // (§2.0.2). The round-17 form needed a 48 g driver; the round-18
      // restructure (slim-only caching, cap elision) runs the tier at
      // the DEFAULT 8 GiB heap, spill-bound — and what extra heap buys
      // under this form is RECALL, not wall (measured: 2×/T=64 reads
      // 1 384 s at 8 g vs 1 151 s at 48 g — the shuffle pipeline is
      // disk-bound either way; the heap-keyed 4×/T=32 upgrade spends
      // the same rows for 0.987). The full flip-2 ball at 1× tables
      // reads 1 812 s / 0.808 (48 g) for MORE expansion rows
      // (vectors·tables·137 vs vectors·4tables·32), so the qd form
      // dominates it on probe rows and recall simultaneously.
      // spark.graft.srp.qdProbes tunes T (>= the 137-mask ball = the
      // full flip-2 form).
      val tables = numMatrices * 64 / bandBits
      val escalate = s.conf.getOption(SrpEscalateKey).forall(_.toBoolean)
      val probeBudget = s.conf.getOption(SrpMaxProbeRowsKey).map(_.toLong)
        .getOrElse(2000000000L)
      // FORM SELECTION IS HEAP-KEYED (round 18; round 19 made the key
      // CLUSTER-CORRECT and conf-pinnable): the (4×-table, T=32) pairing
      // wins on recall-per-row at the identical expansion budget (0.987
      // vs 0.948 at the 200 k cliff), but its 128-table hash builds were
      // MEASURED to OOM a default 8 GiB heap (134–165 MB dedicated
      // hash-map pages × 32 tasks), while the (2×, T=64) form is
      // measured-survivable there (1 384 s / 0.948 at 8 g) and the
      // (4×, 32) form is measured-good at 48 g (1 217 s / 0.987).
      // Shipping the optimum unconditionally would recreate the
      // round-17 default-heap OOM this router exists to prevent, so the
      // form keys on the heap the EXECUTORS actually have
      // ([[qdEffectiveHeapBytes]] — the hash builds are executor-side;
      // `spark.executor.memory` when the master is not local, this JVM
      // otherwise), boundary above the measured-failing point with
      // margin. spark.graft.srp.qdTableMultiplier / qdProbes pin the
      // full form explicitly (reproducibility across heaps). probeRows
      // is identical for both default pairings, so the budget gate is
      // form-blind.
      val effHeap = qdEffectiveHeapBytes(s.conf.get("spark.master", "local"),
        s.conf.getOption("spark.executor.memory"),
        Runtime.getRuntime.maxMemory())
      val (qdMult, qdProbes) = qdForm(effHeap,
        s.conf.getOption(SrpQdTableMultKey).map(_.toInt),
        s.conf.getOption(SrpQdProbesKey).map(_.toInt))
      val escTables = qdMult * tables
      val perRow = math.min(qdProbes, srpFlipMasks(16, 2).size)
      val probeRows =
        if (!escalate) Long.MaxValue
        else memoFill(embCount, (s, d))(
          Long.box(Tables.embeddings(s, d).count())) * escTables * perRow
      // DISK GATE (round 19): the expansion shuffle's spill must also
      // FIT — the 128-table/T=64 rung died twice at ENOSPC (~77 GB
      // scratch on a 78 GB disk, §2.0.2) and nothing guarded it; a user
      // raising qdProbes re-created the death. Same shape as the row
      // budget: divide (not multiply) so the !escalate sentinel can't
      // overflow. Budget semantics in [[qdScratchBudgetBytes]].
      val scratchBudget = qdScratchBudgetBytes(s)
      val shuffleCodec = s.conf.get("spark.io.compression.codec", "lz4")
      val scratchPerRow = qdScratchBytesPerRow(shuffleCodec)
      val fitsScratch = probeRows <= scratchBudget / scratchPerRow
      if (escalate && probeRows <= probeBudget && fitsScratch) {
        log.warn(s"SRP density router: estimated candidate mass $est exceeds " +
          s"$SrpMaxCandsKey=$bound for corpus $d — escalating to the " +
          s"16-bit query-directed multiprobe form ($escTables tables = " +
          s"${qdMult}x the query's budget, T=$perRow margin-ranked probes; " +
          s"$probeRows expansion rows <= $SrpMaxProbeRowsKey=$probeBudget, " +
          s"~${probeRows * scratchPerRow >> 30} GiB scratch at " +
          s"$scratchPerRow B/row ($shuffleCodec) <= " +
          s"budget ${scratchBudget >> 30} GiB). Measured trades at 200k " +
          "vectors: (4x, T=32) = recall 0.987 at 1217 s on a >=40g heap; " +
          "(2x, T=64) = recall 0.948 at 1384 s at the default 8g, " +
          "spill-bound — vs the 8-bit join's 595 s / 0.444 (cap-" +
          "truncated) and the full flip-2 ball's 1812 s / 0.808. Set " +
          s"$SrpEscalateKey=false to route straight to the cell-bounded " +
          s"path; $SrpQdTableMultKey/$SrpQdProbesKey pin the form.")
        srpMultiProbePairs(s, d, bandBits = 16,
          numMatrices = math.max(1, escTables * 16 / 64), flipRadius = 2,
          maxProbes = perRow)
      } else {
        log.warn(s"SRP density router: estimated candidate mass $est exceeds " +
          s"$SrpMaxCandsKey=$bound for corpus $d" +
          (if (escalate && probeRows > probeBudget)
            s" and the multiprobe escalation's $probeRows expansion rows " +
              s"exceed $SrpMaxProbeRowsKey=$probeBudget" else "") +
          (if (escalate && !fitsScratch)
            s" and the escalation's estimated shuffle scratch " +
              s"(~${probeRows * scratchPerRow >> 30} GiB at " +
              s"$scratchPerRow B/row, codec $shuffleCodec) exceeds the " +
              s"${scratchBudget >> 30} GiB budget ($SrpQdScratchKey; the " +
              "measured ENOSPC class this gate exists for)" else "") +
          " — the SRP family is past its measured feasibility point at this " +
          "density. Routing to the cell-bounded semantic path; raise the " +
          "bounds to force an SRP form.")
        cellBoundedPairs(s, d, tau = 0.45)
      }
    } else {
      def side(n: String): DataFrame =
        capped.select(col("vec_id").as(s"vec_$n"), col("table_idx"), col("bits"))
      val cands = side("a").join(side("b"), Seq("table_idx", "bits"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct()
      srpCosVerify(s, d, cands)
    }
  }

  /** The SRP family's shared exact-cosine verify over a candidate-pair
    * relation: broadcast-guarded embedding joins (`maybeBVec`), cos ≥
    * 0.45, canonical output shape. One definition so the exact-match and
    * multiprobe candidate generators cannot diverge on the verify. */
  private def srpCosVerify(s: SparkSession, d: String,
      cands: DataFrame): DataFrame = {
    val ea = maybeBVec(s, d, Tables.embeddings(s, d)
      .select(col("vec_id").as("vec_a"), col("embedding").as("e_a")))
    val eb = maybeBVec(s, d, Tables.embeddings(s, d)
      .select(col("vec_id").as("vec_b"), col("embedding").as("e_b")))
    cands.join(ea, "vec_a").join(eb, "vec_b")
      .withColumn("cos", VectorOps.cosine(col("e_a"), col("e_b")))
      .filter(col("cos") >= 0.45)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  /** All XOR masks of Hamming weight ≤ `radius` over `bits`-bit codes —
    * the multiprobe neighborhood (Lv et al. 2007's multi-probe LSH,
    * specialized to sign-random-projection bands: a near pair's codes
    * differ in FEW bits, so probing the Hamming ball recovers the pairs
    * a single exact-bucket lookup loses to one flipped bit). */
  private[graft] def srpFlipMasks(bits: Int, radius: Int): Seq[Long] = {
    require(radius >= 1 && radius <= 2, s"unsupported flip radius $radius")
    val one = (0 until bits).map(i => 1L << i)
    val two = if (radius < 2) Seq.empty else
      for { i <- 0 until bits; j <- (i + 1) until bits } yield (1L << i) | (1L << j)
    (0L +: one) ++ two
  }

  /** MULTIPROBE SRP near-dup pairs: the q139 candidate generator with the
    * exact-bucket equality relaxed to a Hamming ball — the probe side
    * expands each capped band row into its ≤`flipRadius`-flip code
    * variants and joins the unexpanded side, so a pair collides in a
    * table iff its codes there differ in at most `flipRadius` bits. Same
    * cap, same exact verify, same output shape as [[srpMultiQuery]]'s
    * join form.
    *
    * The trade this buys (SURVEY §2.0.2 measures it at the 100×-density
    * tier): per-table collision probability rises from p^w to
    * Σ_{k≤r} C(w,k) p^(w−k) (1−p)^k, so WIDER bands — whose tiny bucket
    * occupancy makes the join itself cheap but whose exact-match recall
    * on weak-cosine targets is ~zero — become usable: width prices the
    * join, the flip radius buys the recall back. The candidate mass
    * multiplies by at most the probe count (9 at w=8/r=1, 137 at
    * w=16/r=2) but over buckets ~2^w sparser. */
  private[graft] def srpMultiProbePairs(s: SparkSession, d: String,
      bandBits: Int, numMatrices: Int, flipRadius: Int,
      maxProbes: Int = Int.MaxValue): DataFrame = {
    val planesL = (0 until numMatrices).map(srpPlanesL)
    if (maxProbes < srpFlipMasks(bandBits, 2).size) {
      // QUERY-DIRECTED tier (Lv et al. 2007 §4.2): instead of the whole
      // Hamming ball, each band row carries only its `maxProbes` most
      // probable flips — ranked per vector by the hyperplane margins of
      // the flipped bits (graft.expressions.VecSrpProbeMasks), so the
      // expansion stream (the escalated form's dominant cost) shrinks by
      // ball/maxProbes while keeping the probes that find near pairs.
      // The flipRadius arg is subsumed: the neighborhood is weight <= 2
      // and maxProbes truncates it.
      // CACHE ONLY SLIM RELATIONS (round 18 — the default-heap fix
      // behind SURVEY §2.0.2's old 48g footnote): the round-17 form
      // memoized the probed relation itself — corpus×tables rows each
      // carrying a T-long probe array (~530 B/row of UnsafeArrayData) —
      // and at the 200k/64-table tier the cache builder's columnar
      // batches alone OOM'd an 8 GiB local[32] JVM (ColumnBuilder
      // .ensureFreeSpace in the captured stack), at ANY storage level,
      // because in local mode the "executor" heap IS the driver heap.
      // Now the cached relations are the 3-long-column band/capped-band
      // relations the full-ball branch below already memoizes (SHARED
      // tags, so the qd and ball forms reuse one cache), the probe
      // masks are computed in ONE fresh streaming pass that feeds the
      // expansion join's shuffle directly (never materialized, never
      // cached), and the cap reaches the probe side by a semi-join on
      // the slim (vec_id, table_idx, bits) key — identical candidate
      // semantics, heap cost flat in corpus density.
      val tag = s"srp_multi_b${bandBits}_L$numMatrices"
      val bands = graft.Memo.cached(s, d, tag) {
        VectorOps.srpBandsMulti(Tables.embeddings(s, d), "vec_id",
          "embedding", planesL, bandBits)
      }
      // CAP ELISION (round 18, after the 128-table disk-ceiling deaths):
      // when NO bucket exceeds the cap — the common case at the 16-bit
      // width, where occupancy is corpus/2^16 per table — capBuckets is
      // the identity, so both its count+semi-join shuffle AND the
      // probe-side cap semi-join (which must shuffle the T-long probe
      // ARRAYS, ~550 B/row) are pure disk cost for nothing. One bounded
      // aggregate over the memoized slim bands decides (memoized per
      // corpus like srpCandEst); when a bucket IS overfull both sides
      // keep the full cap discipline unchanged.
      val capNoop: Boolean = memoFill(srpCapNoop, (s, d, tag))(
        java.lang.Boolean.valueOf(
          bands.groupBy("table_idx", "bits").agg(count(lit(1)).as("c"))
            .filter(col("c") > 1000).isEmpty))
      val capped =
        if (capNoop) bands
        else graft.Memo.cached(s, d, tag + "_capped") {
          graft.ops.DedupOps.capBuckets(bands, Seq("table_idx", "bits"), 1000)
        }
      val probedRaw = VectorOps.srpBandsMultiProbed(Tables.embeddings(s, d),
        "vec_id", "embedding", planesL, bandBits, maxProbes)
      val probe = (if (capNoop) probedRaw
        else probedRaw.join(capped, Seq("vec_id", "table_idx", "bits"),
          "left_semi"))
        .select(col("vec_id").as("vec_a"), col("table_idx"),
          explode(transform(col("probes"), m => col("bits").bitwiseXOR(m)))
            .as("bits"))
      // normalize with least/greatest, do NOT pre-filter on vec_a <
      // vec_b: unlike the full-ball form (uniform masks make probing
      // symmetric, so the a<b filter loses nothing), qd probe sets are
      // PER-VECTOR — a pair counts when EITHER side's probe prefix
      // reaches the other's exact bucket, and keeping only the
      // smaller-id side's discoveries threw away roughly half the
      // matches for the identical expansion-row budget (round-18 fix;
      // measured below in §2.0.2's qd tables).
      val cands = probe
        .join(capped.select(col("vec_id").as("vec_b"), col("table_idx"),
          col("bits")), Seq("table_idx", "bits"))
        .filter(col("vec_a") =!= col("vec_b"))
        .select(least(col("vec_a"), col("vec_b")).as("vec_a"),
          greatest(col("vec_a"), col("vec_b")).as("vec_b"))
        .distinct()
      return srpCosVerify(s, d, cands)
    }
    val tag = s"srp_multi_b${bandBits}_L$numMatrices"
    val bands = graft.Memo.cached(s, d, tag) {
      VectorOps.srpBandsMulti(Tables.embeddings(s, d), "vec_id", "embedding",
        planesL, bandBits)
    }
    val capped = graft.Memo.cached(s, d, tag + "_capped") {
      graft.ops.DedupOps.capBuckets(bands, Seq("table_idx", "bits"), 1000)
    }
    val masks = srpFlipMasks(bandBits, flipRadius)
    val probe = capped.select(col("vec_id").as("vec_a"), col("table_idx"),
        col("bits"), explode(lit(masks.toArray)).as("flip_mask"))
      .select(col("vec_a"), col("table_idx"),
        col("bits").bitwiseXOR(col("flip_mask")).as("bits"))
    val cands = probe
      .join(capped.select(col("vec_id").as("vec_b"), col("table_idx"),
        col("bits")), Seq("table_idx", "bits"))
      .filter(col("vec_a") < col("vec_b"))
      .select("vec_a", "vec_b").distinct()
    srpCosVerify(s, d, cands)
  }

  /** The density router's fail-over target: within-cell exact-cosine
    * pairs over the two-level coarse assignment (q78's deep-tier
    * machinery — cost bounded by Σ per-cell n², independent of band
    * occupancy). Recall is bounded by cell co-residency instead of the
    * candidate cap: approximate exactly where the quantizer is (cell
    * routing), exact inside. Same output shape as the SRP form. */
  private[graft] def cellBoundedPairs(s: SparkSession, d: String,
      tau: Double): DataFrame = {
    val assigned = semanticCellsCoarse(s, d)
    def half(n: String) = assigned.select(col("cell"),
      col("id").as(s"vec_$n"), col("vec").as(s"${n}_vec"),
      col("sq_norm").as(s"${n}_norm"))
    half("a").join(half("b"), "cell")
      .filter(col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorOps.cosineWithNorms(
        VectorOps.dotD(col("a_vec"), col("b_vec")),
        col("a_norm"), col("b_norm")))
      .filter(col("cos") >= tau)
      .select("vec_a", "vec_b", "cos")
      .orderBy("vec_a", "vec_b")
  }

  /** q139's graded configuration: 4 independent 64-plane matrices at the
    * 8-bit width = 32 tables. Chosen on `SrpMultiProbe` measurement at
    * sf0.01 (14 exact cos ≥ 0.45 pairs): recall 0.857 at L=4 vs q43's
    * single-set 0.286, with candidates growing linearly in L
    * (4 478 → 16 695). The measured refutation that sits beside it: at
    * the 16-bit width NO feasible L reaches the 8-bit floor on this
    * corpus — L=16 (64 tables) still finds ZERO of the 14 pairs at only
    * 247 candidates, because a weak-cosine pair's per-table collision
    * probability p^16 ≈ 10⁻³ makes the union amplifier hopeless where
    * p^8 ≈ 3 % makes it work. So width is the COST knob and L the
    * RECALL knob at a width where targets are still reachable — the
    * production pairing is (8-bit, L≈4), not (16-bit, any L), for
    * dedup-grade thresholds. */
  private val SrpMultiSets = 4

  /** MULTI-TABLE SRP-LSH near-dup — the L-table recall amplifier
    * (Indyk–Motwani) the width ladder proves width cannot replace:
    * [[SrpMultiSets]] independent seeded plane matrices × 8 tables
    * each, union of candidates (any-table collision), exact-cosine
    * verify ≥ 0.45. FULLY HASH-GRADED by q43's convention: all four
    * matrices inline into the oracle as exact-decimal double literals,
    * and every stage — sign bits, bucket packs, union join, verify —
    * is the same deterministic function of them in both engines.
    * `SrpMultiProbe` records the recall-vs-L curve (SURVEY §2.0.2);
    * `DedupVectorSpec` pins the measured recall floor.
    *
    * Shape at scale: one fused projection stage computes all L packed
    * signatures (L small codegen loops — far under the JIT-limit
    * failure the per-plane form hit), the band relation is
    * O(vectors × 32) rows, and everything downstream is q43's
    * cap-join-verify pipeline with the same 1000-cap bucket bound. */
  val q139 = Q(
    "q139_srp_multi_lsh",
    (s, d) => srpMultiQuery(s, d, bandBits = 8, numMatrices = SrpMultiSets),
    Some {
      val planesLit = (0 until SrpMultiSets).map(l => srpPlanesL(l).map(row =>
        row.map(f => new java.math.BigDecimal(f.toDouble).toPlainString)
          .mkString("[", ", ", "]")).mkString("[", ", ", "]"))
        .mkString("[", ", ", "]")
      s"""
      WITH bits AS (
        SELECT e.vec_id, l.l, t.p,
          CASE WHEN list_sum([CAST(e.embedding[i] AS DOUBLE) * pl.pls[l.l][t.p][i]
                              for i in range(1, 65)]) > 0
               THEN 1 ELSE 0 END AS b
        FROM embeddings e,
             (SELECT unnest(range(1, ${SrpMultiSets + 1})) AS l) l,
             (SELECT unnest(range(1, 65)) AS p) t,
             (SELECT $planesLit AS pls) pl),
      bk AS (
        SELECT vec_id, CAST((l - 1) * 8 + (p - 1) // 8 AS INT) AS table_idx,
          CAST(sum(b << CAST((p - 1) % 8 AS INT)) AS BIGINT) AS bits
        FROM bits GROUP BY 1, 2),
      cands AS (
        SELECT DISTINCT a.vec_id AS vec_a, b.vec_id AS vec_b
        FROM bk a JOIN bk b
          ON a.table_idx = b.table_idx AND a.bits = b.bits AND a.vec_id < b.vec_id)
      SELECT c.vec_a, c.vec_b, ${cosSql("ea.embedding", "eb.embedding")} AS cos
      FROM cands c
      JOIN embeddings ea ON ea.vec_id = c.vec_a
      JOIN embeddings eb ON eb.vec_id = c.vec_b
      WHERE ${cosSql("ea.embedding", "eb.embedding")} >= 0.45
      ORDER BY vec_a, vec_b"""
    },
    headline = true)

  /** Spherical k-means (2 Lloyd rounds) over the embedding corpus —
    * embedding clustering as a training-data-pipeline operator (topic
    * bucketing / diversity sampling / IVF centroid TRAINING: these
    * centroids are exactly what q42's index should probe at scale).
    *
    * Hash-exact graded even though k-means is float-iterative, because
    * every step is engine-portable by construction: assignments are the
    * same broadcast argmax q42 grades; centroid means run on
    * [[VectorOps.kmeansUpdate]]'s quantized integers (floor(v*2^40) —
    * exact scaling, tie-free floor, associative integer sums), so no
    * shuffle order and no engine's summation tree can move a single bit.
    * A decimal-cast mean was measured non-portable first (30 665 / 32 000
    * corpus values diverge — see KmeansQuantBits).
    */
  private[graft] def kmeansQuery(s: SparkSession, d: String,
      idCap: Long = Long.MaxValue): DataFrame = {
    val seeds = fifties(s, d, idCap)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    VectorOps.kmeans(corpus(s, d), seeds, iters = 2)
      .select(col("id").as("vec_id"), col("cell"))
      .orderBy("vec_id")
  }

  val q59 = Q(
    "q59_kmeans_lloyd",
    (s, d) => kmeansQuery(s, d),
    Some(s"""
      WITH $kmeansCentSql
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, c.cid AS cell,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY ${cosSql("e.embedding", "c.cvec")} DESC, c.cid) AS rn
        FROM embeddings e CROSS JOIN cent1 c) t WHERE rn = 1
      ORDER BY vec_id"""),
    // headline since round 8 (annex row in BASELINE.md; frozen table
    // untouched) — the iterative broadcast-argmax assignment loop is
    // join-heavy and was previously gate-invisible
    headline = true)

  /** IVF-PQ — the memory-scale ANN path: the probed-cell candidates are
    * scored from 8 product-quantization code bytes per vector (ADC table
    * lookups, never a 64-dim product), and only the shortlist (top-100 by
    * approximate cosine — the recall/cost knob; a real prune once cells
    * hold thousands) touches full vectors for the exact re-rank. At 100 TB
    * the encoded
    * index (codes + norm, ~12 bytes/vector) is what stays resident; q42's
    * plain IVF re-ranks EVERY candidate against full vectors.
    *
    * Deterministic end to end (sampled codebooks, total argmin/argmax
    * orderings, decimal ADC sums) — but approximation error vs the exact
    * answer is corpus-dependent, so like q43 it grades rows-only; the
    * recall floor vs brute force is `DedupVectorSpec`'s job.
    *
    * Index relations (codebook, cell assignment, codes) ride [[graft.Memo]]
    * — they are THE index; rebuild-per-query would charge every search
    * with an O(corpus) encode.
    */
  private[graft] def ivfpqQuery(s: SparkSession, d: String,
      idCap: Long = Long.MaxValue, memoSuffix: String = ""): DataFrame = {
      val M = 8; val SubDim = 8
      // same Lloyd-trained cells as q42 — one shared Memo-cached index
      val cents = trainedCents(s, d, idCap)
      val samplesBase = Tables.embeddings(s, d).filter(col("vec_id") % 13 === 0)
      val samples = (if (idCap == Long.MaxValue) samplesBase
        else samplesBase.filter(col("vec_id") < idCap))
        .select(col("vec_id").as("id"), col("embedding").as("vec"))
      val codebook = graft.Memo.cached(s, d, "pq_codebook" + memoSuffix) {
        VectorOps.pqCodebook(samples, M, SubDim)
      }
      val assigned = graft.Memo.cached(s, d, "pq_cells" + memoSuffix) {
        VectorOps.ivfAssign(corpus(s, d), cents).drop("vec")
      }
      val encoded = graft.Memo.cached(s, d, "pq_codes" + memoSuffix) {
        VectorOps.pqEncode(corpus(s, d), codebook, M, SubDim)
      }
      val wProbe = Window.partitionBy("qid").orderBy(col("pcos").desc, col("cid"))
      val nProbes = probeCount(s)
      val probes = queries(s, d)
        .crossJoin(broadcast(cents))
        .withColumn("pcos", VectorOps.cosine(col("qvec"), col("cvec")))
        .withColumn("prn", row_number().over(wProbe))
        .filter(col("prn") <= nProbes)
        .select("qid", "cid")
      val qtab = VectorOps.pqQueryTable(queries(s, d), codebook, M, SubDim)
      val cand = assigned
        .join(broadcast(probes), col("cid") === col("cell"))
        .filter(col("id") =!= col("qid"))
      val adc = cand
        .join(encoded, "id")
        .select(col("qid"), col("id"),
          posexplode(col("codes")).as(Seq("sub_idx", "code")))
        .join(broadcast(qtab), Seq("qid", "sub_idx", "code"))
        .groupBy("qid", "id")
        .agg(Det.dsum(col("pdot")).as("adc"), Det.dsum(col("ncb")).as("recon"))
      // approximate cosine = dot(q, x̂) / (|q| |x̂|): |q| is constant per
      // query (rank-neutral) and |x̂|² sums exactly from the codebook
      //
      // Re-rank depth scales with the PROBED CANDIDATE POOL, not a fixed
      // 100: at fixed k the pool is probes·N/k, and a constant shortlist
      // shrinks to a sliver of it under densification — measured recall@5
      // 0.48 → 0.28 from 10× to 100× (SURVEY §2.0.2) because the 8-byte
      // ADC ranking cannot separate the near-tied code classes replication
      // creates, so the true top-5 fell outside a fixed top-100. Half the
      // expected pool keeps the ADC stage a real 2× prune while covering
      // the tie classes; both counts are driver-side scalars over
      // Memo-persisted relations (assigned) / the tiny centroid set, the
      // q68 bounded-action posture. At the graded (sf0.01: 150-row pool)
      // and benched (sf0.1: 150-row pool) scales the floor of 100 is the
      // binding term, so this changes nothing there by construction.
      val nCorpus = assigned.count()
      val kCents = math.max(cents.count(), 1L)
      val shortlistK = math.max(100L, (nProbes.toLong * nCorpus) / (2L * kCents)).toInt
      val wShort = Window.partitionBy("qid").orderBy(
        (col("adc") / sqrt(col("recon"))).desc, col("id"))
      val shortlist = adc
        .withColumn("srn", row_number().over(wShort))
        .filter(col("srn") <= shortlistK)
        .select("qid", "id")
      val wRank = Window.partitionBy("qid").orderBy(col("cos").desc, col("id"))
      shortlist
        .join(corpus(s, d), "id")
        .join(broadcast(queries(s, d).withColumn("q_norm", VectorOps.sqNormD(col("qvec")))), "qid")
        .withColumn("cos",
          VectorOps.dotD(col("qvec"), col("vec")) /
            (sqrt(col("q_norm")) * sqrt(VectorOps.sqNormD(col("vec")))))
        .withColumn("rn", row_number().over(wRank).cast("int"))
        .filter(col("rn") <= 5)
        .select(col("qid"), col("id").as("vec_id"), col("cos"), col("rn"))
        .orderBy("qid", "rn")
  }

  /** q66's DuckDB mirror (round 13 — the LAST rows-only query flips to
    * fully graded): every stage of the PQ pipeline is a deterministic
    * function of the corpus, so the oracle replays it — q42's
    * cent1/assign/probes CTEs, the sample codebook (codes dense in
    * sample-id order per subspace), the L2 argmin encode with the same
    * `(sq − 2·dot) + ncb` double association and (dist, code) tiebreak,
    * ADC partial dot products summed through `Det.dsumSql` (the exact-
    * decimal order-independent convention), the pool-scaled shortlist
    * with its `greatest(100, probes·N/(2k))` depth in integer div, and
    * q41's exact-cosine re-rank. Ranking doubles are identical on both
    * sides (same folds, same literals), so every window tiebreak lands
    * identically. */
  private def ivfpqOracleSql: String = {
    def dot8(a: String, b: String): String =
      s"list_sum([CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE) for i in range(1, 9)])"
    def sub(v: String, idx: String): String = s"$v[$idx*8+1 : $idx*8+8]"
    s"""
      WITH $kmeansCentSql,
      assign AS (
        SELECT vec_id, cell FROM (
          SELECT e.vec_id, cent1.cid AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "cent1.cvec")} DESC, cent1.cid) AS crn
          FROM embeddings e CROSS JOIN cent1) t WHERE crn = 1),
      q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
      probes AS (
        SELECT qid, cell FROM (
          SELECT q.qid, cent1.cid AS cell,
            row_number() OVER (PARTITION BY q.qid
              ORDER BY ${cosSql("q.qe", "cent1.cvec")} DESC, cent1.cid) AS prn
          FROM q CROSS JOIN cent1) t WHERE prn <= $DefaultIvfProbes),
      smp AS (SELECT vec_id AS id, embedding AS vec FROM embeddings WHERE vec_id % 13 = 0),
      subs AS (SELECT CAST(unnest(range(0, 8)) AS INT) AS sub_idx),
      cb AS (
        SELECT sub_idx,
          CAST(row_number() OVER (PARTITION BY sub_idx ORDER BY id) - 1 AS INT) AS code,
          ${sub("vec", "sub_idx")} AS cvec
        FROM smp, subs),
      enc AS (
        SELECT id, sub_idx, code FROM (
          SELECT e.vec_id AS id, c.sub_idx, c.code,
            row_number() OVER (PARTITION BY e.vec_id, c.sub_idx
              ORDER BY (${dot8(s"${sub("e.embedding", "c.sub_idx")}", s"${sub("e.embedding", "c.sub_idx")}")}
                        - 2 * ${dot8(s"${sub("e.embedding", "c.sub_idx")}", "c.cvec")})
                       + ${dot8("c.cvec", "c.cvec")} ASC, c.code ASC) AS ern
          FROM embeddings e CROSS JOIN cb c) t WHERE ern = 1),
      qt AS (
        SELECT q.qid, c.sub_idx, c.code,
          ${dot8(s"${sub("q.qe", "c.sub_idx")}", "c.cvec")} AS pdot,
          ${dot8("c.cvec", "c.cvec")} AS ncb
        FROM q CROSS JOIN cb c),
      cand AS (
        SELECT DISTINCT p.qid, a.vec_id AS id FROM probes p
        JOIN assign a ON p.cell = a.cell WHERE a.vec_id <> p.qid),
      adc AS (
        SELECT c.qid, c.id,
          ${graft.Det.dsumSql("qt.pdot")} AS adc,
          ${graft.Det.dsumSql("qt.ncb")} AS recon
        FROM cand c
        JOIN enc ON enc.id = c.id
        JOIN qt ON qt.qid = c.qid AND qt.sub_idx = enc.sub_idx AND qt.code = enc.code
        GROUP BY c.qid, c.id),
      sk AS (
        SELECT greatest(100, ($DefaultIvfProbes * (SELECT count(*) FROM embeddings))
          // (2 * greatest((SELECT count(*) FROM cent1), 1))) AS k),
      short AS (
        SELECT qid, id FROM (
          SELECT adc.qid, adc.id,
            row_number() OVER (PARTITION BY adc.qid
              ORDER BY (adc.adc / sqrt(adc.recon)) DESC, adc.id) AS srn
          FROM adc) t, sk WHERE srn <= sk.k)
      SELECT qid, vec_id, cos, rn FROM (
        SELECT s.qid, s.id AS vec_id, ${cosSql("q.qe", "e.embedding")} AS cos,
          CAST(row_number() OVER (PARTITION BY s.qid
            ORDER BY ${cosSql("q.qe", "e.embedding")} DESC, s.id) AS INT) AS rn
        FROM short s
        JOIN embeddings e ON e.vec_id = s.id
        JOIN q ON q.qid = s.qid) t
      WHERE rn <= 5 ORDER BY qid, rn"""
  }

  val q66 = Q(
    "q66_ann_ivfpq",
    (s, d) => ivfpqQuery(s, d),
    Some(ivfpqOracleSql),
    // headline since round 8 (annex row in BASELINE.md; frozen table
    // untouched) — the memoized PQ index + ADC scoring path is the
    // 100-TB-resident search plan and deserves a perf gate
    headline = true)

  /** SemDeDup-style semantic dedup ([[VectorOps.semanticDedup]]): the
    * embedding-space complement of the token-level dedup family (q36–q39,
    * q43, q57) — drops documents whose MEANING duplicates an earlier one
    * even when no token overlaps, the curation step modern LLM corpora
    * apply after exact/fuzzy text dedup.
    *
    * Hash-exact graded even though it thresholds floating-point cosines:
    * cell assignment is q42's graded argmax, pair cosines are the same
    * sequential-fold doubles DuckDB's `list_sum` reproduces bit-exactly
    * (q41's verified convention), and τ=0.40 sits ≥5.6e-4 from every pair
    * cosine at sf0.01 — no boundary coin flips even if an engine rounded
    * differently. Keep policy (lowest id in each τ-neighborhood survives)
    * is pure integer logic.
    */
  /** q78's memoized cell assignment (cached: it feeds both self-join
    * sides and the final anti-join — three scans of one argmax pass). */
  private[graft] def semanticCells(s: SparkSession, d: String,
      idCap: Long = Long.MaxValue, memoSuffix: String = ""): DataFrame = {
    val cents = fifties(s, d, idCap)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    // the cap is part of the relation's identity: without it in the tag,
    // a capped and an uncapped call sharing a memoSuffix would silently
    // serve each other's cached assignment
    val capTag = if (idCap == Long.MaxValue) "" else s"_cap$idCap"
    graft.Memo.cached(s, d, "semdedup_cells" + memoSuffix + capTag) {
      VectorOps.ivfAssign(corpus(s, d), cents)
    }
  }

  /** The same assignment through the two-level coarse quantizer
    * ([[VectorOps.ivfAssignTwoLevel]], supers = every `superMod`-th
    * vector — a deterministic subset of the %50 centroid policy). The
    * k∝N scale path: flat assignment is N·k and measured-infeasible at
    * the 100× deep tier (500k × 10k); two-level is N·(s + k/s). */
  private[graft] def semanticCellsCoarse(s: SparkSession, d: String,
      superMod: Long = 2500L, memoSuffix: String = "", probes: Int = 1): DataFrame = {
    val cents = fifties(s, d, Long.MaxValue)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
    graft.Memo.cached(s, d, "semdedup_cells_coarse" + memoSuffix + s"_p$probes") {
      VectorOps.ivfAssignTwoLevel(corpus(s, d), cents,
        cents.filter(col("cid") % superMod === 0), probes)
    }
  }

  private[graft] def semanticDedupQuery(s: SparkSession, d: String,
      idCap: Long = Long.MaxValue, memoSuffix: String = ""): DataFrame =
    VectorOps.semanticDedup(semanticCells(s, d, idCap, memoSuffix), tau = 0.40)
      .select(col("id").as("vec_id"), col("cell"))
      .orderBy("vec_id")

  /** q78 over the coarse-quantized assignment — the deep-tier scale
    * form; approximate exactly where the quantizer is (cell routing),
    * identical dedup semantics within cells. */
  private[graft] def semanticDedupCoarseQuery(s: SparkSession, d: String,
      superMod: Long = 2500L, memoSuffix: String = ""): DataFrame =
    VectorOps.semanticDedup(semanticCellsCoarse(s, d, superMod, memoSuffix), tau = 0.40)
      .select(col("id").as("vec_id"), col("cell"))
      .orderBy("vec_id")

  val q78 = Q(
    "q78_semantic_dedup",
    (s, d) => semanticDedupQuery(s, d),
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0),
      assign AS (
        SELECT vec_id, cell, embedding FROM (
          SELECT e.vec_id, e.embedding, cent.cid AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "cent.cvec")} DESC, cent.cid) AS crn
          FROM embeddings e CROSS JOIN cent) t WHERE crn = 1),
      dup AS (
        SELECT DISTINCT b.vec_id FROM assign a JOIN assign b
          ON a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE ${cosSql("a.embedding", "b.embedding")} >= 0.40)
      SELECT vec_id, cell FROM assign
      WHERE vec_id NOT IN (SELECT vec_id FROM dup)
      ORDER BY vec_id"""),
    // headline since round 8 (annex row in BASELINE.md; frozen table
    // untouched) — the semantic-dedup pass is corpus-shaped and
    // join-heavy, exactly the profile that regresses silently
    headline = true)

  /** Oracle-graded two-level coarse quantizer (the k∝N scale path that
    * routes q78's 100× deep tier) in its probe-ALL configuration: each
    * vector ranks every super (the probed-routing window + vector
    * reattach join) and argmaxes over every super's member centroids.
    * Level 1 partitions the centroid set across supers — every centroid
    * lands in exactly one member list — so probing all supers unions the
    * member lists back into exactly the centroid set and the result
    * equals FLAT assignment by construction, at any scale, with the same
    * (ccos, lowest-cid) tie-break. That identity is what lets a DuckDB
    * flat-assignment mirror grade the two-level plan hash-exact while the
    * graded path still exercises the real machinery: level-1 member
    * assignment, the routing window over narrow (id, pcos, super) rows,
    * the reattach join, the broadcast member join, and the final argmax.
    * (`DedupVectorSpec` separately pins probe-1 exactness on separable
    * supers and the empty-super fallback; this entry puts the operator
    * under the driver's hash gate.)
    *
    * The super count is read off the tiny centroid relation (a
    * driver-side scalar over ≤k rows — the same bounded-action posture as
    * q68's histogram locate); `max 1` guards the degenerate no-super
    * corpus, where probes=1 routing over zero supers is vacuous anyway.
    */
  val q85 = Q(
    "q85_twolevel_assign",
    (s, d) => {
      val cents = fifties(s, d, Long.MaxValue)
        .select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      val supers = cents.filter(col("cid") % 2500 === 0)
      val nSupers = supers.count().toInt
      VectorOps.ivfAssignTwoLevel(corpus(s, d), cents, supers,
          probes = nSupers max 1)
        .select(col("id").as("vec_id"), col("cell"))
        .orderBy("vec_id")
    },
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0)
      SELECT vec_id, cell FROM (
        SELECT e.vec_id, cent.cid AS cell,
          row_number() OVER (PARTITION BY e.vec_id
            ORDER BY ${cosSql("e.embedding", "cent.cvec")} DESC, cent.cid) AS crn
        FROM embeddings e CROSS JOIN cent) t
      WHERE crn = 1 ORDER BY vec_id"""))

  /** Approximate kNN GRAPH — every vector's top-3 same-cell neighbors
    * (cos desc, id tiebreak), the batch kNN-join that feeds kNN-graph
    * clustering, label propagation, and SemDeDup-adjacent curation. The
    * cell index (q78's memoized `semanticCells` relation — shared, built
    * once) bounds candidate generation exactly as SemDeDup bounds pair
    * work: Σ cell² instead of N², with per-cell occupancy held constant
    * by growing cells ∝ corpus. The ranking window sees only
    * (qid, nid, cos) — vectors are projected away before the per-qid
    * exchange (the round-9 q41/q66 lesson: 550 B/candidate in a window
    * sort is spill thrash at 100×) — and `WindowGroupLimit` prunes to
    * top-3 map-side.
    *
    * Graded EXACTLY (not rows-only like q43/q66): "top-3 within the
    * assigned cell" is a deterministic function the oracle mirrors —
    * q42's assignment CTE + a within-cell self-join — so this also
    * cross-checks the whole cell machinery a second way.
    */
  private[graft] def knnGraphQuery(s: SparkSession, d: String,
      idCap: Long = Long.MaxValue, memoSuffix: String = ""): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = semanticCells(s, d, idCap, memoSuffix)
    def side(p: String) = cells.select(col("cell"), col("id").as(s"${p}id"),
      col("vec").as(s"${p}vec"), col("sq_norm").as(s"${p}n"))
    val pairs = side("q").join(side("n"), Seq("cell"))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        VectorOps.cosineWithNorms(
          VectorOps.dotD(col("qvec"), col("nvec")), col("qn"), col("nn")).as("cos"))
    val w = Window.partitionBy("qid").orderBy(col("cos").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("qid").as("vec_id"), col("nid"), col("cos"), col("rn"))
      .orderBy("vec_id", "rn")
  }

  val q91 = Q(
    "q91_knn_graph",
    (s, d) => knnGraphQuery(s, d),
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0),
      assign AS (
        SELECT vec_id, cell FROM (
          SELECT e.vec_id, cent.cid AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "cent.cvec")} DESC, cent.cid) AS crn
          FROM embeddings e CROSS JOIN cent) t WHERE crn = 1)
      SELECT vec_id, nid, cos, rn FROM (
        SELECT a.vec_id, b.vec_id AS nid,
          ${cosSql("ea.embedding", "eb.embedding")} AS cos,
          CAST(row_number() OVER (PARTITION BY a.vec_id
            ORDER BY ${cosSql("ea.embedding", "eb.embedding")} DESC, b.vec_id) AS INT) AS rn
        FROM assign a
        JOIN assign b ON a.cell = b.cell AND a.vec_id <> b.vec_id
        JOIN embeddings ea ON ea.vec_id = a.vec_id
        JOIN embeddings eb ON eb.vec_id = b.vec_id) t
      WHERE rn <= 3 ORDER BY vec_id, rn"""),
    // headline since round 11 (annex row in BASELINE.md)
    headline = true)

  /** Per-dimension feature statistics over the embedding corpus — the
    * standardization/whitening pre-pass (feature scaling, PCA prep,
    * quantizer training) every vector pipeline runs before indexing. One
    * posexplode scan, one dim-keyed map-side-combined aggregate: count,
    * exact quantized sums/sum-of-squares, float min/max, and the mean as
    * a single IEEE division.
    *
    * Exactness contract: each float is quantized q = floor(f·2^20) — the
    * f32→f64 widening and the 2^20 product are exponent-shift-exact, so q
    * is deterministic in both engines — and the sums accumulate q (not f)
    * in DECIMAL(38,0) vs DuckDB HUGEINT, graded through identical string
    * images (the q107 128-bit posture; int64 sum-of-squares overflows at
    * ~10^11 rows, DECIMAL(38,0) at ~10^25). min/max of floats are
    * order-independent, safe to grade as doubles.
    *
    * Shape at scale: explode is a narrow map; 64 dim keys partial-agg to
    * nothing. The ONE exchange carries 64 rows per map task.
    */
  val q115 = Q(
    "q115_feature_stats",
    (s, d) => {
      import org.apache.spark.sql.types.DecimalType
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "f")))
        .withColumn("q", expr("CAST(floor(CAST(f AS DOUBLE) * 1048576.0D) AS BIGINT)"))
        .groupBy("dim")
        .agg(count(lit(1)).as("n"),
          sum(col("q").cast(DecimalType(38, 0))).as("sq"),
          sum((col("q").cast(DecimalType(38, 0)) * col("q").cast(DecimalType(38, 0))))
            .as("sqq"),
          min(col("f").cast("double")).as("min_f"),
          max(col("f").cast("double")).as("max_f"))
        .select(col("dim").cast("long").as("dim"), col("n"),
          col("sq").cast("string").as("sum_q"),
          col("sqq").cast("string").as("sumsq_q"),
          col("min_f"), col("max_f"),
          (col("sq").cast("double") / col("n")).as("mean_q"))
        .orderBy("dim")
    },
    Some("""
      WITH ex AS (
        SELECT u.dim, embedding[u.dim + 1] AS f
        FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS dim) u),
      qd AS (SELECT dim, f, CAST(floor(CAST(f AS DOUBLE) * 1048576.0) AS BIGINT) AS q FROM ex)
      SELECT CAST(dim AS BIGINT) AS dim, count(*) AS n,
        CAST(sum(q) AS VARCHAR) AS sum_q,
        CAST(sum(q*q) AS VARCHAR) AS sumsq_q,
        CAST(min(f) AS DOUBLE) AS min_f, CAST(max(f) AS DOUBLE) AS max_f,
        CAST(sum(q) AS DOUBLE) / count(*) AS mean_q
      FROM qd GROUP BY 1 ORDER BY 1"""),
    headline = true)

  /** Per-dimension feature HISTOGRAMS — q115's distribution-shaped
    * sibling (drift detection, quantizer-training diagnostics): every
    * (dim, bucket) occupancy over a fixed equal-width grid on [-1, 1),
    * bucket = floor((f+1)·16), i.e. 32 buckets of width 1/16, with
    * out-of-range values clamped into the edge buckets. Every step is
    * IEEE-determined (f32→f64 exact, +1.0 correctly rounded identically
    * in both engines, ·16 exponent-shift exact, floor exact), so bucket
    * ids — and therefore counts — are engine-exact without quantization
    * gymnastics. The per-dim share is the usual floor-div rational.
    *
    * PRECONDITION (Det's convention): features must be FINITE. On a
    * non-finite value the engines SILENTLY disagree rather than fail —
    * Spark's non-ANSI `CAST(NaN AS BIGINT)` yields 0 (clamped into
    * bucket 0) while DuckDB's cast errors; ±Inf clamps into the edge
    * buckets on the Spark side only. The driver corpus is finite (the
    * q115 decimal path grades the same assumption); a generator change
    * that introduces NaN/Inf shows up as an oracle hash mismatch here,
    * and the fix is an upstream `isnan`/`nanvl` guard, not a histogram
    * change. Same contract for the streaming twin
    * ([[graft.streaming.VecStream.streamingFeatureHistogram]]).
    *
    * Shape at scale: one posexplode scan into a (dim, bucket)-keyed
    * map-side-combined aggregate (≤ 64·32 keys); the share window runs
    * over the histogram-sized frame, never the corpus (q97's posture).
    */
  val q118 = Q(
    "q118_feature_histogram",
    (s, d) => {
      Tables.embeddings(s, d)
        .select(posexplode(col("embedding")).as(Seq("dim", "f")))
        .withColumn("bucket",
          expr("greatest(0L, least(31L, CAST(floor((CAST(f AS DOUBLE) + 1.0D) * 16.0D) AS BIGINT)))"))
        .groupBy("dim", "bucket")
        .agg(count(lit(1)).as("n"))
        .withColumn("share_q",
          expr("(1000000L * n) div sum(n) OVER (PARTITION BY dim)"))
        .select(col("dim").cast("long").as("dim"), col("bucket"), col("n"), col("share_q"))
        .orderBy("dim", "bucket")
    },
    Some("""
      WITH ex AS (
        SELECT u.dim, embedding[u.dim + 1] AS f
        FROM embeddings, LATERAL (SELECT unnest(range(len(embedding))) AS dim) u),
      b AS (
        SELECT dim,
          greatest(0, least(31, CAST(floor((CAST(f AS DOUBLE) + 1.0) * 16.0) AS BIGINT))) AS bucket
        FROM ex),
      h AS (SELECT dim, bucket, count(*) AS n FROM b GROUP BY 1, 2)
      SELECT CAST(dim AS BIGINT) AS dim, bucket, n,
        (1000000 * n) // CAST(sum(n) OVER (PARTITION BY dim) AS BIGINT) AS share_q
      FROM h ORDER BY 1, 2"""),
    headline = true)

  /** Cluster purity — the standard clustering-vs-labels evaluation
    * (how label-homogeneous is each IVF cell), over q78's SHARED
    * memoized cell assignment (one argmax pass serves q78/q91/this).
    * Per cell: population, majority label (ties to the smallest label id
    * in both engines), and the floor-div purity rational. The oracle
    * re-derives the flat assignment with the same (ccos, lowest-cid)
    * tie-break and aggregates identically: hash-exact.
    *
    * Shape at scale: the label join is id-keyed; both windows run over
    * the (cell × label) aggregate — cluster-count-sized, never corpus-
    * sized.
    */
  private[graft] def clusterPurityQuery(s: SparkSession, d: String,
      idCap: Long = Long.MaxValue, memoSuffix: String = ""): DataFrame = {
    val cells = semanticCells(s, d, idCap, memoSuffix)
      .select(col("id").as("vec_id"), col("cell"))
    val cl = cells
      .join(Tables.embeddings(s, d).select(col("vec_id"), col("label")), "vec_id")
      .groupBy("cell", "label").agg(count(lit(1)).as("n"))
    cl.withColumn("n_vecs", sum(col("n")).over(Window.partitionBy("cell")))
      .withColumn("rn", row_number().over(
        Window.partitionBy("cell").orderBy(col("n").desc, col("label").asc)))
      .filter(col("rn") === 1)
      .select(col("cell"), col("n_vecs"),
        col("label").cast("long").as("top_label"), col("n").as("n_top"),
        expr("(1000000L * n) div n_vecs").as("purity_q"))
      .orderBy("cell")
  }

  val q119 = Q(
    "q119_cluster_purity",
    (s, d) => clusterPurityQuery(s, d),
    Some(s"""
      WITH cent AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id % 50 = 0),
      assign AS (
        SELECT vec_id, cell FROM (
          SELECT e.vec_id, cent.cid AS cell,
            row_number() OVER (PARTITION BY e.vec_id
              ORDER BY ${cosSql("e.embedding", "cent.cvec")} DESC, cent.cid) AS crn
          FROM embeddings e CROSS JOIN cent) t WHERE crn = 1),
      cl AS (
        SELECT a.cell, e.label, count(*) AS n
        FROM assign a JOIN embeddings e USING (vec_id)
        GROUP BY 1, 2)
      SELECT cell, CAST(sum(n) OVER (PARTITION BY cell) AS BIGINT) AS n_vecs,
        CAST(label AS BIGINT) AS top_label, n AS n_top,
        (1000000 * n) // CAST(sum(n) OVER (PARTITION BY cell) AS BIGINT) AS purity_q
      FROM cl
      QUALIFY row_number() OVER (PARTITION BY cell ORDER BY n DESC, label) = 1
      ORDER BY cell"""),
    headline = true)

  /** Greedy k-center coreset (Gonzalez farthest-point traversal): K=8
    * maximally-spread representatives of the embedding corpus — the
    * diversity-selection step of data pruning (pick exemplars that COVER
    * the space, where q59's k-means picks density centers) and the
    * classic 2-approximation to the k-center cover. Deterministic and
    * hash-graded end to end: the traversal seeds at the smallest vec_id,
    * each round picks the point with the LARGEST distance to its nearest
    * chosen center (ties to the smallest id), and every distance is the
    * engine-portable d² = ‖a‖² + ‖b‖² − 2·a·b on [[VectorOps.dotD]]'s
    * sequential fold — the identical IEEE op tree in the DuckDB mirror's
    * 8 unrolled round CTEs.
    *
    * Shape at scale: the distributed Gonzalez — the chosen set is K
    * plan literals (broadcast by construction), each round is ONE narrow
    * scan of the cached (id, vec, ‖·‖²) relation + a TakeOrdered(1)
    * reduce; K scans total, nothing corpus-sized shuffles, and the
    * driver holds exactly K vectors.
    */
  /** q147's body with K as a parameter (`tools.ScaleEvidence` prices the
    * K=64 rung). CARRIED-dmin form (round-18, verdict ask #4): the loop
    * maintains a persisted (id, vec, sq, dmin) relation and each round
    * folds ONE new-center distance into it via `least` — O(K) dots per
    * point across the whole loop, per-round cost FLAT in the round
    * number, where the round-17 form re-evaluated a growing
    * `least(d(c1)…d(cm))` literal list every round (O(K²) dots, per-
    * round cost linear in m). Answer-identical to that form: `least` is
    * exact min (no FP order dependence), each per-center distance is the
    * same IEEE op tree, and the (dmin desc, id) argmax tie-break is
    * unchanged — q147's K=8 oracle hash pins it. Only two rounds'
    * relations are ever persisted at once (the previous unpersists as
    * soon as the next is materialized by its own TakeOrdered head). */
  private[graft] def kcenterQuery(s: SparkSession, d: String, K: Int,
      onRound: (Int, Double) => Unit = (_, _) => ()): DataFrame = {
    val emb = graft.Memo.cached(s, d, "kcenter_sq") {
      corpus(s, d).withColumn("sq", VectorOps.sqNormD(col("vec")))
    }
    val first = emb.orderBy("id").limit(1).select("id", "vec").head()
    var chosen = Vector[(Int, Long, Option[Double])](
      (1, first.getLong(0), None))
    var centerVec: Seq[Float] = first.getSeq[Float](1).toSeq
    var cur: DataFrame = null
    var prev: DataFrame = null
    while (chosen.size < K) {
      val t0 = System.nanoTime()
      val cl = typedlit(centerVec)
      val dNew = col("sq") + VectorOps.dotD(cl, cl) -
        lit(2.0) * VectorOps.dotD(col("vec"), cl)
      cur =
        if (cur == null)
          emb.select(col("id"), col("vec"), col("sq"), dNew.as("dmin"))
        else
          cur.select(col("id"), col("vec"), col("sq"),
            least(col("dmin"), dNew).as("dmin"))
      cur.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val next = cur.orderBy(col("dmin").desc, col("id")).limit(1).head()
      if (prev != null) prev.unpersist()
      prev = cur
      chosen :+= ((chosen.size + 1, next.getLong(0), Some(next.getDouble(3))))
      centerVec = next.getSeq[Float](1).toSeq
      onRound(chosen.size, (System.nanoTime() - t0) / 1e9)
    }
    if (prev != null) prev.unpersist()
    import s.implicits._
    chosen.map { case (r, id, dd) => (r, id, dd) }
      .toDF("rk", "vec_id", "dist2")
      .orderBy("rk")
  }

  val q147 = Q(
    "q147_kcenter_coreset",
    (s, d) => kcenterQuery(s, d, K = 8),
    Some {
      val d2 = (v: String, c: String) =>
        s"($v.sq + $c.sq - 2 * ${dotSql(s"$v.embedding", s"$c.embedding")})"
      val rounds = (2 to 8).map { r =>
        val prev = if (r == 2) s"(SELECT s.vec_id, s.embedding, s.sq, ${d2("s", "c")} AS d FROM sq s CROSS JOIN c1 c)"
          else s"m${r - 1}"
        s"""m$r AS (SELECT m.vec_id, m.embedding, m.sq,
             ${if (r == 2) "m.d" else s"least(m.d, ${d2("m", s"c${r - 1}")})"} AS d
           FROM ${if (r == 2) s"$prev m" else s"$prev m CROSS JOIN c${r - 1} c${r - 1}"}),
         c$r AS (SELECT vec_id, embedding, sq, d FROM m$r ORDER BY d DESC, vec_id LIMIT 1)"""
      }.mkString(",\n")
      val selects = (2 to 8).map(r =>
        s"SELECT $r AS rk, vec_id, d AS dist2 FROM c$r").mkString("\n      UNION ALL ")
      s"""
      WITH sq AS (SELECT vec_id, embedding,
             ${dotSql("embedding", "embedding")} AS sq FROM embeddings),
      c1 AS (SELECT vec_id, embedding, sq FROM sq ORDER BY vec_id LIMIT 1),
      $rounds
      SELECT CAST(rk AS INT) AS rk, vec_id, dist2 FROM (
        SELECT 1 AS rk, vec_id, CAST(NULL AS DOUBLE) AS dist2 FROM c1
        UNION ALL $selects) t
      ORDER BY rk"""
    },
    headline = true)

  /** The QUERY-DIRECTED probe ranking itself, oracle-graded: for every
    * vector, the 8 most-probable flip masks of band 0's weight-≤2
    * neighborhood ([[graft.expressions.VecSrpProbeMasks]]) — the novel
    * mechanism of the multiprobe escalation tier, hash-matched against a
    * DuckDB mirror that enumerates the same 137-mask neighborhood in
    * SQL, computes the same 16 hyperplane margins (|sequential-fold
    * dot|, q43's plane-literal convention), and ranks by the identical
    * (Σ|margin| asc, mask asc) key. Deterministic because every
    * arithmetic step is the same IEEE op tree in both engines; ties
    * break on the mask value. Scale shape: one narrow corpus scan, one
    * per-row expression, no shuffle but the presentation sort.
    */
  val q148 = Q(
    "q148_qd_probe_ranks",
    (s, d) => {
      Tables.embeddings(s, d)
        .select(col("vec_id"),
          posexplode(element_at(
            call_function("vec_srp_probe_masks", col("embedding"),
              typedlit(srpPlanesL(0)), lit(16), lit(8)), 1))
            .as(Seq("pos0", "mask")))
        .select(col("vec_id"), (col("pos0") + 1).cast("int").as("rk"), col("mask"))
        .orderBy("vec_id", "rk")
    },
    Some {
      // band 0 of matrix 0 = the first 16 planes, inlined exact-decimal
      val pl16 = srpPlanesL(0).take(16).map(row =>
        row.map(f => new java.math.BigDecimal(f.toDouble).toPlainString)
          .mkString("[", ", ", "]")).mkString("[", ", ", "]")
      s"""
      WITH pl AS (SELECT $pl16 AS p),
      marg AS (
        SELECT e.vec_id,
          [abs(list_sum([CAST(e.embedding[k] AS DOUBLE) * pl.p[q][k]
             for k in range(1, 65)])) for q in range(1, 17)] AS m
        FROM embeddings e CROSS JOIN pl),
      masks AS (
        SELECT CAST(0 AS BIGINT) AS mask, -1 AS i, -1 AS j
        UNION ALL
        SELECT CAST(1 AS BIGINT) << i, CAST(i AS INT), -1 FROM range(16) t(i)
        UNION ALL
        SELECT (CAST(1 AS BIGINT) << i) | (CAST(1 AS BIGINT) << j),
               CAST(i AS INT), CAST(j AS INT)
        FROM range(16) a(i), range(16) b(j) WHERE j > i),
      scored AS (
        SELECT marg.vec_id, masks.mask,
          (CASE WHEN masks.i >= 0 THEN marg.m[masks.i + 1] ELSE 0.0 END) +
          (CASE WHEN masks.j >= 0 THEN marg.m[masks.j + 1] ELSE 0.0 END) AS score
        FROM marg CROSS JOIN masks)
      SELECT vec_id, CAST(rk AS INT) AS rk, mask FROM (
        SELECT vec_id, mask,
          row_number() OVER (PARTITION BY vec_id ORDER BY score, mask) AS rk
        FROM scored) t
      WHERE rk <= 8 ORDER BY vec_id, rk"""
    },
    headline = true)

  val defs: Seq[Q] = Seq(q41, q42, q43, q59, q66, q78, q85, q91, q115, q118, q119,
    q139, q147, q148)
}
