package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, n-gram shingling, quality metrics, language-ID scoring,
  * and document fingerprinting. Everything is a pure `Column` expression —
  * whole-stage-codegen'd, no UDFs, no shuffles of their own — so each
  * composes freely with any scan/filter/agg and scales with the row count.
  */
object TextOps {

  /** Token vocabulary with deterministic ids: rank by (frequency desc,
    * token asc), ids dense from 1. Input is one row per token OCCURRENCE
    * (e.g. the exploded corpus); output is one row per surviving token:
    * (`tokCol`, `tid: long`).
    *
    * `minCount` floors the frequency BEFORE the ranking window. At web
    * scale the raw vocabulary is dominated by hapaxes (typos, ids, URL
    * fragments — typically >50% of distinct tokens appear once), so
    * ranking the unfiltered vocab pushes all of them through the
    * single-partition row_number window; the floor keeps that window
    * sized by the USEFUL vocabulary. `minCount = 1` keeps every token —
    * the exact unfiltered ranking (q45's graded shape).
    */
  def buildVocab(flat: DataFrame, tokCol: String = "tok",
      minCount: Long = 1L): DataFrame = {
    require(minCount >= 1L, s"minCount must be >= 1, got $minCount")
    // SINGLE-PARTITION window, deliberately: dense ranking is a total
    // order, and its input here is the POST-AGGREGATE vocabulary — Zipf
    // (sublinear in corpus size), bounded by the token-type count, never
    // by the corpus. The guard lever for composition over an unbounded
    // token universe (ids, URLs, hashes as "tokens") is `minCount`:
    // hapax-flooring keeps the window sized by the USEFUL vocabulary.
    // Do NOT lift this window shape onto an occurrence-grain relation —
    // that is the q46/q145 prefix-sum problem and belongs to
    // [[PrefixOps]]'s bounded two-level scan.
    flat.groupBy(tokCol).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .select(col(tokCol),
        row_number().over(Window.orderBy(col("cnt").desc, col(tokCol)))
          .cast("long").as("tid"))
  }

  /** Whitespace tokens. Mirrors `string_split(text, ' ')` in DuckDB. */
  def tokens(text: Column): Column = split(text, " ")

  /** Distinct token n-gram shingles (order-preserving join with spaces).
    * For n=3: "a b c d" -> ["a b c", "b c d"]. Documents shorter than n
    * shingle to an empty array.
    *
    * Implemented as a Scala UDF rather than `transform`/`sequence`
    * higher-order functions: HOFs are CodegenFallback (interpreted
    * per-element), and the declarative form measured ~20 s per scan of
    * 5 000 docs at sf0.1 vs well under a second for the JVM loop. Both
    * are narrow maps (zero shuffle), so the UDF is also the better
    * 100-TB shape here.
    */
  def shingles(text: Column, n: Int = 3): Column = shingleUdf(text, lit(n))

  private val shingleUdf = udf((text: String, n: Int) =>
    if (text == null) Array.empty[String]
    else {
      val toks = text.split(" ", -1)
      if (toks.length < n) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String]()
        var i = 0
        while (i + n <= toks.length) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          seen.add(sb.toString)
          i += 1
        }
        seen.toArray(Array.empty[String])
      }
    })

  /** Distinct token n-gram shingles as 64-bit fingerprints (FNV-1a over
    * the shingle's UTF-8 bytes) — the standard MinHash-pipeline form: all
    * downstream set ops (banding, intersection, df counts) only need
    * distinctness, and an 8-byte long is several times smaller in caches,
    * shuffles, and join payloads than the text it fingerprints. At 27 k
    * distinct shingles (sf0.1) the 64-bit collision probability is
    * ~2e-11; a collision could only merge two shingles, never split one.
    *
    * Resolves to the native [[graft.expressions.ShingleHash64]]
    * expression (registered by `GraftExtensions`): the same fingerprints
    * as [[shingleHashReference]]'s UDF (spec-pinned row-for-row), but
    * computed straight over the UTF8String bytes — no String decode, no
    * per-token allocation, no boxed-result re-conversion.
    */
  def shingleHashes(text: Column, n: Int = 3): Column =
    call_function("shingle_hash64", text, lit(n))

  /** Every 1..maxN-gram of the text WITH MULTIPLICITY, tagged by order —
    * the count-table extraction for n-gram language modeling (KenLM-style
    * count files, interpolated-backoff estimation). Unlike [[shingles]]
    * (a distinct SET for similarity), LM counts need every occurrence, so
    * nothing is deduplicated. One UDF call emits all orders in one pass —
    * the corpus is scanned ONCE for the whole (unigram, bigram, trigram)
    * family instead of once per order. Same JVM-loop-over-HOF rationale
    * as [[shingles]]: narrow map, codegen-opaque but allocation-lean.
    */
  def lmGrams(text: Column, maxN: Int = 3): Column = lmGramsUdf(text, lit(maxN))

  private val lmGramsUdf = udf((text: String, maxN: Int) =>
    if (text == null) Array.empty[(Int, String)]
    else {
      val toks = text.split(" ", -1)
      val out = Array.newBuilder[(Int, String)]
      var n = 1
      while (n <= maxN) {
        var i = 0
        while (i + n <= toks.length) {
          val sb = new java.lang.StringBuilder(toks(i))
          var j = 1
          while (j < n) { sb.append(' ').append(toks(i + j)); j += 1 }
          out += ((n, sb.toString))
          i += 1
        }
        n += 1
      }
      out.result()
    })

  /** The plain-JVM reference implementation of [[shingleHashes]] — kept
    * as the oracle the native expression is spec-tested against. */
  private[graft] val shingleHashReference = udf((text: String, n: Int) =>
    if (text == null) Array.empty[Long]
    else {
      val toks = text.split(" ", -1)
      if (toks.length < n) Array.empty[Long]
      else {
        val seen = new java.util.LinkedHashSet[java.lang.Long]()
        var i = 0
        while (i + n <= toks.length) {
          var h = 0xcbf29ce484222325L // FNV-1a 64 offset basis
          var j = 0
          while (j < n) {
            if (j > 0) { h ^= ' '.toLong; h *= 0x100000001b3L }
            val bytes = toks(i + j).getBytes("UTF-8")
            var b = 0
            while (b < bytes.length) { h ^= bytes(b) & 0xffL; h *= 0x100000001b3L; b += 1 }
            j += 1
          }
          seen.add(h)
          i += 1
        }
        val out = new Array[Long](seen.size)
        val it = seen.iterator()
        var k = 0
        while (it.hasNext) { out(k) = it.next(); k += 1 }
        out
      }
    })

  /** Number of non-overlapping occurrences of literal `pat` in `text`,
    * expressed with length/replace so any SQL engine reproduces it exactly.
    */
  def occurrences(text: Column, pat: String): Column =
    (length(text) - length(replace(text, lit(pat)))) / lit(pat.length)

  /** Tiny built-in character-trigram marker profiles for language ID.
    * Public-knowledge heuristic (frequent function-word fragments); the
    * profiles are data, not learned state, so scoring is a pure projection.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "sch", "ein", "ich"),
    "en" -> Seq("the", " a ", "ing", " of"),
    "es" -> Seq(" el ", " de ", "los", "que"),
    "fr" -> Seq(" le ", " la ", "eau", "que"),
    "zh" -> Seq("zh_", "shi", "de ", "le "))

  /** Marker-occurrence score for one language profile. */
  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => occurrences(text, m)).reduce(_ + _).cast("int")

  /** Exact-duplicate fingerprint: md5 of the lower-cased text. Identical
    * in every engine; the cheap first pass of any dedup cascade.
    */
  def fingerprint(text: Column): Column = md5(lower(text))

  /** PII-masking patterns. Deliberately restricted to the regex subset
    * Java's engine (Spark) and RE2 (DuckDB) interpret identically — no
    * lookaround, no `\b`, no shorthand classes, only greedy quantifiers
    * over explicit character classes — so both engines mask the exact
    * same spans and redacted corpora are reproducible cross-engine.
    * Order matters and [[redact]] fixes it: URLs first (an address inside
    * a URL is part of the URL, not a separate email), then emails, then
    * phone numbers (strict international `+CC-NNN-N...` form; free-form
    * national numbers are corpus-specific policy, not engine semantics).
    */
  val UrlRe = "https?://[^ \\t\\r\\n]+"
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,10}"

  /** Non-overlapping match count of `pat` — `size(regexp_extract_all)`,
    * codegen-friendly and mirrored by `len(regexp_extract_all)` in any
    * engine. Count BEFORE the corresponding redaction stage; a later
    * stage's input already has earlier kinds masked. */
  def matchCount(text: Column, pat: String): Column =
    size(regexp_extract_all(text, lit(pat), lit(0))).cast("long")

  /** One redaction stage: every `pat` span replaced with `tag`. */
  def redactOne(text: Column, pat: String, tag: String): Column =
    regexp_replace(text, pat, tag)

  /** Full PII mask: URL -> `<URL>`, then email -> `<EMAIL>`, then phone
    * -> `<PHONE>`. A pure projection — scales with row count, composes
    * with any scan, and never shuffles. */
  def redact(text: Column): Column =
    redactOne(redactOne(redactOne(text, UrlRe, "<URL>"),
      EmailRe, "<EMAIL>"), PhoneRe, "<PHONE>")

  /** ALL overlapping token n-gram fingerprints, repeats included — the
    * multiset repetition metrics need ([[shingleHashes]] dedups; a
    * duplicate-n-gram fraction computed on a set is always 0). Native
    * [[graft.expressions.NgramHash64]]; same 64-bit FNV-1a over the
    * contiguous byte slice, so `ngram_hash64(t, n)`'s distinct set ==
    * `shingle_hash64(t, n)`.
    */
  /** One FNV-1a fingerprint per non-overlapping k-token chunk
    * ([[graft.expressions.ChunkHash64]]) — span-dedup's chunk identity
    * without materializing chunk strings. */
  def chunkHashes(text: Column, k: Int): Column =
    call_function("chunk_hash64", text, lit(k))

  def ngramHashes(text: Column, n: Int): Column =
    call_function("ngram_hash64", text, lit(n))

  /** 128-bit variant of [[ngramHashes]] — `struct<h1, h2>` elements with
    * `h1` byte-identical to the 64-bit lane, for adversarial or
    * user-supplied corpora where a single 64-bit in-doc collision
    * shifting a multiset count is a real risk (see
    * [[graft.expressions.NgramHash128]]). Group on the whole struct. */
  def ngramHashes128(text: Column, n: Int): Column =
    call_function("ngram_hash128", text, lit(n))

  /** BPE merge-table learning (Sennrich et al., ACL'16) over a weighted
    * word-count relation — the tokenizer-training step of an LLM data
    * pipeline. Words start as character sequences; each round counts
    * adjacent symbol pairs weighted by word frequency, merges the
    * heaviest pair ((weight DESC, left, right) — fully deterministic),
    * and re-segments every word by that merge in a single left-to-right
    * non-overlapping pass with REPLACE SEMANTICS: the match consumes the
    * separator after the right symbol, so the immediately following
    * symbol cannot open the next match — byte-identical to
    * `replace(' '||join(syms,' ')||' ', ' l r ', ' lr ')`, which is what
    * lets a SQL mirror reproduce the segmentation exactly (RE2-based
    * engines have no lookahead to express the textbook greedy scan).
    * The two contracts differ ONLY on >= 3 consecutive occurrences of
    * the merged pair (e.g. "aaaa" merges to [aa, a, a] here vs textbook
    * [aa, aa]) — a run-parity corner a real vocabulary essentially
    * never exercises, traded for exact cross-engine gradability;
    * `mergePair` is property-tested against the string-replace
    * reference on exactly those adversarial runs.
    *
    * Shape at scale: the corpus is touched ONCE (the word-count input);
    * every round runs on the VOCABULARY relation — pair explode (bounded
    * by word length), one pair-keyed map-side-combined aggregate, a
    * 1-row argmax collect (the q68 bounded-driver-action posture), and a
    * narrow re-segment map with a `localCheckpoint` lineage cut (the
    * iterative-dataflow lesson from CC/BFS). Zipf says the vocabulary is
    * orders smaller than the corpus, which is what makes driver-looped
    * rounds the right shape here.
    *
    * @param words  (wordCol: string, cntCol: long) weighted vocabulary
    * @param rounds merge count, >= 1
    * @return (round: int, left, right, merged: string, weight: long) —
    *         one row per learned merge, in learning order; stops early
    *         if no pair remains
    */
  def bpeMerges(words: DataFrame, wordCol: String, cntCol: String,
      rounds: Int): DataFrame = {
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    val spark = words.sparkSession
    var seg = words.select(
        split(regexp_replace(col(wordCol), "(.)", "$1\u0000"), "\u0000")
          .as("syms"), col(cntCol).cast("long").as("cnt"))
      // the trailing empty element regexp_replace+split leaves behind
      .withColumn("syms", expr("filter(syms, x -> x != '')"))
      .localCheckpoint(true)
    val learned = Vector.newBuilder[(Int, String, String, String, Long)]
    var r = 0
    var exhausted = false
    while (r < rounds && !exhausted) {
      r += 1
      val best = seg
        .select(posexplode(expr(
          "transform(slice(syms, 1, size(syms) - 1), (s, i) -> struct(s AS l, syms[i + 1] AS r))"))
          .as(Seq("i", "p")), col("cnt"))
        .groupBy(col("p.l").as("left"), col("p.r").as("right"))
        .agg(sum(col("cnt")).as("weight"))
        .orderBy(col("weight").desc, col("left"), col("right"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, ri, w) = (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((r, l, ri, l + ri, w))
        seg = seg.withColumn("syms", mergePairUdf(col("syms"), lit(l), lit(ri)))
          .localCheckpoint(true)
      }
    }
    import spark.implicits._
    learned.result()
      .toDF("round", "left", "right", "merged", "weight")
  }

  /** Single-pair re-segmentation with replace semantics (see
    * [[bpeMerges]]): a match emits the merged symbol and ALSO emits the
    * next symbol unmerged (its leading separator was consumed by the
    * match), mirroring one `replace` pass over the space-joined form. */
  private[graft] def mergePair(syms: Seq[String], l: String, r: String): Seq[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r)
        if (i + 2 < syms.length) out += syms(i + 2)
        i += 3
      } else { out += syms(i); i += 1 }
    }
    out.result()
  }

  private val mergePairUdf = udf(mergePair _)

  /** Apply a learned merge table ([[bpeMerges]] output order matters) to
    * a word: chars, then each merge's [[mergePair]] pass in learning
    * order — the ENCODE half of the tokenizer. The merge list is a
    * driver-side literal (5-ish rows, the bounded-action posture), the
    * application a narrow vocabulary-sized map. */
  def applyMerges(merges: Seq[(String, String)]): Column => Column = {
    val u = udf((w: String) =>
      if (w == null) Seq.empty[String]
      else merges.foldLeft(w.map(_.toString): Seq[String]) {
        case (syms, (l, r)) => mergePair(syms, l, r)
      })
    (c: Column) => u(c)
  }

  /** Hashed-n-gram linear quality scorer core (the q129/q135 model and
    * DocStream's streaming quality gate — ONE definition): md5-bucketed
    * unigram+bigram features against the planted [[qualityWeights]]
    * table, summed per doc in exact integers. Input needs (doc_id,
    * text); output (doc_id, n_feats, score). Lives in ops so the
    * streaming layer can consume it without depending on the query
    * registry. */
  val QualityBuckets = 4096
  val qualityWeights: Seq[Long] =
    (0 until QualityBuckets).map(b => (b.toLong * 2654435761L) % 1000003L - 501001L)

  def modelScoresOf(docs: DataFrame): DataFrame =
    // Fused native form (round-21 optimization, guide §1.2 step 2 /
    // §4): `quality_score(text)` computes the whole feature loop —
    // single-space tokenize, md5-bucket each unigram + adjacent bigram
    // (a bigram is the contiguous byte range of its two tokens), sum
    // the planted weights — in one codegen'd projection at the scan.
    // Replaces explode(toks ++ bigrams) → md5-hex → conv → element_at
    // → corpus×features groupBy (5M exploded rows at sf0.1; q129 was
    // 4.05 s with this chain, the single hottest path in the bench).
    // Row-for-row pinned against [[modelScoresReferenceOf]] by
    // Md5FeaturesSpec; a null text emits no row in either form. The
    // no-row contract is a PRE-filter on text — filtering the struct
    // for null afterwards gets pushed below the projection and
    // re-evaluates the whole fused pass per row (guide §4.4's
    // duplicated-evaluation trap, observed in the executed plan).
    docs
      .filter(col("text").isNotNull)
      .select(col("doc_id"), call_function("quality_score", col("text")).as("__qs"))
      .select(col("doc_id"),
        col("__qs.n_feats").as("n_feats"), col("__qs.score").as("score"))

  /** The relational spelling `quality_score` replaces — kept as the
    * spec oracle ([[shingleHashReference]]'s convention): explode the
    * unigram+bigram feature stream, md5-bucket each feature, look the
    * planted weight up, aggregate per document. */
  private[graft] def modelScoresReferenceOf(docs: DataFrame): DataFrame = {
    val wTab = typedlit(qualityWeights)
    val toks = split(col("text"), " ")
    val bigrams = when(size(toks) >= 2,
      transform(sequence(lit(1), size(toks) - 1),
        i => concat(element_at(toks, i), lit(" "), element_at(toks, i + 1))))
      .otherwise(array().cast("array<string>"))
    docs
      .select(col("doc_id"), explode(concat(toks, bigrams)).as("f"))
      .select(col("doc_id"), element_at(wTab,
        (conv(substring(md5(col("f")), 1, 4), 16, 10).cast("long")
          % QualityBuckets + 1).cast("int")).as("w"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_feats"), sum(col("w")).as("score"))
  }

  /** q146's overlapping context windows (width `w`, stride `st`) as a
    * relation transform over (doc_id, text, …) — ONE definition shared
    * by the batch query and [[graft.pipeline.IncrAttrTable]]'s
    * per-admitted-batch window emission (windows are per-doc local, so
    * the streamed union over admitted batches equals the batch answer
    * over the admitted corpus — IngestSpec pins it). Start count
    * `1 + ceil(max(n−w,0)/st)` guarantees full coverage; the last
    * window may run short (kept, never padded); a doc shorter than one
    * window emits exactly one. Pure per-row generate — a document's
    * windows never leave its task. */
  def contextWindowsOf(docs: DataFrame, w: Int = 32, st: Int = 24): DataFrame =
    docs
      .select(col("doc_id"), tokens(col("text")).as("toks"))
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L),
          expr(s"(cast(greatest(size(toks) - $w, 0) as bigint) + ${st - 1}) div $st")))
          .as("w"))
      .select(col("doc_id"),
        col("w").cast("int").as("win_id"),
        (col("w") * st).cast("int").as("start_pos"),
        slice(col("toks"), (col("w") * st + 1).cast("int"), lit(w)).as("win"))
      .select(col("doc_id"), col("win_id"), col("start_pos"),
        size(col("win")).as("win_tokens"),
        array_join(col("win"), " ").as("window_text"))

  /** Character n-grams WITH multiplicity (stride 1) — the fastText-style
    * language-ID feature stream. Native codegen expression
    * ([[graft.expressions.CharGrams]], the ShingleHash64 precedent —
    * round 19 replaced the per-row Scala UDF that sat on q150 AND on
    * every streamed batch through the language gate): grams are
    * zero-copy byte slices inside whole-stage codegen, indexed BY CODE
    * POINT, so DuckDB's `[substr(text, i, n) for i in range(1,
    * len-n+2)]` mirror agrees on every string — not just ASCII, which
    * was all the UDF's UTF-16 indexing could guarantee. */
  def charGrams(text: Column, n: Int = 3): Column =
    call_function("char_grams", text, lit(n))

  /** Hashed char-n-gram LINEAR language classifier (the fastText
    * lang-id architecture — Joulin et al. 2016 — built from q129's
    * machinery, one weight vector per language): char trigrams are
    * md5-bucketed into [[LangIdBuckets]] buckets (the engine-portable
    * q44/q129 hash convention), each language contributes a PLANTED
    * deterministic integer weight table ([[langIdWeights]] — a real
    * deployment swaps the literals for trained weights and keeps the
    * plan), per-doc scores are exact integer sums, and the prediction
    * is the argmax (ties to the alphabetically first language, q32's
    * convention).
    *
    * Languages = [[langMarkers]]' key set, so the marker heuristic
    * (q32) and the classifier (q150) grade the same label space.
    *
    * Shape at scale: one corpus scan; the gram explode is narrow (a
    * doc's grams stay in its task), ONE md5 per gram feeds all L
    * weight lookups, and the per-doc sums partial-combine map-side —
    * the single exchange carries (doc_id, L sums + count), never a
    * gram, never text. */
  val LangIdBuckets = 1024
  def langIdWeights(li: Int): Seq[Long] =
    (0 until LangIdBuckets).map(b =>
      ((b.toLong + 7919L * (li + 1)) * 2654435761L) % 1000003L - 501001L)

  def langIdScoresOf(docs: DataFrame): DataFrame = {
    // sorted EXPLICITLY: the argmax tie-break below resolves to the
    // outermost `when`, i.e. the first element of this seq — the
    // documented "alphabetically first language" contract must be
    // structural, not a coincidence of langMarkers' declaration order
    // (round-18 ADVICE; the oracle generator sorts the same way)
    val langs = langMarkers.map(_._1).sorted
    // Fused native form (round-21 optimization): `lang_id_scores(text,
    // L)` runs the whole per-document pass — code-point trigram walk,
    // ONE md5 bucket per gram feeding all L planted weight tables,
    // integer sums — inside one codegen'd projection at the scan.
    // Replaces explode(char_grams) → md5-hex → conv → L element_ats →
    // corpus×grams groupBy (~15M exploded gram rows at sf0.1; q150 was
    // 1.93 s with that chain). Row-for-row pinned against
    // [[langIdScoresReferenceOf]] by Md5FeaturesSpec; a doc with no
    // trigram emits no row in either form — expressed as a PRE-filter
    // (null or sub-trigram text never reaches the scorer; `length` is
    // Spark's code-point count, the same unit as the gram walk). A
    // post-filter on the struct would push below the projection and
    // re-evaluate the fused pass per row (guide §4.4's duplicated-
    // evaluation trap, observed in the executed plan).
    val scored = docs
      .filter(col("text").isNotNull && length(col("text")) >= 3)
      .select(col("doc_id"),
        call_function("lang_id_scores", col("text"), lit(langs.length)).as("__ls"))
      .select(col("doc_id") +: col("__ls.n_grams").as("n_grams") +:
        langs.zipWithIndex.map { case (l, i) =>
          col("__ls.scores").getItem(i).as(s"score_$l")
        }: _*)
    val best = langs.map(l => col(s"score_$l")).reduce(greatest(_, _))
    // ties to the alphabetically-first language: earlier langs outermost
    val pred = langs.reverse.foldLeft(lit("und")) { case (acc, l) =>
      when(col(s"score_$l") === best, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
  }

  /** The explode-based spelling `lang_id_scores` replaces — kept as
    * the spec oracle. */
  private[graft] def langIdScoresReferenceOf(docs: DataFrame): DataFrame = {
    val langs = langMarkers.map(_._1).sorted
    val bucket = (conv(substring(md5(col("f")), 1, 4), 16, 10).cast("long")
      % LangIdBuckets + 1).cast("int")
    val scored = docs
      .select(col("doc_id"), explode(charGrams(col("text"))).as("f"))
      .select(col("doc_id") +: langs.zipWithIndex.map { case (l, i) =>
        element_at(typedlit(langIdWeights(i)), bucket).as(s"__w_$l")
      }: _*)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        langs.map(l => sum(col(s"__w_$l")).as(s"score_$l")): _*)
    val best = langs.map(l => col(s"score_$l")).reduce(greatest(_, _))
    val pred = langs.reverse.foldLeft(lit("und")) { case (acc, l) =>
      when(col(s"score_$l") === best, lit(l)).otherwise(acc)
    }
    scored.withColumn("pred_lang", pred)
  }
}
