package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.{DedupOps, Fs, SinkOps, TextOps}
import graft.queries.{DedupQs, TextQs}
import graft.streaming.IndexLayout

/** INCREMENTAL attribute tagging — the production form of [[AttrTable]]'s
  * write-once artifact. A real curation deployment (the Dolma tagger
  * architecture; CCNet's shard loop) never re-tags the corpus when a new
  * crawl shard arrives: it tags the NEW documents only, against frozen
  * reference artifacts, and appends. This object is that loop:
  *
  *   - the artifact root holds `attrs/` (the wide attribute rows —
  *     per-batch leaf dirs under a generational pointer, folded to one
  *     doc_id-range-sorted slice at compaction: [[compactRel]]),
  *     `index/` (the resident MinHash-LSH
  *     band+shingle index the dedup signal probes, in
  *     [[graft.streaming.IndexLayout]]'s hash-bucketed generational
  *     layout — the SAME layout DocStream's streaming index uses), and
  *     `lm/` (the trigram count relation FROZEN from the seed batch —
  *     the CCNet posture: a fixed reference LM scores every later shard,
  *     rather than q131's corpus-self counts which would make every
  *     attribute retroactively change as the corpus grows);
  *   - [[appendBatch]] tags one batch: per-doc signals (model score,
  *     cascade mask — batch-local scans by construction), perplexity
  *     against the frozen LM ([[TextQs.pplAgainstLm]], add-1 backoff for
  *     grams the LM never saw), and `is_dup` from a band probe of the
  *     resident index plus a within-batch band self-join — then appends
  *     attrs + bands + shingles.
  *
  * The batch cost is O(batch) for every signal INCLUDING the dup probe,
  * on both the READ and the WRITE side:
  *
  *   - READS: the resident index is hash-bucketed (bands on
  *     `pmod(band_hash, nb)`, shingles on `pmod(xxhash64(doc_id), nb)`)
  *     and each append reads ONLY the bucket directories its own probe
  *     keys land in, plus the bounded TAIL — the band lookup prunes to
  *     the batch's band-hash buckets, the shingle verify prunes to the
  *     candidate docs' id buckets. Both bucket sets are bounded
  *     driver-side scalars (≤ nb distinct ints, the q68-style
  *     bounded-collect posture) and the pruning happens at FILE LISTING
  *     time via [[IndexLayout.residentSlice]] — per-append I/O tracks
  *     the batch's bucket contents, not the resident corpus (before
  *     round 15 both resident relations were flat parquet and every
  *     append paid one linear scan of each — the [append-100] growth
  *     curve in SURVEY §2.0.2 priced it at 3.6→7.2 s across 1×→100×).
  *     The bucket count itself scales with the corpus at compaction
  *     ([[compactIndex]] re-buckets to [[IndexLayout.scaledBuckets]]),
  *     keeping rows-per-bucket ~constant — a fixed seed-time nb would
  *     let the "pruned" read grow linearly with the corpus once every
  *     bucket is hit.
  *   - WRITES: batch slices land as plain leaf-directory overwrites —
  *     index rows in the TAIL ([[IndexLayout.appendTailSlice]]), attrs
  *     in `attrs/batch_id=N` — one or two files each, no partitioned-
  *     write machinery. The round-15 dynamic-partition form re-listed
  *     the whole accumulated tree on every append (cost grew with every
  *     batch ever committed) and fanned each batch into one file per
  *     touched bucket (cost would grow with nb, i.e. with pruning
  *     quality). Readers absorb the tail until the pressure-triggered
  *     compaction folds it into real buckets — the LSM / table-format
  *     small-file clustering discipline.
  *
  * A shard-sized batch additionally
  * BROADCASTS its capped band relation, its candidate pairs and its own
  * shingles (`broadcastProbe = true`), so candidate generation and
  * verify are map-side hash probes over the pruned resident reads and
  * the resident side never shuffles. A caller appending a CORPUS-sized
  * "batch" ([[ensureBuilt]]'s two halves) passes `broadcastProbe =
  * false`, which de-hints ALL THREE relations — candidate generation
  * and both verify sides degrade to ordinary shuffled joins (q36's own
  * class, safe at any batch size; before round 15 the verify hints were
  * unconditional, which shipped half the corpus's shingle arrays to
  * every executor on exactly the path that declared itself
  * non-broadcastable).
  *
  * CORRECTNESS CONTRACT (what q142 grades): batches must arrive in
  * doc_id order — every id in batch k strictly above every id in batches
  * < k (the natural ingest invariant; ids are monotone in real
  * pipelines). Under it, incremental == full-build EXACTLY for every
  * attribute: per-doc signals trivially; ppl because the LM is frozen
  * either way; and `is_dup` because the keep-first convention (doc b is
  * dup iff a J ≥ 0.8 partner with LOWER id exists — q137's rule) only
  * ever consults documents that are ALREADY in the resident index when
  * b is tagged, and a later batch can never retro-flip an earlier doc
  * (its ids are all higher). The contract is ENFORCED, not assumed:
  * every append records its batch's max doc_id in a tiny
  * `_batchmeta/<batchId>` manifest, and a violating append (batch min
  * at or below the resident max) fails loudly instead of silently
  * mis-flagging `is_dup`. q142 proves the equivalence end-to-end by
  * hash-grading a two-batch incremental build against the full-corpus
  * oracle mirror.
  *
  * REPLAY SAFETY: every write is idempotent per batchId — attrs land in
  * a `batch_id=` partition under dynamic overwrite, bands/shingles in
  * the index's `bucket=/batch_id=` partitions ([[IndexLayout.writeSlice]]
  * dynamic form), the manifest via atomic rename — and every resident
  * read filters `batch_id < batchId`, so a replayed batch never sees its
  * own half-written rows. That is DocStream's at-least-once →
  * effectively-exactly-once discipline, and it is what lets
  * [[graft.streaming.AttrStream]] drive this exact method from a
  * Structured Streaming foreachBatch: the streamed build and the batch
  * shard loop produce byte-identical artifacts (IncrAttrSpec pins it).
  */
object IncrAttrTable {
  private val log = org.apache.logging.log4j.LogManager.getLogger(getClass)

  /** Conf switch: the fused ingest loop also emits q146's context
    * windows for each batch's ADMITTED docs (per-batch parquet shards
    * under `root/windows` — the streaming twin of the batch chunking).
    * Default off: window emission roughly doubles output bytes. */
  val EmitWindowsKey = "spark.graft.ingest.emitWindows"

  private val built =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()

  /** Artifact root for corpus `d` — [[AttrTable.pathSlug]]'s injective
    * mapping (readable sanitized prefix + FNV hash of the raw path), so
    * distinct corpora can never collide onto one artifact tree. */
  def dir(d: String): String =
    "/tmp/graft-attrs-incr/" + AttrTable.pathSlug(d)

  private def hconf(s: SparkSession) = s.sparkContext.hadoopConfiguration

  private def exists(s: SparkSession, p: String): Boolean = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(hconf(s)).exists(path)
  }

  private def delete(s: SparkSession, p: String): Unit = {
    val path = new org.apache.hadoop.fs.Path(p)
    path.getFileSystem(hconf(s)).delete(path, true)
  }

  private def indexDir(root: String): String = s"$root/index"
  private def metaDir(root: String): String = s"$root/_batchmeta"

  /** The artifact relations OUTSIDE the index that accrue per-batch leaf
    * dirs: the wide attribute rows, (for the fused loop) the admission
    * verdicts, and (round 19) the dup-cluster component labels. All get
    * the index's generational compaction discipline — see
    * [[compactRel]]; `labels` additionally RESOLVES at the fold (the
    * representative re-labeling — [[labelsResolved]]'s min is applied so
    * superseded merge rows die with the generation they folded from). */
  private val ArtifactRels = Seq("attrs", "admissions", "labels")

  /** Live generation of an artifact relation (`attrs` / `admissions`) —
    * the same atomic-pointer convention as [[IndexLayout.gen]], one
    * `_gen` file per relation (absent = 0, the pre-first-compaction
    * state every fresh artifact starts in). The pointer is per-relation
    * rather than shared because the relations are independent: a crash
    * between two rels' swaps leaves each serving one complete
    * generation. */
  private def relGen(s: SparkSession, root: String, rel: String): Long =
    Fs.readBytes(s"$root/$rel/_gen", hconf(s))
      .map(b => new String(b, "UTF-8").trim.toLong).getOrElse(0L)

  /** Root of `rel`'s live generation — every read and every per-batch
    * write resolves through this (never the bare `root/rel` tree, which
    * may briefly hold a half-written next generation or a
    * not-yet-GC'd previous one). Artifacts written BEFORE the
    * generational layout (flat `root/rel/batch_id=N` dirs, no `_gen`
    * pointer) are migrated in place on first touch — without this, a
    * long-lived ingest dir upgraded across the layout change would
    * silently hide every committed row (reads resolve to a gen=0 dir
    * that does not exist) and the LM-seed check would re-seed the
    * frozen LM against a different basis. */
  private[graft] def liveRelDir(s: SparkSession, root: String, rel: String): String = {
    val g = relGen(s, root, rel)
    if (g == 0L) migrateLegacyFlat(s, s"$root/$rel")
    s"$root/$rel/gen=$g"
  }

  /** One-time legacy-layout migration: move flat `batch_id=N` dirs under
    * `gen=0`. Idempotent (a second pass finds none), driver-side renames
    * only, and memoized per (session, rel dir) so the steady-state
    * gen-0 path (every fresh artifact before its first compaction) pays
    * ONE listing per session, not one per read. A failed rename THROWS
    * before the memo is written: `fs.rename` reports failure as a
    * `false` return (dest exists, permissions, cross-FS move), and
    * swallowing it would leave those batch dirs invisible to gen-0
    * readers — committed rows silently missing — with the per-session
    * memo suppressing any retry. Loud-and-retryable beats
    * quietly-partial. */
  private val legacyChecked =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), java.lang.Boolean]()
  private def migrateLegacyFlat(s: SparkSession, dir: String): Unit =
    legacyChecked.computeIfAbsent((s, dir), { _ =>
      val hc = hconf(s)
      val flat = Fs.list(dir, hc).filter(st => st.isDirectory &&
        st.getPath.getName.startsWith("batch_id="))
      if (flat.nonEmpty) {
        val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(hc)
        val gen0 = new org.apache.hadoop.fs.Path(s"$dir/gen=0")
        fs.mkdirs(gen0)
        flat.foreach { st =>
          val dest = new org.apache.hadoop.fs.Path(gen0, st.getPath.getName)
          if (!fs.rename(st.getPath, dest))
            throw new java.io.IOException(
              s"legacy migration: rename ${st.getPath} -> $dest failed " +
                "(dest exists / permissions / cross-FS?) — aborting so the " +
                "next read retries instead of hiding committed batches")
        }
        log.warn(s"migrated ${flat.size} pre-generational batch dirs under $dir/gen=0")
      }
      java.lang.Boolean.TRUE
    })

  // the CANONICAL bucket conventions ([[IndexLayout.bucketExpr]]) — one
  // layout, two ingestion modes, and the re-bucketing compaction must
  // reassign with the identical expression
  private def bandBucket(nb: Int): Column = IndexLayout.bucketExpr("bands", nb)
  private def docBucket(nb: Int, id: Column = null): Column =
    IndexLayout.bucketExpr("shingles", nb, id)

  private val BandsSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, band_idx INT, band_hash INT")
  private val ShinglesSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, shingles ARRAY<BIGINT>")
  private val LabelsSchema =
    org.apache.spark.sql.types.StructType.fromDDL(
      "doc_id BIGINT, comp BIGINT")

  /** The per-batch manifest: batchId → that batch's max doc_id. One tiny
    * file per committed batch (shallow listing, O(#batches) driver work)
    * — the bounded state that turns the monotone-id contract from a
    * documented assumption into a loud `require`, and replay-safe where
    * a single max-id file would not be (a replayed batch must check
    * against batches strictly BEFORE it, not against its own previous
    * half-committed attempt).
    *
    * The O(#batches) term is AMORTIZED by [[compactIndex]]: compaction
    * folds every per-batch manifest into one `_cumulative` record
    * (max folded batch id + max folded doc_id) and deletes them, so a
    * long-lived ingest pays O(post-compaction tail) driver reads per
    * append, not O(lifetime batches) — a 10⁵-batch ingest with periodic
    * compaction lists a handful of files. The cumulative entry merges
    * back into this map keyed by its max batch id, which is exactly how
    * the contract check needs it: every folded batch's ids sit at or
    * below the folded max. */
  private def batchMeta(s: SparkSession, root: String): Map[Long, Long] = {
    val tail = Fs.list(metaDir(root), hconf(s)).flatMap { st =>
      val n = st.getPath.getName
      n.toLongOption.flatMap { id =>
        Fs.readBytes(s"${metaDir(root)}/$n", hconf(s))
          .map(b => id -> new String(b, "UTF-8").trim.toLong)
      }
    }.toMap
    cumulativeMeta(s, root).fold(tail) { case (mb, mx) =>
      tail + (mb -> math.max(mx, tail.getOrElse(mb, Long.MinValue)))
    }
  }

  /** The folded manifest [[compactIndex]] writes, parsed ONCE: max
    * folded batch id, max folded doc_id, and (third field, absent on
    * pre-flag files) whether the frozen LM had been seeded by fold
    * time. One parser so the two consumers cannot drift on the format. */
  private case class Cumulative(maxBatch: Long, maxDoc: Long, lmSeeded: Boolean)
  private def cumulative(s: SparkSession, root: String): Option[Cumulative] =
    Fs.readBytes(s"${metaDir(root)}/_cumulative", hconf(s)).map { b =>
      val parts = new String(b, "UTF-8").trim.split("\\s+")
      Cumulative(parts(0).toLong, parts(1).toLong, parts.lift(2).contains("1"))
    }

  private def cumulativeMeta(s: SparkSession, root: String): Option[(Long, Long)] =
    cumulative(s, root).map(c => (c.maxBatch, c.maxDoc))

  /** Whether the folded manifest records the frozen LM as seeded. The
    * flag exists because compaction destroys the evidence the live
    * `tagged` check otherwise reads: [[foldManifests]] collapses the
    * per-batch manifests to one cumulative max and [[compactRel]] folds
    * the per-batch attrs dirs into `batch_id=-1` — after both, "is
    * there an attrs dir whose batch id appears in the manifests?" is
    * vacuously false even for an artifact with thousands of committed
    * attribute rows, and [[ingestBatch]] would silently delete and
    * re-seed the frozen LM on the next surviving batch (scoring every
    * later shard against a different basis than the committed rows). */
  private def cumulativeLmSeeded(s: SparkSession, root: String): Boolean =
    cumulative(s, root).exists(_.lmSeeded)

  /** Crash-residue sweep (content-independent heal): every append
    * records its batch id in `_batchmeta/_inflight` before writing and
    * clears it after the manifest commits. A marker naming an
    * UNCOMMITTED batch at the next append means a crashed attempt may
    * have left attrs / index slices under that batch id — they are
    * deleted wholesale before planning, so the heal does not depend on
    * the retry carrying identical rows (dynamic overwrite alone only
    * replaces the partitions present in the NEW data; different content
    * would leave ghost slices that later batches could flag `is_dup`
    * against and compaction would fold in permanently). Happy-path cost
    * is one tiny read + two atomic writes per append; the listings run
    * only on the crash path. */
  private def sweepUncommitted(s: SparkSession, root: String,
      committed: Map[Long, Long]): Unit =
    Fs.readBytes(s"${metaDir(root)}/_inflight", hconf(s))
      .map(b => new String(b, "UTF-8").trim.toLong)
      .filterNot(committed.contains)
      .foreach { j =>
        ArtifactRels.foreach(rel =>
          delete(s, s"${liveRelDir(s, root, rel)}/batch_id=$j"))
        val idx = indexDir(root)
        if (exists(s, s"$idx/_buckets")) Seq("bands", "shingles").foreach { rel =>
          val g = IndexLayout.dataDir(s, idx, rel)
          Fs.list(g, hconf(s))
            .filter(_.getPath.getName.startsWith("bucket="))
            .foreach { b =>
              delete(s, s"${b.getPath}/batch_id=$j")
              // a bucket whose ONLY slice was the dead batch must go too:
              // residentSlice treats a present bucket dir as readable data
              if (Fs.list(b.getPath.toString, hconf(s)).isEmpty)
                delete(s, b.getPath.toString)
            }
        }
      }

  /** Tag `docs` against the artifact at `root` and append. Every id in
    * `docs` must be strictly above every id already committed (the
    * contract above — enforced). The first call seeds the frozen LM.
    * `batchId` < 0 means "next" (max committed id + 1); an explicit id
    * (the streaming caller's foreachBatch id) makes the append
    * idempotent under replay. */
  def appendBatch(s: SparkSession, root: String, docs: DataFrame,
      broadcastProbe: Boolean = true, batchId: Long = -1L): Unit =
    openBatch(s, root, docs, batchId).foreach { case (meta, eff, bMin, bMax) =>
      // freeze the reference LM on the first COMMITTED batch: gated on
      // the manifest (no batch committed yet → [re]seed), not on bare
      // directory existence — a crash mid-seed leaves a partial lm/ that
      // would otherwise suppress re-seeding forever, and a
      // crashed-then-retried batch 0 with different content must freeze
      // ITS counts, not the dead attempt's.
      if (meta.isEmpty) seedLm(s, root, docs)
      // intent marker for the residue sweep: records that batch `eff`
      // may be writing; cleared only after the manifest commits
      Fs.writeAtomic(s"${metaDir(root)}/_inflight",
        eff.toString.getBytes("UTF-8"), hconf(s))

      val (attrs, newSh, newBands, dupPairs, done) =
        batchPlans(s, root, docs, broadcastProbe, eff)
      try {
      // CLUSTER LABELS (round 19): fold this batch's verified dup pairs
      // into the incrementally-maintained component labels BEFORE the
      // concurrent writes (the delta is computed eagerly — collected on
      // the driver in the shard form, localCheckpointed by the CC loop
      // in the corpus form — so the labels write below is a pure replay
      // of materialized rows and never races the index writes it reads
      // nothing from). See [[labelDelta]] for the union-find shape.
      val labels = labelDelta(s, root, dupPairs, eff, bMin, broadcastProbe)
      // The three writes are INDEPENDENT jobs — attrs reads the resident
      // index through file indexes snapshotted at plan time, filtered
      // batch_id < eff, so it can never observe the concurrent eff
      // slices — and each is idempotent per batchId, so they run
      // concurrently: per-append wall time pays max(write) + plans, not
      // the sum of three sequential job+commit overheads. The manifest
      // commits LAST, only after all three writes succeed — a crash
      // before it leaves an uncommitted batch whose replay overwrites
      // exactly its own partitions.
      //
      // All three are plain LEAF-DIRECTORY overwrites of this batch's
      // own dir — index slices into the TAIL ([[IndexLayout
      // .appendTailSlice]]: the dynamic-partition form re-listed the
      // whole accumulated tree per append and fanned the batch into one
      // file per touched bucket, both of which grow with exactly the
      // things an append must be independent of), attrs into
      // `attrs/batch_id=N` for the same reason. Compaction folds the
      // index tail into real buckets; attrs batch dirs are the
      // artifact's natural ingest grain.
        val attrsDir = s"${liveRelDir(s, root, "attrs")}/batch_id=$eff"
        // the labels write joins only when the batch discovered pairs or
        // merges — committed label dirs always hold rows (the compactRel
        // invariant every artifact relation keeps)
        val labelWrites: Seq[() => Unit] =
          if (labels.isEmpty) Seq.empty
          else Seq(() => labels.write.mode("overwrite")
            .parquet(s"${liveRelDir(s, root, "labels")}/batch_id=$eff"))
        awaitAll((Seq[() => Unit](
          () => attrs.write.mode("overwrite").parquet(attrsDir),
          () => IndexLayout.appendTailSlice(newBands, indexDir(root),
            "bands", eff),
          () => IndexLayout.appendTailSlice(
            newSh.filter(size(col("shingles")) > 0),
            indexDir(root), "shingles", eff)) ++ labelWrites): _*)
        commitBatch(s, root, eff, bMax)
      } finally done()
    }

  /** Shared append envelope: manifest read, crash-residue sweep,
    * effective batch id, compaction replay guard, and the id-span +
    * monotone contract (one bounded 1-row aggregate). Returns
    * (manifest, effective id, batch min doc_id, batch max doc_id) —
    * None for an empty batch, nothing to commit. The batch MIN is the
    * resident/batch id boundary [[labelDelta]] keys on. */
  private def openBatch(s: SparkSession, root: String, docs: DataFrame,
      batchId: Long): Option[(Map[Long, Long], Long, Long, Long)] = {
    val meta = batchMeta(s, root)
    // heal any crashed attempt's residue BEFORE planning (plans snapshot
    // file indexes) — content-independent, see sweepUncommitted
    sweepUncommitted(s, root, meta)
    val eff =
      if (batchId >= 0) batchId
      else meta.keysIterator.maxOption.map(_ + 1L).getOrElse(0L)
    // a batch id at or below the folded boundary was ALREADY COMMITTED:
    // compaction only folds manifested batches (keepBatchIds), so every
    // id <= the cumulative max has a committed manifest by construction.
    // Such a delivery is a replay — legitimately possible when a crash
    // lands between the manifest commit and the Spark checkpoint commit
    // log, the operator compacts (every delivered batch IS committed,
    // satisfying the maintenance-window contract), and the restarted
    // stream re-delivers the batch. Re-running it would read the folded
    // batch_id=-1 rows (which now include later batches) as resident, so
    // the replay is a NO-OP instead: the committed state already holds
    // exactly this batch's effects, which is what replay convergence
    // means.
    // The no-op rests on the MONOTONE-ID contract (ids are assigned in
    // delivery order and never reused — the same contract the manifest
    // require enforces pre-fold). An operator who resets a stream's
    // checkpoint AND re-numbers genuinely new batches from 0 against a
    // folded artifact would have those batches skipped here — hence
    // WARN, not info: the message is the loud trace such a
    // contract-violating restart leaves.
    if (cumulativeMeta(s, root).exists { case (mb, _) => eff <= mb }) {
      log.warn(s"batch $eff re-delivered at or below the compaction-folded " +
        "boundary — treating as a committed replay and skipping (no-op). " +
        "If this batch is NEW data under a re-numbered stream, the " +
        "monotone-id contract was violated: resume ids above the folded max.")
      return None
    }
    val span = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
    if (span.isNullAt(0)) None
    else {
      val bMin = span.getAs[Number](0).longValue
      val bMax = span.getAs[Number](1).longValue
      val residentMax =
        meta.collect { case (id, mx) if id < eff => mx }.maxOption
      require(residentMax.forall(_ < bMin),
        s"monotone-id append contract violated: batch $eff's min doc_id " +
          s"$bMin is not above the resident max ${residentMax.getOrElse(-1L)}. " +
          "Incremental is_dup flags would be silently wrong (a lower-id " +
          "partner already tagged never retro-flips, and lower-id batch " +
          "docs would be mis-attributed). Ingest batches in doc_id order.")
      Some((meta, eff, bMin, bMax))
    }
  }

  /** (Re)write the frozen-LM artifact from `docs` and invalidate the
    * session's memoized copy — a re-seed after a crash heal must not
    * keep serving the dead attempt's counts from cache. */
  private def seedLm(s: SparkSession, root: String, docs: DataFrame): Unit = {
    delete(s, s"$root/lm")
    TextQs.lmGramCountsOf(docs).write.mode("overwrite").parquet(s"$root/lm")
    graft.Memo.invalidate(s, root, "incr_lm")
  }

  /** Run the batch's write jobs CONCURRENTLY and await ALL of them
    * before inspecting results: rethrowing on the first failure while
    * siblings still run would let a zombie job keep writing this batch's
    * output paths after the append returns — a same-JVM retry of the
    * batch then races it for the shared _temporary staging dir (the
    * zombie's job commit can delete the retry's), and the caller's
    * cleanup would unpersist relations under in-flight jobs. Only after
    * every job has finished does the first failure propagate. The
    * writes are independent: each is an idempotent leaf overwrite, and
    * readers in the plans see only `batch_id <` their own. */
  private def awaitAll(jobs: (() => Unit)*): Unit = {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val fs = jobs.map(j => Future(j()))
    fs.foreach(Await.ready(_, Duration.Inf))
    fs.foreach(_.value.get.get)
  }

  /** The commit point: manifest (atomic rename), then the inflight
    * marker clears — a crash before the manifest leaves an uncommitted
    * batch the next append sweeps. */
  private def commitBatch(s: SparkSession, root: String, eff: Long,
      bMax: Long): Unit = {
    Fs.writeAtomic(s"${metaDir(root)}/$eff",
      bMax.toString.getBytes("UTF-8"), hconf(s))
    Fs.delete(s"${metaDir(root)}/_inflight", hconf(s))
  }

  /** ONE fused admission+tagging transaction — the production ingest
    * loop's shape: a real pipeline tags only the documents it ADMITS,
    * and running [[graft.streaming.DocStream]] (admission) and
    * [[graft.streaming.AttrStream]] (tagging) as separate loops pays two
    * band probes and two index writes per batch for the same decision.
    * This method classifies the batch against the resident index with
    * DocStream's exact statuses and precedence (`low_quality` — the
    * optional [[graft.streaming.DocStream.MinScoreConfKey]] gate —
    * then `dup_corpus`, `dup_batch`, `new`), writes the verdicts to
    * `root/admissions/batch_id=N`, tags ONLY the `new` survivors with
    * the full attribute row, and appends their bands+shingles to the
    * index — one shared band probe, one index write (IngestSpec pins
    * both the single probe and the equivalence with
    * admission-then-tagging).
    *
    * Survivor attrs carry `is_dup = false` by construction — admission
    * already removed every doc with a J ≥ 0.8 partner (resident or
    * lower-id in-batch), which is exactly what a tagging pass over the
    * admitted set would conclude. The frozen LM seeds from the FIRST
    * batch with a nonzero survivor set (the composed-equivalence rule:
    * a tagging loop downstream of admission never sees dropped docs). A
    * batch whose every doc is dropped commits admissions + manifest and
    * nothing else. Same envelope as [[appendBatch]]: monotone-id
    * contract, inflight sweep, idempotent per-batchId writes —
    * at-least-once delivery composes to effectively-exactly-once. */
  def ingestBatch(s: SparkSession, root: String, docs: DataFrame,
      broadcastProbe: Boolean = true, batchId: Long = -1L): Unit =
    openBatch(s, root, docs, batchId).foreach { case (meta, eff, _, bMax) =>
      Fs.writeAtomic(s"${metaDir(root)}/_inflight",
        eff.toString.getBytes("UTF-8"), hconf(s))
      val idx = indexDir(root)
      val nb =
        if (exists(s, s"$idx/_buckets")) IndexLayout.numBuckets(s, idx)
        else IndexLayout.initMeta(s, idx)
      def hinted(df: DataFrame): DataFrame =
        if (broadcastProbe) broadcast(df) else df
      // optional language gate FIRST, then the quality gate — both
      // DocStream's confs and semantics verbatim (IngestSpec pins the
      // fused loop equals DocStream-then-tagging, so the precedence
      // wrong_lang → low_quality → dup_corpus → dup_batch → new must be
      // identical): rejected docs are excluded from scoring/shingling,
      // so they produce no candidates, classify as nothing but their
      // gate status, and never enter the index
      val wrongLang: Option[DataFrame] =
        s.conf.getOption(graft.streaming.DocStream.LangAllowConfKey)
          .map { csv =>
            val allow = csv.split(",").map(_.trim).filter(_.nonEmpty).toSeq
            TextOps.langIdScoresOf(docs)
              .filter(!col("pred_lang").isin(allow: _*))
              .select(col("doc_id")).persist()
          }
      val postLang = wrongLang.fold(docs)(w =>
        docs.join(w, Seq("doc_id"), "left_anti"))
      val lowQ: Option[DataFrame] =
        s.conf.getOption(graft.streaming.DocStream.MinScoreConfKey)
          .map(_.toLong).map { m =>
            TextOps.modelScoresOf(postLang).filter(col("score") <= m)
              .select(col("doc_id")).persist()
          }
      val eligible = lowQ.fold(postLang)(l =>
        postLang.join(l, Seq("doc_id"), "left_anti"))
      val newSh = DedupQs.shinglesOf(eligible).persist()
      val newBands = DedupQs.minhashBandsOf(newSh).persist()
      var cands: DataFrame = null
      try {
        // the fused loop consumes only the dup IDS: admitted survivors
        // are mutually non-dup by construction (admission drops every
        // doc with a surviving J >= 0.8 partner), so the survivor-index
        // artifact's clusters are all singletons and label maintenance
        // ([[labelDelta]]) has nothing to record on this path
        val (pairsResident, pairsBatch, c) =
          dupProbe(s, root, nb, newSh, newBands, broadcastProbe, eff)
        val dupResident = dupIdsOf(pairsResident)
        val dupBatch = dupIdsOf(pairsBatch)
        cands = c
        val withWl = wrongLang match {
          case Some(w) => docs.select("doc_id")
            .join(hinted(w.withColumn("__wl", lit(true))), Seq("doc_id"), "left")
          case None => docs.select("doc_id")
            .withColumn("__wl", lit(null).cast("boolean"))
        }
        val withLq = lowQ match {
          case Some(l) => withWl
            .join(hinted(l.withColumn("__lq", lit(true))), Seq("doc_id"), "left")
          case None => withWl
            .withColumn("__lq", lit(null).cast("boolean"))
        }
        withLq
          .join(hinted(dupResident.withColumn("__dc", lit(true))),
            Seq("doc_id"), "left")
          .join(hinted(dupBatch.withColumn("__db", lit(true))),
            Seq("doc_id"), "left")
          .select(col("doc_id"),
            when(col("__wl"), "wrong_lang")
              .when(col("__lq"), "low_quality")
              .when(col("__dc"), "dup_corpus")
              .when(col("__db"), "dup_batch")
              .otherwise("new").as("status"))
          .write.mode("overwrite")
          .parquet(s"${liveRelDir(s, root, "admissions")}/batch_id=$eff")
        // re-read the just-committed verdicts: breaks the plan lineage to
        // the index (Spark refuses to overwrite a path its plan reads)
        // and makes every later write a pure function of on-disk state
        val admitted = s.read.parquet(liveRelDir(s, root, "admissions"))
          .filter(col("batch_id") === eff && col("status") === "new")
          .select("doc_id")
        if (admitted.isEmpty) {
          // everything dropped: the admissions verdicts + manifest ARE
          // the batch's committed state (no attrs dir, no index slices,
          // no LM — exactly what admission-then-tagging would leave)
          commitBatch(s, root, eff, bMax)
        } else {
          val survivors = docs.join(hinted(admitted), "doc_id")
          // the frozen LM seeds from the first batch that ADMITS
          // anything: "no committed batch has an attrs partition yet"
          // (a committed manifest without attrs = a zero-survivor batch).
          // Committed evidence survives compaction in three forms: the
          // cumulative manifest's lmSeeded flag, the folded batch_id=-1
          // attrs slice, and (for the crash window where manifests fold
          // before attrs do) any attrs dir at or below the folded max —
          // a batch id can only have an attrs dir if it committed one.
          val cum = cumulative(s, root)
          val cumMax = cum.map(_.maxBatch).getOrElse(Long.MinValue)
          val tagged = cum.exists(_.lmSeeded) ||
            Fs.list(liveRelDir(s, root, "attrs"), hconf(s)).exists { st =>
              val n = st.getPath.getName
              n == "batch_id=-1" || (n.startsWith("batch_id=") &&
                n.stripPrefix("batch_id=").toLongOption.exists(id =>
                  id >= 0 && (meta.contains(id) || id <= cumMax)))
            }
          if (!tagged) seedLm(s, root, survivors)
          val attrs = attrRows(s, root, survivors, None, broadcastProbe)
          val keepSh = newSh.join(hinted(admitted), "doc_id")
          val keepBands = newBands.join(hinted(admitted), "doc_id")
          val attrsDir = s"${liveRelDir(s, root, "attrs")}/batch_id=$eff"
          // optional per-batch context-window emission (q146's chunking,
          // ONE shared definition — TextOps.contextWindowsOf — so the
          // streamed union over admitted batches equals the batch answer
          // over the admitted corpus; IngestSpec pins it). Windows are
          // per-doc local, so the step is embarrassingly incremental;
          // conf-gated (default off) because it roughly doubles the
          // batch's output bytes, a cost only window-training consumers
          // should pay. Idempotent like every write here (per-batch-dir
          // overwrite); windows are a dataset OUTPUT artifact, so
          // compaction leaves its per-batch shards in place (they are
          // the natural training-shard layout) — replays after
          // compaction are no-ops at openBatch and never touch them.
          val emitWindows =
            s.conf.getOption(EmitWindowsKey).exists(_.toBoolean)
          val windowWrites: Seq[() => Unit] =
            if (!emitWindows) Seq.empty
            else Seq(() => TextOps.contextWindowsOf(survivors)
              .write.mode("overwrite")
              .parquet(s"${liveRelDir(s, root, "windows")}/batch_id=$eff"))
          awaitAll((Seq[() => Unit](
            () => attrs.write.mode("overwrite").parquet(attrsDir),
            () => IndexLayout.appendTailSlice(keepBands, idx, "bands", eff),
            () => IndexLayout.appendTailSlice(
              keepSh.filter(size(col("shingles")) > 0),
              idx, "shingles", eff)) ++ windowWrites): _*)
          commitBatch(s, root, eff, bMax)
        }
      } finally {
        newSh.unpersist(); newBands.unpersist()
        lowQ.foreach(_.unpersist())
        wrongLang.foreach(_.unpersist())
        if (cands != null) cands.unpersist()
      }
    }

  /** The batch's (attrs, shingles, bands, verified dup pairs, cleanup)
    * plans against the CURRENT resident state — split from
    * [[appendBatch]] so the plans can be inspected without writing.
    * Call `cleanup` when done with the plans (it releases the
    * batch-sized persisted relations). */
  private[graft] def batchPlans(s: SparkSession, root: String,
      docs: DataFrame, broadcastProbe: Boolean = true, batchId: Long = -1L)
      : (DataFrame, DataFrame, DataFrame, DataFrame, () => Unit) = {
    val idx = indexDir(root)
    val eff =
      if (batchId >= 0) batchId
      else batchMeta(s, root).keysIterator.maxOption.map(_ + 1L).getOrElse(0L)
    // bucket count is a layout property fixed at first append (same
    // seed-once discipline as DocStream — conf key
    // spark.graft.stream.indexBuckets, persisted in index/_buckets)
    val nb =
      if (exists(s, s"$idx/_buckets")) IndexLayout.numBuckets(s, idx)
      else IndexLayout.initMeta(s, idx)

    // batch-sized relations, consumed by several joins below and by the
    // index writes — persisted for the lifetime of this append
    val newSh = DedupQs.shinglesOf(docs).persist()
    val newBands = DedupQs.minhashBandsOf(newSh).persist()

    val (pairsResident, pairsBatch, candsResident) =
      dupProbe(s, root, nb, newSh, newBands, broadcastProbe, eff)
    val dupIds = dupIdsOf(pairsResident.unionByName(pairsBatch))

    val attrs = attrRows(s, root, docs, Some(dupIds), broadcastProbe)
    val done = () => {
      newSh.unpersist(); newBands.unpersist(); candsResident.unpersist(); ()
    }
    (attrs, newSh, newBands,
      pairsResident.unionByName(pairsBatch).distinct(), done)
  }

  /** The dup probe against the CURRENT resident state: batch bands vs
    * resident (bucket-pruned read) plus the within-batch self-join,
    * lower-id partner + exact J >= 0.8 verify — the same banding
    * parameters and integer-exact rational as q36 through the shared
    * minhashBandsOf definition. The capBuckets bound applies to the
    * BATCH side only (a batch-sized aggregate): dropping a resident-side
    * cap only ADDS candidates (the exact verify keeps the answer exact),
    * and capping the resident previously cost two corpus-sized exchanges
    * per append plus a Spark 4.1 semi-through-union planner bug (see
    * round-14 history in git).
    *
    * Returns (resident-dup PAIRS, within-batch-dup PAIRS, the PERSISTED
    * resident-candidate relation — caller unpersists). Pairs are
    * (doc_a, doc_b) with doc_a < doc_b (monotone ids put the resident
    * side on doc_a by construction); callers derive dup doc ids as the
    * distinct doc_b side, and the label maintenance ([[labelDelta]] —
    * round 19) consumes the pairs themselves as its union-find edge
    * stream. The two relations stay separate so the admission form
    * ([[ingestBatch]]) can grade `dup_corpus` vs `dup_batch`; the
    * tagging form unions them into one `is_dup`. */
  private def dupProbe(s: SparkSession, root: String, nb: Int,
      newSh: DataFrame, newBands: DataFrame, broadcastProbe: Boolean,
      eff: Long): (DataFrame, DataFrame, DataFrame) = {
    val idx = indexDir(root)
    val bSide = DedupOps.capBuckets(
        newBands, Seq("band_idx", "band_hash"), DedupQs.MaxBucket)
      .select(col("doc_id").as("doc_b"), col("band_idx"), col("band_hash"))
    val bProbe = if (broadcastProbe) broadcast(bSide) else bSide

    // which index buckets can this batch's band lookups possibly hit?
    // A bounded driver-side scalar (≤ nb ints) off the persisted batch
    // bands — the price of turning the resident band read from
    // O(resident) into O(batch's buckets).
    val probeBuckets = newBands.select(bandBucket(nb).cast("int").as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val residentBands =
      IndexLayout.residentSlice(s, idx, "bands", eff, probeBuckets, BandsSchema)
    val candsResident = residentBands
      .select(col("doc_id").as("doc_a"), col("band_idx"), col("band_hash"))
      .join(bProbe, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct().persist()
    val candsBatch = newBands
      .select(col("doc_id").as("doc_a"), col("band_idx"), col("band_hash"))
      .join(bProbe, Seq("band_idx", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "doc_b").distinct()

    // Exact verify, integer-exact rational with array_intersect appearing
    // ONCE (the division form re-evaluates the intersect per reference
    // when Catalyst inlines it into the join condition — DedupQs.verified
    // history). The candidate pairs and the batch's own shingles are
    // shard-bounded FOR SHARD-SIZED BATCHES ONLY, so their broadcast
    // hints are gated on the same broadcastProbe flag as candidate
    // generation: a corpus-sized build takes the shuffled form end-to-end.
    val sb = newSh.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    def verify(cands: DataFrame, aSh: DataFrame): DataFrame = {
      val c = if (broadcastProbe) broadcast(cands) else cands
      val b = if (broadcastProbe) broadcast(sb) else sb
      val nInter = size(array_intersect(col("sh_a"), col("sh_b")))
      val sizeOk = lit(5) * least(size(col("sh_a")), size(col("sh_b"))) >=
        lit(4) * greatest(size(col("sh_a")), size(col("sh_b")))
      aSh.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
        .join(c, "doc_a").join(b, "doc_b")
        .filter(sizeOk && (lit(9) * nInter >=
          lit(4) * (size(col("sh_a")) + size(col("sh_b")))))
        .select(col("doc_a"), col("doc_b"))
    }
    // the resident shingle verify reads only the candidate docs' id
    // buckets — second bounded collect, off the persisted candidate
    // relation (which also keeps later actions from re-running the
    // resident band probe)
    val candBuckets = candsResident
      .select(docBucket(nb, col("doc_a")).as("b"))
      .distinct().collect().map(_.getInt(0)).toSeq
    val residentSh = IndexLayout.residentSlice(s, idx, "shingles", eff,
      candBuckets, ShinglesSchema)
    (verify(candsResident, residentSh).distinct(),
      verify(candsBatch, newSh).distinct(), candsResident)
  }

  /** The distinct dup doc ids of a verified pair relation — the doc_b
    * side (keep-first: the higher-id member of a pair is the dup). */
  private def dupIdsOf(pairs: DataFrame): DataFrame =
    pairs.select(col("doc_b").as("doc_id")).distinct()

  /** The RESOLVED component labels committed before batch `upTo`
    * ((doc_id, comp) with comp = min doc_id of the component; docs with
    * no row are singletons labeling themselves — the same implicit-
    * singleton convention as q144's clusterLabels). "Resolved" = min
    * comp per doc over every committed label row: label rows are
    * MONOTONE (a doc's comp only ever decreases — re-labels always move
    * to a smaller component min), so min is the winner regardless of
    * which batch wrote the row, which makes the relation fold-, replay-
    * and crash-safe by algebra instead of bookkeeping (no per-row
    * version column, and compaction's plain union preserves the
    * answer). Reads list EXPLICIT committed leaf dirs — never the
    * parent tree — so a concurrent append's in-flight dir is invisible
    * and a writing batch can read-then-write the same relation without
    * Spark's same-path overwrite guard firing. */
  private[graft] def labelsResolved(s: SparkSession, root: String,
      upTo: Long = Long.MaxValue): DataFrame = {
    val live = liveRelDir(s, root, "labels")
    val dirs = Fs.list(live, hconf(s)).map(_.getPath).filter { p =>
      val n = p.getName
      n == "batch_id=-1" || (n.startsWith("batch_id=") &&
        n.stripPrefix("batch_id=").toLongOption.exists(id =>
          id >= 0 && id < upTo))
    }
    if (dirs.isEmpty)
      s.createDataFrame(s.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        LabelsSchema)
    else s.read.parquet(dirs.map(_.toString): _*)
      .groupBy("doc_id").agg(min(col("comp")).as("comp"))
  }

  /** UNION-FIND OVER THE PAIR STREAM (round 19): the label rows batch
    * `eff`'s verified dup pairs add — computed against the labels
    * committed so far, so the admission loop's existing pair stream
    * maintains component labels INCREMENTALLY instead of q144 having to
    * re-run the whole banding+CC chain over the corpus (the round-18
    * verdict's ask #2; q151 grades the equivalence).
    *
    * Shape: every pair's doc_a (the lower, possibly-resident side) is
    * substituted by its CURRENT resolved comp, then one connected-
    * components run over the substituted edges — a BATCH-sized graph
    * (its nodes are this batch's docs plus the resident components they
    * touch), never the corpus. The CC's min label is the global
    * component min because resident comps already ARE their components'
    * min ids and monotone ingest puts every batch id above them. Three
    * row kinds come out:
    *
    *   - batch docs (node >= `bMin`): their first label;
    *   - MERGE re-labels: a resident comp c whose component min m < c
    *     means batch docs united two resident clusters — every resident
    *     doc resolving to c re-labels to m (bounded by the merged
    *     clusters' sizes, not the corpus);
    *   - the old representatives themselves (c, m) — c may have been an
    *     implicit singleton with no row of its own.
    *
    * All rows only ever DECREASE a doc's comp, which is what lets
    * [[labelsResolved]] resolve by min. Eagerly materialized (the CC
    * loop localCheckpoints each round), so callers can write the result
    * while other jobs run. */
  private def labelDelta(s: SparkSession, root: String, pairs: DataFrame,
      eff: Long, bMin: Long, broadcastProbe: Boolean): DataFrame =
    if (broadcastProbe) labelDeltaShard(s, root, pairs, eff, bMin)
    else labelDeltaDistributed(s, root, pairs, eff, bMin)

  /** The corpus-sized form: one distributed CC over the substituted
    * edges (a "batch" here can be half the corpus — `ensureBuilt`'s
    * halves — so nothing may collect). Shard appends take
    * [[labelDeltaShard]] instead: the CC loop's fixed overhead
    * (per-round localCheckpoints, counts, the symmetric-edge persist)
    * measured +~2 s on EVERY [append-100] shard append for a graph of
    * ~100 edges — the round-19 in-round profiling that split the form. */
  private def labelDeltaDistributed(s: SparkSession, root: String,
      pairs: DataFrame, eff: Long, bMin: Long): DataFrame = {
    val resolved = labelsResolved(s, root, upTo = eff)
    val withComp = pairs
      .join(resolved.withColumnRenamed("doc_id", "doc_a"), Seq("doc_a"), "left")
      .select(coalesce(col("comp"), col("doc_a")).as("a"),
        col("doc_b").as("b"))
    val cc = DedupOps.connectedComponents(withComp)
    val newDocs = cc.filter(col("id") >= bMin)
      .select(col("id").as("doc_id"), col("comp"))
    val remap = cc.filter(col("id") < bMin && col("comp") =!= col("id"))
      .select(col("id").as("old_comp"), col("comp").as("new_comp"))
    val relabel = resolved.join(remap, resolved("comp") === remap("old_comp"))
      .select(resolved("doc_id"), col("new_comp").as("comp"))
    val repRows = remap
      .select(col("old_comp").as("doc_id"), col("new_comp").as("comp"))
    // eager localCheckpoint: the caller probes isEmpty AND writes — with
    // only the CC rounds checkpointed, both would re-run the relabel
    // join and the committed-labels parquet scan; this makes the
    // "pure replay of materialized rows" contract true for this form too
    newDocs.unionByName(relabel).unionByName(repRows).distinct()
      .localCheckpoint(true)
  }

  /** The SHARD form: the batch's pair graph is bounded by the shard's
    * verified dups (the same boundedness that lets the probe broadcast),
    * so the union-find runs ON THE DRIVER — q68's bounded-collect
    * posture — for three jobs total (collect pairs; look up the touched
    * resident comps; write) instead of the distributed CC's
    * checkpoint-per-round loop. Byte-identical label rows to the
    * distributed form (IncrAttrSpec runs the merge fixture through BOTH
    * postures); only the resident-member RELABEL scan stays a DataFrame
    * op (merged clusters can be any size — their members never collect). */
  private def labelDeltaShard(s: SparkSession, root: String,
      pairs: DataFrame, eff: Long, bMin: Long): DataFrame = {
    val pe = pairs.select("doc_a", "doc_b").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val empty = s.createDataFrame(
      s.sparkContext.emptyRDD[org.apache.spark.sql.Row], LabelsSchema)
    if (pe.isEmpty) return empty
    // current comps of the RESIDENT doc_a side (batch docs have no rows;
    // an unlabeled resident doc_a is its own singleton comp)
    val residentAs = pe.map(_._1).distinct.filter(_ < bMin)
    val resolved = labelsResolved(s, root, upTo = eff)
    val compOf: Map[Long, Long] =
      if (residentAs.isEmpty) Map.empty
      else resolved.filter(col("doc_id").isin(residentAs: _*))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // union-find with min-id roots (path-compressing find)
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x
      else { val r = find(p); parent(x) = r; r }
    }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) {
        if (ra < rb) parent(rb) = ra else parent(ra) = rb
      }
    }
    pe.foreach { case (a, b) =>
      union(if (a < bMin) compOf.getOrElse(a, a) else a, b)
    }
    val nodes = parent.keySet ++
      pe.flatMap { case (a, b) =>
        Seq(if (a < bMin) compOf.getOrElse(a, a) else a, b) }
    val newDocs = nodes.iterator.filter(_ >= bMin)
      .map(d => (d, find(d))).toSeq
    val merges = nodes.iterator.filter(_ < bMin)
      .map(c => (c, find(c))).filter { case (c, m) => m < c }.toSeq
    import s.implicits._
    val direct = (newDocs ++ merges).distinct.toDF("doc_id", "comp")
    if (merges.isEmpty) direct
    else {
      // members of the merged resident clusters re-label to the new min
      // — a DataFrame op (cluster sizes are unbounded), tiny map side
      val remap = merges.toDF("old_comp", "new_comp")
      val relabel = resolved
        .join(broadcast(remap), resolved("comp") === col("old_comp"))
        .select(resolved("doc_id"), col("new_comp").as("comp"))
      direct.unionByName(relabel).distinct()
    }
  }

  /** The attribute rows JOINED with their dup-cluster labels — `comp`
    * (component min doc_id; singletons label themselves) and
    * `cluster_size`, exactly q144's clusterLabels composition but over
    * the INCREMENTALLY-maintained label relation, so assembly recipes
    * (q149's shape) run over the production streaming artifact with no
    * batch re-derivation of the cluster structure (q151 hash-grades the
    * equivalence against q149's composed oracle). */
  def clusteredAttrsOf(s: SparkSession, root: String): DataFrame = {
    val attrs = attrsOf(s, root)
    val lab = attrs.select("doc_id")
      .join(labelsResolved(s, root), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("comp"), col("doc_id")).as("comp"))
    val sz = lab.groupBy("comp").agg(count(lit(1)).as("cluster_size"))
    attrs.join(lab, "doc_id").join(sz, "comp")
  }

  /** The wide attribute row for `docs` — q136's graded columns via the
    * shared DataFrame-parameterized builders, + the frozen-LM ppl +
    * is_dup (from the probe's dup ids; `None` = a pre-deduplicated doc
    * set, the admission loop's survivors, where is_dup is false by
    * construction). The repetition gate reads the SAME fingerprint-width
    * conf as q84/q136/AttrTable, so an incremental build under
    * fingerprintBits=128 cannot diverge from the full build. */
  private def attrRows(s: SparkSession, root: String, docs: DataFrame,
      dupIds: Option[DataFrame], broadcastProbe: Boolean): DataFrame = {
    // The frozen LM, gram-partitioned ONCE per (session, root) and
    // cached: the relation is frozen by contract, so every append in a
    // long-lived ingest session reuses one exchange of it — the cached
    // InMemoryRelation carries hash(gram) partitioning and the
    // per-append score joins then exchange only the batch's gram
    // stream. MEMORY_AND_DISK via Memo — spillable at vocabulary scale.
    val lm = graft.Memo.cached(s, root, "incr_lm") {
      s.read.parquet(s"$root/lm").repartition(col("gram"))
    }
    val wide = s.conf.getOption("spark.graft.repetition.fingerprintBits")
      .contains("128")
    val base = docs.select(col("doc_id"), col("lang"), col("source"),
      col("n_chars"),
      size(TextOps.tokens(col("text"))).cast("int").as("n_tokens"),
      // the distinct-token count — q145's quality key, carried so
      // token-budget selection runs over the incremental artifact the
      // way AttrTable carries it for the batch one (round 19; per-doc,
      // so trivially incremental)
      size(array_distinct(TextOps.tokens(col("text")))).cast("long")
        .as("n_types"))
    // every right side is an O(batch) aggregate, so under the shard
    // posture they broadcast — the doc-keyed assembly joins become
    // map-side hash probes over the batch's own partitioning (no
    // doc_id exchanges, one output file instead of shuffle-partition
    // many), gated on the SAME flag as the probe: a corpus-sized build
    // takes the shuffled form end-to-end
    def hinted(df: DataFrame): DataFrame =
      if (broadcastProbe) broadcast(df) else df
    val scored = base
      .join(hinted(TextOps.modelScoresOf(docs)), "doc_id")
      .join(hinted(TextQs.pplAgainstLm(lm, docs).select("doc_id", "ppl_q")),
        Seq("doc_id"), "left")
      .join(hinted(TextQs.cascadeMaskOf(docs, wide).select("doc_id", "fail_mask")),
        "doc_id")
    dupIds match {
      case Some(d) => scored
        .join(hinted(d.withColumn("__dup", lit(true))), Seq("doc_id"), "left")
        .withColumn("is_dup", coalesce(col("__dup"), lit(false)))
        .drop("__dup")
      case None => scored.withColumn("is_dup", lit(false))
    }
  }

  /** Fold the dup-probe index's accumulated per-batch partitions into one
    * file per bucket (compacted rows land in `batch_id=-1`, which every
    * later batch's `< batchId` read includes). Same single-writer
    * contract as [[IndexLayout.compact]]: run between appends, never
    * while one is in flight.
    *
    * Three maintenance duties beyond the fold itself:
    *
    *   - RE-BUCKETING (`newBuckets` < 0, the default, auto-scales): the
    *     bucket count is seeded at [[IndexLayout.DefaultBuckets]] before
    *     the corpus size is knowable, and a fixed count makes the
    *     append-time probe read degrade back toward a full index scan
    *     as buckets fill (a 100-doc shard's ~1 600 band keys saturate
    *     all 64 default buckets, so "pruned" = everything). Compaction
    *     is the moment the resident size IS known: the fold re-buckets
    *     to [[IndexLayout.scaledBuckets]] of the live band-row count,
    *     keeping rows-per-bucket ~constant so a probe's read is
    *     O(probe keys × target rows), independent of resident size.
    *     Pass `0` to keep the current count, `> 0` to force one.
    *   - GHOST DROPPING: only rows of COMMITTED batches (those with a
    *     manifest) survive the fold — a crashed append's residue can
    *     never be folded into `batch_id=-1` permanently.
    *   - MANIFEST FOLDING: the per-batch `_batchmeta` files collapse
    *     into one `_cumulative` (max batch id + max doc_id) record, so
    *     append-time contract checks list O(tail), not O(lifetime). */
  def compactIndex(s: SparkSession, root: String, newBuckets: Int = -1): Unit = {
    val idx = indexDir(root)
    val meta = batchMeta(s, root)
    val target = if (newBuckets >= 0) newBuckets else autoBuckets(s, idx)
    IndexLayout.compact(s, idx, Seq("bands", "shingles"),
      target, Some(meta.keySet))
    ArtifactRels.foreach(compactRel(s, root, _, meta))
    // manifests fold LAST: a crash anywhere above leaves the per-batch
    // manifests intact, so every "is this batch committed?" check still
    // has its evidence (the id <= cumulative-max fallbacks only cover
    // the reverse window, where a PREVIOUS fold's cumulative exists)
    foldManifests(s, root, meta)
  }

  /** Fold an artifact relation's accumulated per-batch leaf dirs into ONE
    * doc_id-range-sorted slice of the next generation — the read-side
    * twin of the index fold. Two O(lifetime-batches) terms die here:
    *
    *   - DIRECTORY GROWTH: `attrs/batch_id=N` (and `admissions/...`)
    *     accrue one leaf dir per committed batch forever — a year-long
    *     ingest makes every whole-table read list thousands of dirs and
    *     open thousands of small files. After the fold the live
    *     generation holds one `batch_id=-1` dir of at most
    *     shuffle-partition-many files.
    *   - LOST CLUSTERING: the per-batch dirs are ordered by ARRIVAL, so
    *     the incremental artifact loses [[AttrTable]]'s doc_id-clustered
    *     layout and a doc-range selection (q138's shape) prunes nothing.
    *     The fold is [[SinkOps.rangedSortedParquet]] on doc_id — disjoint
    *     per-file ranges, so parquet min/max stats restore q138-class
    *     file pruning over the incrementally-built table. (Under the
    *     monotone-id contract batch order IS doc_id order across dirs,
    *     but nothing bounds per-file ranges within a batch, and readers
    *     can't know the cross-dir order without the manifests.)
    *
    * Crash safety is the index's generational discipline verbatim: the
    * next generation is written COMPLETELY, the per-relation `_gen`
    * pointer swaps atomically, old generations are GC'd after — a crash
    * leaves either the old or the new generation fully live, never a
    * merge of both (the in-place alternative, fold-then-delete-dirs,
    * double-counts every row a crash strands between the two steps).
    * Only COMMITTED batch dirs fold (manifest-gated, same ghost-dropping
    * rule as the index); an uncommitted crash residue dir is left in the
    * old generation and dies with its GC. Single-writer contract as
    * [[compactIndex]]. */
  private def compactRel(s: SparkSession, root: String, rel: String,
      meta: Map[Long, Long]): Unit = {
    val g = relGen(s, root, rel)
    val cur = s"$root/$rel/gen=$g"
    val cumMax = cumulativeMeta(s, root).map(_._1).getOrElse(Long.MinValue)
    val committed = Fs.list(cur, hconf(s)).map(_.getPath).filter { p =>
      val n = p.getName
      n == "batch_id=-1" || (n.startsWith("batch_id=") &&
        n.stripPrefix("batch_id=").toLongOption.exists(id =>
          id >= 0 && (meta.contains(id) || id <= cumMax)))
    }
    // committed dirs always hold rows (appends never write an empty
    // slice), so gating the fold on dir presence keeps the invariant
    // "a batch_id=-1 dir exists iff committed rows exist" — which is
    // what lets cumulativeLmSeeded derive the seed flag from it
    if (committed.nonEmpty) {
      val rows = s.read.parquet(committed.map(_.toString): _*)
      // labels RESOLVE at the fold (min comp per doc — the monotone-
      // label algebra of [[labelsResolved]]): this is the representative
      // re-labeling, where superseded merge rows die instead of being
      // carried forever. Every other relation folds rows verbatim.
      val folded =
        if (rel == "labels") rows.groupBy("doc_id").agg(min(col("comp")).as("comp"))
        else rows
      // parts = 0: AQE sizes the fold's file count from the DATA (a
      // KB-scale artifact folds to one file; q151's selection plan
      // scans attrs five times, and a 32-way fold made each of those
      // scans a 32-task stage of pure reader-init overhead)
      SinkOps.rangedSortedParquet(
        folded, "doc_id",
        s"$root/$rel/gen=${g + 1}/batch_id=-1",
        parts = 0,
        maxRecordsPerFile = 5000000L)
      Fs.writeAtomic(s"$root/$rel/_gen",
        (g + 1).toString.getBytes("UTF-8"), hconf(s))
      Fs.list(s"$root/$rel", hconf(s))
        .filter { st =>
          val n = st.getPath.getName
          n.startsWith("gen=") && n.stripPrefix("gen=").toLongOption.exists(_ <= g)
        }
        .foreach(st => Fs.delete(st.getPath.toString, hconf(s)))
    }
  }

  /** [[IndexLayout.scaledBuckets]] of the live band-row count — one
    * count over the generation being folded (cheap beside its rewrite). */
  private def autoBuckets(s: SparkSession, idx: String): Int = {
    val target = s.conf.getOption(IndexLayout.BucketRowsConfKey)
      .map(_.toLong).getOrElse(IndexLayout.DefaultBucketRows)
    IndexLayout.scaledBuckets(
      s.read.parquet(IndexLayout.dataDir(s, idx, "bands")).count(), target)
  }

  private def foldManifests(s: SparkSession, root: String,
      meta: Map[Long, Long]): Unit = if (meta.nonEmpty) {
    // the LM-seeded flag folds in with the manifests: after [[compactRel]]
    // a batch_id=-1 attrs slice exists iff committed attribute rows ever
    // did (see compactRel's gate), so "live attrs fold present || prior
    // flag" is exactly "some batch has ever survived to tagging"
    val seeded = cumulativeLmSeeded(s, root) ||
      exists(s, s"${liveRelDir(s, root, "attrs")}/batch_id=-1")
    Fs.writeAtomic(s"${metaDir(root)}/_cumulative",
      s"${meta.keys.max} ${meta.values.max} ${if (seeded) 1 else 0}"
        .getBytes("UTF-8"), hconf(s))
    // the cumulative record is committed — the per-batch files are now
    // redundant (crash between deletes just leaves a few extras that the
    // batchMeta merge handles)
    meta.keys.foreach(id => Fs.delete(s"${metaDir(root)}/$id", hconf(s)))
  }

  /** [[compactIndex]] behind DocStream's small-files pressure trigger —
    * the maintenance call a long-lived shard-ingest loop makes between
    * appends. Returns whether a compaction ran. */
  def maybeCompactIndex(s: SparkSession, root: String,
      maxDirsPerBucket: Int = 32): Boolean = {
    val meta = batchMeta(s, root)
    val ran = IndexLayout.maybeCompact(s, indexDir(root),
      Seq("bands", "shingles"), maxDirsPerBucket,
      newBuckets = () => autoBuckets(s, indexDir(root)),
      keepBatchIds = Some(meta.keySet))
    if (ran) {
      // the artifact rels ride the index's pressure trigger: their dir
      // growth is the same one-per-batch rate as the index tail's, so a
      // separate trigger would just fire at the same cadence
      ArtifactRels.foreach(compactRel(s, root, _, meta))
      foldManifests(s, root, meta)
    }
    ran
  }

  /** The attribute table built PURELY through the incremental path: two
    * batches split at mid = (min_id + max_id) div 2 (one bounded 1-row
    * collect — ids are non-negative so JVM / and DuckDB // agree). The
    * seed batch freezes the LM; the second batch exercises the
    * resident-index probe and the frozen-LM backoff. Memoized per
    * (session, corpus); a pre-existing tree from another process is
    * deleted first. */
  def ensureBuilt(s: SparkSession, d: String): String =
    built.computeIfAbsent((s, d), { _ =>
      val root = dir(d)
      delete(s, root)
      val docs = graft.Tables.documents(s, d)
      val row = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val mid = (row.getAs[Number](0).longValue + row.getAs[Number](1).longValue) / 2
      appendBatch(s, root, docs.filter(col("doc_id") <= mid), broadcastProbe = false)
      appendBatch(s, root, docs.filter(col("doc_id") > mid), broadcastProbe = false)
      // the build is the first moment the corpus size is known: fold the
      // two half-slices AND re-bucket the index to corpus density, so
      // every later shard append probes a right-sized layout (semantics
      // unchanged — IncrAttrSpec pins compaction invariance)
      compactIndex(s, root)
      root
    })

  /** Read the incrementally-built attribute table (plain parquet scan —
    * downstream selection plans contain no `documents` relation). The
    * `batch_id` partition column is an ingest-bookkeeping detail, not an
    * attribute — dropped so the table's shape is identical to
    * [[AttrTable]]'s. [[ensureBuilt]] ends in a compaction, so the scan
    * this returns reads the doc_id-range-sorted fold ([[compactRel]]) —
    * the same file-pruning layout AttrTable writes. */
  def materialized(s: SparkSession, d: String): DataFrame =
    attrsOf(s, ensureBuilt(s, d))

  /** The live attribute rows of the artifact at `root` (batch_id
    * bookkeeping dropped). */
  def attrsOf(s: SparkSession, root: String): DataFrame =
    s.read.parquet(liveRelDir(s, root, "attrs")).drop("batch_id")

  /** The live admission verdicts (doc_id, status) of a FUSED-loop
    * artifact at `root` (batch_id bookkeeping dropped). */
  def admissionsOf(s: SparkSession, root: String): DataFrame =
    s.read.parquet(liveRelDir(s, root, "admissions")).drop("batch_id")

  /** The artifact built PURELY through the FUSED admission+tagging path
    * ([[ingestBatch]]): the same two-batch mid split as [[ensureBuilt]],
    * each batch classified against the resident-survivor index, only
    * survivors tagged, then compacted. This is what q143 grades — note
    * the semantics differ from [[ensureBuilt]]'s tag-everything loop:
    * the resident index holds only ADMITTED docs, so a batch-2 doc whose
    * sole J ≥ 0.8 partner was itself dropped in batch 1 is `new` here
    * (admission semantics: you cannot duplicate a document the corpus
    * rejected), and the frozen LM seeds from batch 1's SURVIVORS. */
  def ensureIngested(s: SparkSession, d: String): String =
    ingested.computeIfAbsent((s, d), { _ =>
      val root = "/tmp/graft-ingest/" + AttrTable.pathSlug(d)
      delete(s, root)
      val docs = graft.Tables.documents(s, d)
      val row = docs.agg(min(col("doc_id")), max(col("doc_id"))).head()
      val mid = (row.getAs[Number](0).longValue + row.getAs[Number](1).longValue) / 2
      ingestBatch(s, root, docs.filter(col("doc_id") <= mid), broadcastProbe = false)
      ingestBatch(s, root, docs.filter(col("doc_id") > mid), broadcastProbe = false)
      compactIndex(s, root)
      root
    })

  private val ingested =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), String]()
}
