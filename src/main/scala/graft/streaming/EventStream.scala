package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Structured Streaming over the `events` table shape (SURVEY.md §2.5
  * streaming row): file source → watermark → windowed aggregation. The
  * batch twins live in `graft.queries.EventQs` (q50-q52); the ScalaTest
  * suite proves stream-vs-batch equivalence, since no SQL oracle can
  * grade a stream.
  *
  * The micro-batch + checkpoint pattern here is the engine-managed form
  * of the reference's month loop (movie.py:260-286): `Trigger
  * .AvailableNow` + `checkpointLocation` give the same resume-where-you-
  * left-off semantics with exactly-once sinks.
  */
object EventStream {

  /** Events schema with `ts` as epoch-nanos BIGINT — the shape the
    * synthetic test streams write. The real corpus has shipped `ts` as
    * both TIMESTAMP(NANOS) and TIMESTAMP_MICROS; a file stream needs an
    * explicit schema, so [[schemaFor]] reads it off the actual files and
    * [[withEventTs]] branches exactly like `Tables.events` does. */
  val EventsSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", LongType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** The streaming source requires a user-supplied schema; take it from a
    * one-off batch read of the directory (one footer read — cheap) so the
    * stream always matches the files' actual `ts` encoding. */
  def schemaFor(spark: SparkSession, sourceDir: String): StructType =
    spark.read.parquet(sourceDir).schema

  private def withEventTs(df: DataFrame): DataFrame =
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("event_ts", expr("timestamp_micros(ts div 1000)"))
      case _ =>
        df.withColumn("event_ts", col("ts").cast(TimestampType))
    }

  /** Streaming tumbling 1-hour counts per event type with a 1-hour
    * watermark — the streaming twin of q50.
    */
  def tumblingCounts(spark: SparkSession, sourceDir: String): DataFrame =
    withEventTs(spark.readStream.schema(schemaFor(spark, sourceDir)).parquet(sourceDir))
      .withWatermark("event_ts", "1 hour")
      .groupBy(window(col("event_ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"), col("n_events"))

  /** Streaming per-user session windows (10-minute gap) — q52's twin. */
  def sessionCounts(spark: SparkSession, sourceDir: String): DataFrame =
    withEventTs(spark.readStream.schema(schemaFor(spark, sourceDir)).parquet(sourceDir))
      .withWatermark("event_ts", "30 minutes")
      .groupBy(session_window(col("event_ts"), "10 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("w.start").as("sess_start"), col("n_events"))

  /** Streaming exact dedup on the event key, bounded by the watermark:
    * `dropDuplicatesWithinWatermark` keeps per-key state only until the
    * watermark passes the first sighting — the unbounded-state-safe form
    * of streaming dedup (plain `dropDuplicates` on a stream grows state
    * forever). Batch twin: `DedupOps.exactDedup` on `event_id`.
    */
  def dedupedEvents(spark: SparkSession, sourceDir: String): DataFrame =
    withEventTs(spark.readStream.schema(schemaFor(spark, sourceDir)).parquet(sourceDir))
      .withWatermark("event_ts", "1 hour")
      .dropDuplicatesWithinWatermark("event_id")
      .select(col("event_id"), col("user_id"), col("event_type"), col("value"))

  /** Stream-static enrichment join: each micro-batch joins against a
    * STATIC dimension (re-read per batch, broadcast when small) — the
    * streaming analog of the genre-dimension lookup (S3). No state, no
    * watermark needed: the static side is not a stream.
    */
  def enrichedCounts(spark: SparkSession, sourceDir: String, dim: DataFrame): DataFrame =
    withEventTs(spark.readStream.schema(schemaFor(spark, sourceDir)).parquet(sourceDir))
      .join(broadcast(dim), "event_type")
      .groupBy(col("category"))
      .agg(count(lit(1)).as("n_events"))

  /** Stream-STREAM interval join: every `click` joined to the same
    * user's `view`s from the preceding 30 minutes — the funnel/attribution
    * shape. Both sides carry watermarks and the join condition carries
    * BOTH time bounds, which is what lets the engine drop buffered state:
    * a view older than (watermark − 30 min) can never match a future
    * click, so its buffer entry is evicted instead of growing forever —
    * the stream-stream analog of `dropDuplicatesWithinWatermark`'s
    * bounded-state argument. Inner join: unmatched rows simply expire.
    */
  def viewClickFunnel(spark: SparkSession, sourceDir: String): DataFrame = {
    val base = withEventTs(spark.readStream.schema(schemaFor(spark, sourceDir)).parquet(sourceDir))
    val views = base.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_id").as("view_id"),
        col("event_ts").as("view_ts"))
      .withWatermark("view_ts", "1 hour")
    val clicks = base.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("event_id").as("click_id"),
        col("event_ts").as("click_ts"))
      .withWatermark("click_ts", "1 hour")
    views.join(clicks,
      col("v_user") === col("c_user") &&
        col("click_ts") >= col("view_ts") &&
        col("click_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      .select(col("v_user").as("user_id"), col("view_id"), col("click_id"),
        col("view_ts"), col("click_ts"))
  }

  /** Custom keyed state via `flatMapGroupsWithState`: a per-user running
    * event count that survives micro-batch boundaries (pair with
    * `maxFilesPerTrigger` to force multiple batches). Emits the updated
    * count for each user touched in a batch — update output mode.
    */
  def statefulUserCounts(spark: SparkSession, sourceDir: String,
      maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    spark.readStream
      .schema(schemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .select(col("user_id")).as[Long]
      .groupByKey(identity)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[Long], state: GroupState[Long]) =>
          val updated = state.getOption.getOrElse(0L) + rows.size
          state.update(updated)
          Iterator((uid, updated))
      }
      .toDF("user_id", "running_count")
  }

  /** Streaming heavy hitters: a [[graft.ops.SketchOps.MisraGries]]
    * summary as KEYED STREAMING STATE — per `event_type`, the sketch
    * folds each micro-batch's items into ≤`k` counters and emits the
    * current candidate set (update mode). This is the unbounded-stream
    * form of q67's sketch-then-verify: state stays ≤k counters per key
    * FOREVER (no watermark needed — the sketch, not eviction, bounds
    * it), and the superset guarantee (any item with frequency > n/(k+1)
    * over the whole stream so far is present) holds across micro-batch
    * boundaries because batch-folding is exactly the sketch's merge
    * order. An exact-verify pass over any window of interest turns the
    * candidates into exact answers, as in the batch query.
    */
  def streamingHeavyHitters(spark: SparkSession, sourceDir: String,
      k: Int, maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val mg = new graft.ops.SketchOps.MisraGries(k)
    spark.readStream
      .schema(schemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").as("item"))
      .filter(col("item").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[(String, String)],
            state: GroupState[Map[String, Long]]) =>
          val updated = rows.foldLeft(state.getOption.getOrElse(mg.zero)) {
            (b, r) => mg.reduce(b, r._2)
          }
          state.update(updated)
          Iterator((etype, mg.finish(updated)))
      }
      .toDF("event_type", "candidates")
  }

  /** Streaming quantile estimates: a [[graft.ops.SketchOps.QuantileSketch]]
    * buffer as KEYED STREAMING STATE — per `event_type`, each micro-batch
    * folds its values into the sketch and emits the current percentile
    * estimates (update mode). The unbounded-stream complement of the
    * exact batch tiers (q65/q68) and the batch-graded sketch path (q77):
    * state stays ≤k·⌈log₂(n/k)⌉ values per key FOREVER — compaction, not
    * watermark eviction, bounds it — and batch-folding is exactly the
    * sketch's deterministic reduce order, so a given file/trigger split
    * reproduces bit-identically. Estimates carry the sketch's rank-error
    * bound over the whole stream so far (`SketchSpec` pins ≤5% at
    * k=200); where a window must be EXACT, run q77's sketch-then-verify
    * over that window in batch — same split q67 uses for its streaming
    * candidates.
    */
  def streamingQuantiles(spark: SparkSession, sourceDir: String,
      k: Int, percentiles: Seq[Int], maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(percentiles.nonEmpty && percentiles.forall(p => p >= 0 && p <= 100),
      s"percentiles must be in [0,100]: $percentiles")
    val qs = new graft.ops.SketchOps.QuantileSketch(k)
    spark.readStream
      .schema(schemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .select(col("event_type"), col("value"))
      .filter(col("value").isNotNull)
      .as[(String, Double)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[(String, Double)],
            state: GroupState[(Int, Seq[Seq[Double]])]) =>
          val updated = rows.foldLeft(state.getOption.getOrElse(qs.zero)) {
            (b, r) => qs.reduce(b, r._2)
          }
          state.update(updated)
          val summary = qs.finish(updated)
          percentiles.iterator.map(p =>
            (etype, p, graft.ops.SketchOps.QuantileSketch.estimate(summary, p)))
      }
      .toDF("event_type", "p", "est")
  }

  /** Streaming CMS frequency counters: a [[graft.ops.SketchOps.CountMin]]
    * counter array as KEYED STREAMING STATE — per `event_type`, each
    * micro-batch folds its items into the d×w cells and emits the
    * current array (update mode). Fixed d·w longs per key FOREVER, like
    * the other sketch states — but unlike the compacting KLL buffer and
    * the shrink-bearing Misra–Gries counters, the CMS state is
    * MERGE-TREE-INDEPENDENT (per-cell integer sums), so the counters
    * after the final batch are BYTE-IDENTICAL under ANY file/trigger
    * split of the same stream, and equal to the one-shot batch
    * aggregation — the strongest batch-equivalence in the streaming
    * sketch family (`StreamingSpec` pins 1-file-vs-2-file splits equal
    * to the batch counters). q89's estimate-then-exact-verify split
    * applies unchanged over any window of interest.
    */
  def streamingCmsCounts(spark: SparkSession, sourceDir: String,
      d: Int, w: Int, maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val cms = new graft.ops.SketchOps.CountMin(d, w)
    spark.readStream
      .schema(schemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").as("item"))
      .filter(col("item").isNotNull)
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[(String, String)],
            state: GroupState[Array[Long]]) =>
          val updated = rows.foldLeft(state.getOption.getOrElse(cms.zero)) {
            (b, r) => cms.reduce(b, r._2)
          }
          state.update(updated)
          Iterator((etype, updated.toSeq))
      }
      .toDF("event_type", "counters")
  }

  /** Streaming HLL distinct counts: the [[graft.ops.SketchOps.HyperLogLog]]
    * register array as KEYED STREAMING STATE — per `event_type`, each
    * micro-batch folds its user ids in and emits the current distinct
    * estimate (update mode). Like [[streamingCmsCounts]] the state is
    * MERGE-TREE-INDEPENDENT (per-register max), so the registers after
    * the final batch are byte-identical under any trigger split and the
    * emitted estimate equals the batch q79 sketch's exactly — with the
    * same fixed 2^p bytes per key forever.
    */
  def streamingDistinct(spark: SparkSession, sourceDir: String,
      p: Int, maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val hll = new graft.ops.SketchOps.HyperLogLog(p)
    spark.readStream
      .schema(schemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .select(col("event_type"), col("user_id").cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[(String, String)],
            state: GroupState[Array[Byte]]) =>
          val updated = rows.foldLeft(state.getOption.getOrElse(hll.zero)) {
            (b, r) => hll.reduce(b, r._2)
          }
          state.update(updated)
          Iterator((etype, hll.finish(updated)))
      }
      .toDF("event_type", "est_distinct")
  }

  /** Streaming KMV bottom-k sketches: [[graft.ops.SketchOps.KMinValues]]
    * as KEYED STREAMING STATE — per `event_type`, each batch folds its
    * user ids and emits the current sorted bottom-k hash set (update
    * mode; ≤k longs per key forever). The sketch content is a pure
    * function of the SET seen so far — order- and split-independent,
    * exact below saturation — so q87's pairwise intersection/union
    * algebra applies to the LIVE states at any point in the stream:
    * continuous audience-overlap without re-scanning history.
    */
  def streamingKmv(spark: SparkSession, sourceDir: String,
      k: Int, maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    val kmv = new graft.ops.SketchOps.KMinValues(k)
    spark.readStream
      .schema(schemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir)
      .select(col("event_type"), col("user_id").cast("string"))
      .as[(String, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (etype: String, rows: Iterator[(String, String)],
            state: GroupState[Seq[Long]]) =>
          val updated = rows.foldLeft(state.getOption.getOrElse(kmv.zero)) {
            (b, r) => kmv.reduce(b, r._2)
          }
          state.update(updated)
          Iterator((etype, updated))
      }
      .toDF("event_type", "sketch")
  }

  /** Streaming strict-sequence funnel: per-user step timestamps as KEYED
    * STREAMING STATE — the grow-forever form of q88
    * ([[graft.ops.FunnelOps.funnel]]). State is the user's filled step
    * prefix (≤|steps| longs per user FOREVER — the funnel, not a
    * watermark, bounds it); each micro-batch folds its rows in
    * EVENT-TIME order, and an event fills the first unfilled step iff
    * its type matches and it is strictly after the timestamp that
    * satisfied the previous step — exactly the batch semantics, applied
    * incrementally. Emits the user's step-timestamp prefix after each
    * touched batch (update mode; the per-step rollup is `groupBy(depth)`
    * over the final states).
    *
    * Contract: equal to the batch funnel when each user's events arrive
    * in event-time order ACROSS batches (in-batch order is irrelevant —
    * the fold sorts); an out-of-order arrival can only UNDER-fill, never
    * mis-fill, because a filled slot is immutable and every fill is
    * checked strictly-after against the slot before it. Replay-tolerant
    * for the same reason: a redelivered event that filled slot i finds
    * slot i occupied by an earlier-or-equal timestamp and no-ops.
    */
  def streamingFunnel(spark: SparkSession, sourceDir: String,
      steps: Seq[String], maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    require(steps.nonEmpty, "funnel needs at least one step")
    withEventTs(spark.readStream
      .schema(schemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir))
      .select(col("user_id"), col("event_type"), unix_micros(col("event_ts")).as("ts_us"))
      .as[(Long, String, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, String, Long)],
            state: GroupState[Seq[Long]]) =>
          val updated = rows.toSeq.sortBy(_._3)
            .foldLeft(state.getOption.getOrElse(Vector.empty[Long])) {
              case (t, (_, typ, ts)) =>
                val depth = t.length
                if (depth < steps.length && typ == steps(depth) &&
                    (depth == 0 || ts > t(depth - 1))) t :+ ts
                else t
            }
          state.update(updated)
          Iterator((uid, updated))
      }
      .toDF("user_id", "step_ts")
  }

  /** Streaming SCD2 — [[graft.ops.ScdOps.history]]'s twin as per-user
    * keyed state: the state is the OPEN version `(item, valid_from_us,
    * version)`; each batch folds its observations (item = `props.k`,
    * NULLs dropped — the batch op's gap semantics) in (ts_us, event_id)
    * order, and every value CHANGE closes the current interval (emitted
    * downstream) and opens the next. Output rows are exactly the CLOSED
    * intervals; the open current version lives only in state — the
    * emit-on-close form a CDC feed into a dimension store wants (the
    * batch op's NULL-valid_to row is the state, not an emission).
    *
    * Batch-equivalent under in-order delivery ACROSS batches (within a
    * batch the fold sorts): the closed-interval set equals the batch
    * op's non-NULL-valid_to rows, spec-pinned incl. a cross-batch run
    * continuing (no spurious close at the batch boundary) and a
    * cross-batch change closing the interval opened batches earlier. A
    * LATE arrival (ts before the open version's valid_from) cannot
    * rewrite an already-emitted interval — it is folded against the
    * open state like any observation; feeds needing late rewrites
    * re-run the batch op over the corrected log.
    */
  def streamingScd2(spark: SparkSession, sourceDir: String,
      maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    withEventTs(spark.readStream
      .schema(schemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir))
      .select(col("user_id"), col("event_id"), unix_micros(col("event_ts")).as("us"),
        get_json_object(col("props"), "$.k").cast("long").as("item"))
      .filter(col("item").isNotNull)
      .as[(Long, Long, Long, Long)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, Long)],
            state: GroupState[(Long, Long, Long)]) =>
          val closed = Vector.newBuilder[(Long, Long, Long, Long, Long)]
          var st = state.getOption
          rows.toSeq.sortBy(r => (r._3, r._2)).foreach { case (_, _, us, item) =>
            st match {
              case None => st = Some((item, us, 1L))
              case Some((cur, from, ver)) if cur != item =>
                closed += ((uid, cur, from, us, ver))
                st = Some((item, us, ver + 1))
              case _ => () // same value: the run continues
            }
          }
          st.foreach(state.update)
          closed.result().iterator
      }
      .toDF("user_id", "item", "valid_from", "valid_to", "version")
  }

  /** Streaming transition pairs — q113's twin as per-user keyed state:
    * the state is the LAST observed (ts_us, event_id, event_type); each
    * batch folds its rows in the batch op's (ts_us, event_id) total
    * order and emits one (prev, cur) pair per consecutive observation,
    * INCLUDING the pair that spans the batch boundary (state → first
    * row). Downstream counts/aggregations are the consumer's (the
    * transition matrix is `groupBy(prev, cur).count` over the emitted
    * pairs — kept outside so the emission stays a pure delta stream).
    *
    * CONSUMER CONTRACT for that count pattern: (a) MEMORY — each user's
    * rows WITHIN one micro-batch are buffered on one task to sort into
    * the total order (`rows.toSeq`), so per-user-per-batch volume must
    * fit a task's heap; a skewed user is bounded by trigger sizing
    * (`maxFilesPerTrigger`), not by this operator. (b) LATE DATA — a row
    * arriving after its successor pair was emitted SILENTLY SKEWS the
    * downstream matrix (the already-emitted pair is never retracted), so
    * feeds that need late rewrites re-run the q113 batch op. (c) REPLAY
    * — delta emission re-emits a reprocessed batch's pairs; exactly-once
    * counts need the batch_id-idempotent sink posture.
    *
    * The state is MERGED INTO the batch's sorted order at its (ts_us,
    * event_id) position rather than blindly used as the predecessor of
    * the whole batch: a row that orders BEFORE the state (e.g. the
    * same-microsecond sibling with the smaller event_id landing in the
    * next trigger) pairs in the batch op's total order, not arrival
    * order. Batch-equivalence therefore holds under any trigger split
    * in which the state has not yet emitted a successor pair when the
    * out-of-order row arrives; once a successor pair is out, a late
    * arrival cannot retract it (the SCD2 twin's posture — feeds needing
    * late rewrites re-run the batch op). Emission is delta-based, so a
    * REPLAY of a processed batch re-emits its pairs: exactly-once
    * counting needs the DocStream batch_id-partitioned idempotent sink
    * posture.
    */
  def streamingTransitions(spark: SparkSession, sourceDir: String,
      maxFilesPerTrigger: Int): DataFrame = {
    import spark.implicits._
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    withEventTs(spark.readStream
      .schema(schemaFor(spark, sourceDir))
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(sourceDir))
      .select(col("user_id"), col("event_id"),
        unix_micros(col("event_ts")).as("us"), col("event_type"))
      .as[(Long, Long, Long, String)]
      .groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (uid: Long, rows: Iterator[(Long, Long, Long, String)],
            state: GroupState[(Long, Long, String)]) =>
          val out = Vector.newBuilder[(Long, String, String)]
          // (us, event_id, type) observations: the state slots into the
          // batch's total order like any other — the first element of
          // the merged sequence emits no pair (its predecessor, if any,
          // paired with it when IT was current state)
          val incoming = rows.toSeq.map(r => (r._3, r._2, r._4))
          val merged = (state.getOption.toSeq ++ incoming)
            .sortBy(o => (o._1, o._2))
          merged.sliding(2).foreach {
            case Seq((_, _, ptyp), (_, _, typ)) => out += ((uid, ptyp, typ))
            case _ => ()
          }
          merged.lastOption.foreach(state.update)
          out.result().iterator
      }
      .toDF("user_id", "prev_type", "cur_type")
  }
}
