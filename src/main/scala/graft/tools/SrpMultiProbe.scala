package graft.tools

import graft.Tables
import graft.ops.{DedupOps, VectorOps}
import graft.queries.VectorQs
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Recall-vs-L measurement for the multi-table SRP construction (q139's
  * evidence tool, the vector-family sibling of [[SimhashProbe]]): for
  * each (band width, table-set count L) configuration, count the distinct
  * candidate pairs the banded self-join generates and how many of the
  * EXACT cos ≥ 0.45 pairs survive the verify — against the brute-force
  * ground truth (feasible at probe scales: one corpus² cosine pass).
  *
  * The table this prints is SURVEY §2.0.2's recall-vs-L curve: the width
  * ladder showed widening bands starves weak-cosine recall (16-bit L=1
  * finds none of this corpus's cos ≥ 0.45 pairs); the L axis is the
  * standard amplifier — miss probability (1 − p^bits)^(L·64/bits) decays
  * in L at FIXED per-table selectivity, so candidates grow linearly in L
  * while recall approaches 1. The interesting row is the L where the
  * 16-bit union's candidate count crosses the 8-bit single-set budget.
  *
  * Usage: `runMain graft.tools.SrpMultiProbe [dir]` — the recall-vs-L
  * curve at probe scale.
  *
  * RECALL-UNDER-CAP mode (`runMain graft.tools.SrpMultiProbe <baseDir>
  * <replDir> <factor> [capCsv]`): measures the graded q139 point (L=4,
  * 8-bit) at a REPLICATED tier — exactly the density regime where
  * `capBuckets` starts truncating (at 8-bit width, average bucket
  * occupancy is corpus/256 per table: ~195 at 10× sf0.1, ~1 950 at
  * 100×, vs the graded cap of 1 000). Brute-force ground truth is
  * infeasible at the replicated tiers, but the signed-permutation
  * replication makes it unnecessary: within a copy every cosine is
  * preserved exactly (orthogonal map), so the per-copy IMAGES of the
  * base corpus's exact cos ≥ 0.45 pairs are true pairs by construction
  * — recall is measured on that known-true subset (factor × base-pair
  * images). Cross-copy chance pairs may exist at the largest tiers;
  * they can only ADD candidates, never remove a subset image, so the
  * subset recall is exact for the question asked: does cap truncation
  * lose the true pairs? The answer the table records is governed by
  * band redundancy — a pair is lost only when ALL 32 of its table
  * buckets are over-cap — measured, not asserted, per cap rung.
  */
object SrpMultiProbe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.01")
    // zstd shuffle/spill compression, tool-scoped: the dense-tier
    // expansion joins write O(100 GB) of highly-compressible slim-long
    // shuffle rows, and lz4's weaker ratio is the difference between
    // fitting a single node's scratch disk and ENOSPC (the 128-table
    // 200k rungs died on disk at lz4 — round 18); the bench/Verify
    // sessions keep lz4 (their shuffles are MBs, codec latency wins).
    val s = Tables.configure(org.apache.spark.sql.SparkSession.builder(),
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.io.compression.codec", "zstd")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")

    if (args.length >= 3) {
      if (args.lift(3).contains("routed"))
        routedTier(s, d, args(1), args(2).toInt)
      else if (args.lift(3).contains("multiprobe"))
        multiProbeTier(s, d, args(1), args(2).toInt,
          args.lift(4).getOrElse("16:4:1,16:4:2,16:8:2,16:16:2,8:4:1")
            .split(",").map { c =>
              val p = c.trim.split(":")
              (p(0).toInt, p(1).toInt, p(2).toInt,
                p.lift(3).map(_.toInt).getOrElse(Int.MaxValue))
            }.toSeq)
      else
        recallUnderCap(s, d, args(1), args(2).toInt,
          args.lift(3).getOrElse("1000").split(",").map(_.trim.toInt).toSeq)
      s.stop()
      return
    }

    val emb = Tables.embeddings(s, d).select("vec_id", "embedding").cache()

    // exact ground truth: all cos >= 0.45 pairs (corpus² — probe scale only)
    val ea = emb.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val eb = emb.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    val exact = ea.join(eb, col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorOps.cosine(col("e_a"), col("e_b")))
      .filter(col("cos") >= 0.45)
      .select("vec_a", "vec_b").cache()
    val nExact = exact.count()
    println(s"\ncorpus: ${emb.count()} vectors, exact cos>=0.45 pairs: $nExact")

    println("| width | L (sets) | tables | candidates | found | recall |")
    println("|---|---|---|---|---|---|")
    for ((bits, l) <- Seq((8, 1), (8, 2), (8, 4), (16, 1), (16, 2), (16, 4),
        (16, 8), (16, 16), (32, 16))) {
      val planesL = (0 until l).map(VectorQs.srpPlanesL)
      val bands = VectorOps.srpBandsMulti(emb, "vec_id", "embedding", planesL, bits)
      val capped = DedupOps.capBuckets(bands, Seq("table_idx", "bits"), 1000)
      def side(n: String): DataFrame =
        capped.select(col("vec_id").as(s"vec_$n"), col("table_idx"), col("bits"))
      val cands = side("a").join(side("b"), Seq("table_idx", "bits"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct().cache()
      val nCand = cands.count()
      val nFound = cands.join(exact, Seq("vec_a", "vec_b"), "left_semi").count()
      cands.unpersist()
      val recall = if (nExact == 0) 1.0 else nFound.toDouble / nExact
      println(f"| $bits-bit | $l | ${l * 64 / bits} | $nCand | $nFound | $recall%.3f |")
    }
    s.stop()
  }

  /** Per-copy images of the base corpus's exact cos ≥ 0.45 pairs — the
    * known-true subset every tier's recall is measured on (one corpus²
    * cosine pass at 1×, feasible; cached). */
  private def truthImages(s: org.apache.spark.sql.SparkSession,
      baseDir: String, factor: Int): DataFrame = {
    val emb1 = Tables.embeddings(s, baseDir).select("vec_id", "embedding").cache()
    val ea = emb1.select(col("vec_id").as("vec_a"), col("embedding").as("e_a"))
    val eb = emb1.select(col("vec_id").as("vec_b"), col("embedding").as("e_b"))
    val exact1 = ea.join(eb, col("vec_a") < col("vec_b"))
      .withColumn("cos", VectorOps.cosine(col("e_a"), col("e_b")))
      .filter(col("cos") >= 0.45)
      .select("vec_a", "vec_b")
    val copies = s.range(factor).select(col("id").as("k"))
    exact1.crossJoin(copies)
      .select((col("vec_a") + col("k") * lit(ScaleEvidence.CopyShift)).as("vec_a"),
        (col("vec_b") + col("k") * lit(ScaleEvidence.CopyShift)).as("vec_b"))
      .cache()
  }

  /** The DENSITY-ROUTED q139 at a replicated tier: run the graded query
    * entry itself (past the default candidate bound it fails over to the
    * cell-bounded path inside the operator) and price it — wall seconds,
    * emitted pairs, truth-subset recall. The §2.0.2 row beside round
    * 15's unrouted 595 s / recall-0.444 cliff measurement. */
  private def routedTier(s: org.apache.spark.sql.SparkSession,
      baseDir: String, replDir: String, factor: Int): Unit = {
    ScaleEvidence.generateEmbeddings(s, baseDir, replDir, factor)
    val truth = truthImages(s, baseDir, factor)
    val nTruth = truth.count()
    val nVecs = Tables.embeddings(s, replDir).count()
    println(s"\ntier: ${factor}x = $nVecs vectors; truth-pair subset: $nTruth")
    def pricePass(label: String): Unit = {
      val t0 = System.nanoTime()
      val out = graft.Queries.byName("q139_srp_multi_lsh").fn(s, replDir)
        .select("vec_a", "vec_b").cache()
      val nOut = out.count()
      val secs = (System.nanoTime() - t0) / 1e9
      val nFound = truth.join(out, Seq("vec_a", "vec_b"), "left_semi").count()
      out.unpersist()
      val recall = if (nTruth == 0) 1.0 else nFound.toDouble / nTruth
      println(f"| $label | $secs%.1f s | $nOut pairs | " +
        f"truth found $nFound | subset recall $recall%.3f |")
    }
    (1 to 2).foreach(p => pricePass(s"routed q139 pass $p"))
    // the same tier with the router disabled — the honest side-by-side
    s.conf.set(graft.queries.VectorQs.SrpMaxCandsKey, Long.MaxValue.toString)
    try pricePass("UNROUTED q139 (bound lifted)")
    finally s.conf.unset(graft.queries.VectorQs.SrpMaxCandsKey)
  }

  /** MULTIPROBE configurations priced at a replicated tier — the
    * feasible-point search between the cap's recall truncation and the
    * full exact-bucket join (SURVEY §2.0.2's row beside the routed /
    * unrouted points): for each (width, L, flipRadius), wall seconds,
    * emitted verified pairs, and truth-subset recall. Configs as
    * `bits:L:radius` CSV. The interesting region is WIDE bands (whose
    * exact-match recall on weak-cosine targets is ~zero but whose
    * bucket occupancy is 2^w sparser) with the Hamming-ball probes
    * buying recall back — flip-1 over the graded 8-bit codes is the
    * literal ~9×-coverage variant, measured for the record. */
  private def multiProbeTier(s: org.apache.spark.sql.SparkSession,
      baseDir: String, replDir: String, factor: Int,
      configs: Seq[(Int, Int, Int, Int)]): Unit = {
    ScaleEvidence.generateEmbeddings(s, baseDir, replDir, factor)
    val truth = truthImages(s, baseDir, factor)
    val nTruth = truth.count()
    val nVecs = Tables.embeddings(s, replDir).count()
    println(s"\ntier: ${factor}x = $nVecs vectors; truth-pair subset: $nTruth")
    println("| width | L | tables | radius | probes/table | wall | verified pairs | truth found | subset recall | expansion rows | shuffle written | spill | B/row |")
    println("|---|---|---|---|---|---|---|---|---|---|---|---|---|")
    configs.foreach { case (bits, l, r, maxProbes) =>
      // the qd path (maxProbes below the radius-2 ball) ALWAYS draws
      // from the weight-<=2 neighborhood regardless of the config's r —
      // label it as such so a radius-1 config with an explicit T cannot
      // print a row describing a form that did not run
      val ball2 = VectorQs.srpFlipMasks(bits, 2).size
      val qd = maxProbes < ball2
      val probes = if (qd) maxProbes else VectorQs.srpFlipMasks(bits, r).size
      val label = if (qd) "2 (qd)" else s"$r"
      // SCRATCH instrumentation (round 19 — calibrates the router's
      // disk gate's B/row constant): sum task shuffle-write and
      // disk-spill bytes OF THE MEASURED ACTION ONLY — the measured
      // jobs run under a job group, onJobStart collects their stage
      // ids, onTaskEnd filters to them (round-19 ADVICE: the unscoped
      // form counted every task in the session, so any concurrent job
      // skewed the B/row constant the disk gate is calibrated from)
      val tag = s"srp-calibrate-$bits-$l-$r-$maxProbes"
      val stages = java.util.concurrent.ConcurrentHashMap.newKeySet[Int]()
      val shuffleBytes = new java.util.concurrent.atomic.AtomicLong
      val spillBytes = new java.util.concurrent.atomic.AtomicLong
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
          if (js.properties != null &&
            tag == js.properties.getProperty("spark.jobGroup.id"))
            js.stageInfos.foreach(si => stages.add(si.stageId))
        override def onTaskEnd(
            te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
          val m = te.taskMetrics
          if (m != null && stages.contains(te.stageId)) {
            shuffleBytes.addAndGet(m.shuffleWriteMetrics.bytesWritten)
            spillBytes.addAndGet(m.diskBytesSpilled)
          }
        }
      }
      s.sparkContext.addSparkListener(listener)
      s.sparkContext.setJobGroup(tag, "SRP scratch calibration",
        interruptOnCancel = false)
      val t0 = System.nanoTime()
      val (out, nOut) =
        try {
          val o = VectorQs.srpMultiProbePairs(s, replDir, bits, l, r, maxProbes)
            .select("vec_a", "vec_b").cache()
          (o, o.count())
        } finally s.sparkContext.clearJobGroup()
      val secs = (System.nanoTime() - t0) / 1e9
      // SNAPSHOT the counters BEFORE the recall join (excluded from the
      // group anyway, belt and braces), and only after the async
      // listener bus drains — task-end events are delivered off-thread,
      // so reading immediately would undercount. Poll until the sums
      // stop moving, BOUNDED: a steady trickle of unrelated events can
      // no longer move these sums (they are stage-filtered), but the
      // drain must still terminate if the bus itself stalls
      val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
      var prev = -1L
      var cur = shuffleBytes.get + spillBytes.get
      while (cur != prev && System.nanoTime() < deadline) {
        Thread.sleep(300); prev = cur
        cur = shuffleBytes.get + spillBytes.get
      }
      val (sw, sp) = (shuffleBytes.get, spillBytes.get)
      val nFound = truth.join(out, Seq("vec_a", "vec_b"), "left_semi").count()
      out.unpersist()
      s.sparkContext.removeSparkListener(listener)
      val recall = if (nTruth == 0) 1.0 else nFound.toDouble / nTruth
      val expRows = nVecs * (l * 64 / bits) * probes
      val scratch = sw + sp
      println(f"| $bits-bit | $l | ${l * 64 / bits} | $label | $probes " +
        f"| $secs%.1f s | $nOut | $nFound | $recall%.3f " +
        f"| $expRows%,d | ${sw >> 20} MiB | ${sp >> 20} MiB " +
        f"| ${scratch.toDouble / expRows}%.1f |")
    }
  }

  /** The graded q139 point measured at a replicated tier, per cap rung:
    * subset recall (images of the base exact pairs found by the capped
    * candidate union) + total candidate count (the cost axis). */
  private def recallUnderCap(s: org.apache.spark.sql.SparkSession,
      baseDir: String, replDir: String, factor: Int, caps: Seq[Int]): Unit = {
    ScaleEvidence.generateEmbeddings(s, baseDir, replDir, factor)
    val truth = truthImages(s, baseDir, factor)
    val nTruth = truth.count()
    val nVecs = Tables.embeddings(s, replDir).count()
    println(s"\ntier: ${factor}x = $nVecs vectors; true-pair subset " +
      s"(per-copy images of the base exact cos>=0.45 pairs): $nTruth")

    // the graded band relation (L=4 matrices x 8 tables, 8-bit width),
    // built once per tier and re-capped per rung
    val planesL = (0 until 4).map(VectorQs.srpPlanesL)
    val bands = VectorOps.srpBandsMulti(
        Tables.embeddings(s, replDir).select("vec_id", "embedding"),
        "vec_id", "embedding", planesL, 8)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val occ = bands.groupBy("table_idx", "bits").count()
      .agg(avg("count"), expr("percentile(count, 0.99)"), max("count")).head()
    println(f"bucket occupancy: avg ${occ.getDouble(0)}%.0f, " +
      f"p99 ${occ.getDouble(1)}%.0f, max ${occ.getLong(2)}")

    println("| cap | candidates | truth images found | subset recall |")
    println("|---|---|---|---|")
    caps.foreach { cap =>
      val capped = DedupOps.capBuckets(bands, Seq("table_idx", "bits"), cap)
      def side(n: String): DataFrame =
        capped.select(col("vec_id").as(s"vec_$n"), col("table_idx"), col("bits"))
      val cands = side("a").join(side("b"), Seq("table_idx", "bits"))
        .filter(col("vec_a") < col("vec_b"))
        .select("vec_a", "vec_b").distinct().cache()
      val nCand = cands.count()
      val nFound = truth.join(cands, Seq("vec_a", "vec_b"), "left_semi").count()
      cands.unpersist()
      val recall = if (nTruth == 0) 1.0 else nFound.toDouble / nTruth
      println(f"| $cap | $nCand | $nFound | $recall%.3f |")
    }
    bands.unpersist()
  }
}
