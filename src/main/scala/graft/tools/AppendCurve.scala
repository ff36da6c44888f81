package graft.tools

import graft.Tables
import graft.pipeline.IncrAttrTable
import graft.streaming.IndexLayout

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Measurement tool for the incremental shard loop's maintenance knobs
  * (SURVEY §2.0.2 evidence; not part of the library surface):
  *
  *   - `nb` mode: the bucket-count-vs-append-cost curve — re-bucket the
  *     resident index to each rung, then time steady-state 100-doc
  *     appends. Prices what [[IncrAttrTable.compactIndex]]'s auto-scale
  *     buys (and where more buckets stop paying: at some point the
  *     probe's per-dir listing overhead overtakes the row pruning).
  *   - `compactloop` mode: a long shard-ingest loop (K appends) with the
  *     pressure trigger on vs off — the append-cost-vs-tail-length
  *     curve, the tail analog of DocStream's fire→reset curve. The final
  *     summary prints the artifact's post-soak metadata footprint (tail
  *     dirs, manifest files, generation) — the soak evidence that
  *     maintenance keeps every driver-side listing bounded.
  *   - `fused` mode: per-batch wall of the FUSED admission+tagging
  *     transaction ([[IncrAttrTable.ingestBatch]]) vs the COMPOSED
  *     pipeline it replaces (DocStream admission, then tagging the
  *     admitted docs via [[IncrAttrTable.appendBatch]]) — both against
  *     survivor-resident state built from the same corpus, so the delta
  *     is the loop structure (one shared band probe + one index write
  *     vs two of each), not the resident size. Measured on two shard
  *     shapes: `dup` (the [append-100] convention — most docs are
  *     resident near-dups, so the composed tagging leg gets an
  *     almost-empty batch and the saving is small) and `fresh`
  *     (token-salted — every doc admits, both legs pay full freight:
  *     the production new-crawl shape the ~2× claim is about).
  *
  * Usage:
  *   runMain graft.tools.AppendCurve <corpusDir> nb [64,256,1024,...]
  *   runMain graft.tools.AppendCurve <corpusDir> compactloop <K> <maxTail|0=off>
  *   runMain graft.tools.AppendCurve <corpusDir> fused <K>
  *
  * `corpusDir` is any documents corpus — the sf0.1 testdata or a
  * ScaleEvidence-replicated tier. Batches follow the [append-100]
  * convention (copy-0's first 100 docs under ever-fresh ids), so every
  * rung sees the same dup-heavy shard shape the recorded tiers price.
  */
object AppendCurve {
  def main(args: Array[String]): Unit = {
    val d = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val mode = args.lift(1).getOrElse("nb")
    val s = Tables.configure(SparkSession.builder(), "32").getOrCreate()
    s.sparkContext.setLogLevel("ERROR")

    val root = IncrAttrTable.ensureBuilt(s, d)
    val idx = s"$root/index"
    var seq = 0
    def append(): Double = {
      seq += 1
      val batch = Tables.documents(s, d)
        .filter(col("doc_id") < 100)
        .withColumn("doc_id", col("doc_id") + lit(40000000000L + seq * 1000000L))
      val t0 = System.nanoTime()
      IncrAttrTable.appendBatch(s, root, batch)
      (System.nanoTime() - t0) / 1e9
    }
    // settle: absorb the build's async-cleanup debt before timing
    (1 to 3).foreach { _ => append(); System.gc() }

    mode match {
      case "nb" =>
        val rungs = args.lift(2).getOrElse("64,256,1024,4096,16384")
          .split(",").map(_.trim.toInt).toSeq
        println(s"corpus $d: ${Tables.documents(s, d).count()} docs")
        println("| nb | append medians (s) | per-append files read (bands) |")
        rungs.foreach { nb =>
          IncrAttrTable.compactIndex(s, root, newBuckets = nb)
          append() // one settle append after the fold (fresh listings)
          val times = (1 to 3).map(_ => append()).sorted
          println(f"| $nb | ${times(0)}%.2f / ${times(1)}%.2f / ${times(2)}%.2f | " +
            s"gen=${IndexLayout.gen(s, idx)} nb=${IndexLayout.numBuckets(s, idx)} |")
        }
      case "compactloop" =>
        val k = args.lift(2).map(_.toInt).getOrElse(60)
        val maxTail = args.lift(3).map(_.toInt).getOrElse(0)
        println(s"corpus $d, $k appends, " +
          (if (maxTail > 0) s"pressure trigger at tail > $maxTail" else "compaction OFF"))
        println("| appends | last-5 append mean (s) | compactions |")
        var compactions = 0
        val window = scala.collection.mutable.Queue.empty[Double]
        (1 to k).foreach { i =>
          val t = append()
          window.enqueue(t); if (window.size > 5) window.dequeue()
          if (maxTail > 0) {
            val c0 = System.nanoTime()
            if (IncrAttrTable.maybeCompactIndex(s, root, maxTail)) {
              compactions += 1
              println(f"|   (compaction after $i: ${(System.nanoTime() - c0) / 1e9}%.2f s) |")
            }
          }
          if (i % 5 == 0)
            println(f"| $i | ${window.sum / window.size}%.2f | $compactions |")
        }
        // post-soak footprint: every driver-side listing the loop pays
        // per append must be bounded by maintenance, not by lifetime
        val hc = s.sparkContext.hadoopConfiguration
        def dirs(p: String): Int = graft.ops.Fs.list(p, hc).size
        val tailDirs = Seq("bands", "shingles").map { rel =>
          s"$rel=${dirs(s"${IndexLayout.dataDir(s, idx, rel)}/bucket=${IndexLayout.TailBucket}")}"
        }.mkString(" ")
        println(s"post-soak: gen=${IndexLayout.gen(s, idx)} " +
          s"nb=${IndexLayout.numBuckets(s, idx)} tailDirs[$tailDirs] " +
          s"manifests=${dirs(s"$root/_batchmeta")} " +
          s"attrsDirs=${dirs(IncrAttrTable.liveRelDir(s, root, "attrs"))} " +
          s"indexGens=${dirs(s"$idx/bands")}")

      case "fused" =>
        val k = args.lift(2).map(_.toInt).getOrElse(5)
        import graft.pipeline.IncrAttrTable
        import graft.streaming.DocStream
        val hc = s.sparkContext.hadoopConfiguration
        // fused state: the survivor-resident artifact of this corpus
        val fusedRoot = IncrAttrTable.ensureIngested(s, d)
        val nb = IndexLayout.numBuckets(s, s"$fusedRoot/index")
        // composed state: what running the two loops over the same corpus
        // would have left — a DocStream admission index and a tagging
        // artifact, BOTH survivor-resident, at the same bucket count
        val survivors = Tables.documents(s, d).join(
          IncrAttrTable.admissionsOf(s, fusedRoot)
            .filter(col("status") === "new").select("doc_id"), "doc_id")
        val base = "/tmp/graft-fusedcurve"
        graft.ops.Fs.delete(base, hc)
        val docIdx = s"$base/docindex"
        val outDir = s"$base/admissions-out"
        DocStream.seedIndex(survivors.select("doc_id", "text"), docIdx)
        DocStream.compactIndex(s, docIdx, newBuckets = nb)
        val composedRoot = s"$base/artifact"
        val span = survivors.agg(min(col("doc_id")), max(col("doc_id"))).head()
        val mid = (span.getAs[Number](0).longValue + span.getAs[Number](1).longValue) / 2
        IncrAttrTable.appendBatch(s, composedRoot,
          survivors.filter(col("doc_id") <= mid), broadcastProbe = false)
        IncrAttrTable.appendBatch(s, composedRoot,
          survivors.filter(col("doc_id") > mid), broadcastProbe = false)
        IncrAttrTable.compactIndex(s, composedRoot)

        def shard(fresh: Boolean): org.apache.spark.sql.DataFrame = {
          seq += 1
          val b = Tables.documents(s, d)
            .filter(col("doc_id") < 100)
            .withColumn("doc_id", col("doc_id") + lit(50000000000L + seq * 1000000L))
          // fresh = token-salted per shard: no resident (or cross-shard)
          // near-dup partners, every doc admits
          if (fresh)
            b.withColumn("text",
              regexp_replace(col("text"), "([A-Za-z0-9]+)", "$1zf" + seq))
          else b
        }
        def timed(body: => Unit): Double = {
          val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
        }
        def fusedAppend(fresh: Boolean): Double = {
          val b = shard(fresh)
          timed(IncrAttrTable.ingestBatch(s, fusedRoot, b))
        }
        def composedAppend(fresh: Boolean): Double = {
          val b = shard(fresh)
          val id = seq.toLong
          timed {
            DocStream.admitBatch(b.select("doc_id", "text"), docIdx, outDir, id)
            val adm = s.read.parquet(s"$outDir/admissions")
              .filter(col("batch_id") === id && col("status") === "new")
              .select("doc_id")
            IncrAttrTable.appendBatch(s, composedRoot, b.join(adm, "doc_id"))
          }
        }
        // settle both paths (async-cleanup debt from the builds)
        fusedAppend(fresh = false); composedAppend(fresh = false); System.gc()
        println(s"corpus $d: nb=$nb, $k timed shards per (shape, path)")
        println("| shape | fused per-batch (s) | composed per-batch (s) |")
        Seq(false, true).foreach { fresh =>
          val f = (1 to k).map(_ => fusedAppend(fresh)).sorted
          val c = (1 to k).map(_ => composedAppend(fresh)).sorted
          val shape = if (fresh) "fresh (all admit)" else "dup-heavy"
          println(f"| $shape | ${f(k / 2)}%.2f (${f.head}%.2f-${f.last}%.2f) " +
            f"| ${c(k / 2)}%.2f (${c.head}%.2f-${c.last}%.2f) |")
        }
    }
    s.stop()
  }
}
