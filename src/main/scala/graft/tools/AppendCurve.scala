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
  *     curve, the tail analog of DocStream's fire→reset curve.
  *
  * Usage:
  *   runMain graft.tools.AppendCurve <corpusDir> nb [64,256,1024,...]
  *   runMain graft.tools.AppendCurve <corpusDir> compactloop <K> <maxTail|0=off>
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
    }
    s.stop()
  }
}
