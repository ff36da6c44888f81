package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** q38 df-cap sensitivity (SURVEY §2.0.2): sweep the inverted-index df
  * cap over a CONSTRUCTED high-df corpus and document which pairs the
  * cap loses at which setting, against the join cost it buys back.
  *
  * The corpus plants two kinds of true (J >= 0.5) pairs:
  *
  *  - STRONG pairs — near-identical docs whose overlap lives in rare
  *    (df <= 2) shingles. The signal-bearing kind every dedup run is
  *    after; a cap may only lose these if set below the natural df of
  *    genuinely shared text.
  *  - MARGIN pairs — docs built as `shared(30) ++ unique(14) ++
  *    boilerplate(14)`: counting the boilerplate's shingles J = 40/72 =
  *    0.556, without them the counted J is 28/84 = 0.333. Their
  *    similarity EXISTS only through a template stamped on hundreds of
  *    other docs — exactly the pair class the df-cap argues carries no
  *    dedup signal.
  *
  * Three boilerplate templates at df ≈ 100 / 400 / 1200 give the curve
  * its steps: a margin pair reappears exactly when the cap admits its
  * template's df, and the candidate-join cost (sum over kept shingles
  * of C(df,2) — the df² blow-up q38's scaladoc bounds) jumps with it.
  */
object DfCapSensitivity {

  private val Vocab = 20000

  private def words(rnd: scala.util.Random, n: Int): Seq[String] =
    Seq.fill(n)(s"w${rnd.nextInt(Vocab)}")

  private def template(t: Int): Seq[String] = (0 until 14).map(i => s"bp${t}w$i")

  /** (strong pairs, margin pairs per template, template dfs). Writes the
    * corpus as `outDir/documents.parquet`. */
  def buildCorpus(spark: SparkSession, outDir: String)
      : (Seq[(Long, Long)], Map[Int, Seq[(Long, Long)]], Map[Int, Int]) = {
    import spark.implicits._
    val rnd = new scala.util.Random(2038)
    val docs = scala.collection.mutable.ArrayBuffer[(Long, String)]()

    // base corpus: 2000 random docs; templates stamped on disjoint slices
    // (margin docs below complete each template's df target)
    val carriers = Map(1 -> 80, 2 -> 380, 3 -> 1150)
    var next = 0L
    val baseTokens = scala.collection.mutable.Map[Long, Seq[String]]()
    (1 to 3).foreach { t =>
      (0 until carriers(t)).foreach { _ =>
        next += 1
        val toks = words(rnd, 60)
        baseTokens(next) = toks
        docs += next -> (toks ++ template(t)).mkString(" ")
      }
    }
    (0 until 360).foreach { _ =>
      next += 1
      docs += next -> words(rnd, 60).mkString(" ")
    }

    // strong pairs: partner = base doc with 2 tokens changed. 15 clean,
    // 15 on template-3 carriers (so the cap drops part of THEIR overlap
    // too — they must still clear J >= 0.5 on rare shingles alone)
    val strongClean = (0 until 15).map { i =>
      val a = next + 1; next += 1
      val toksA = words(rnd, 60)
      docs += a -> toksA.mkString(" ")
      val b = 10000L + i
      val toksB = toksA.updated(10, "mutA").updated(30, "mutB")
      docs += b -> toksB.mkString(" ")
      (a, b)
    }
    val strongCarrier = (0 until 15).map { i =>
      val aId = 80L + 380L + 1L + i // template-3 carriers start after the t1/t2 slices
      val b = 10100L + i
      val toksB = baseTokens(aId).updated(10, "mutA").updated(30, "mutB")
      docs += b -> (toksB ++ template(3)).mkString(" ")
      (aId, b)
    }
    val strong = strongClean ++ strongCarrier

    // margin pairs: 10 per template — shared(30) ++ unique(14) ++ template
    val margin = (1 to 3).map { t =>
      t -> (0 until 10).map { i =>
        val shared = words(rnd, 30)
        val a = 20000L + t * 100L + i * 2L
        val b = a + 1
        docs += a -> (shared ++ words(rnd, 14) ++ template(t)).mkString(" ")
        docs += b -> (shared ++ words(rnd, 14) ++ template(t)).mkString(" ")
        (a, b)
      }
    }.toMap

    val dfs = Map(1 -> (carriers(1) + 20), 2 -> (carriers(2) + 20),
      3 -> (carriers(3) + 20 + 15))
    docs.toSeq.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("dfcap-synthetic"))
      .withColumn("n_chars", length(col("text")))
      .write.mode("overwrite").parquet(s"$outDir/documents.parquet")
    (strong, margin, dfs)
  }

  /** Candidate-join rows the cap admits: sum over kept shingles of
    * C(df, 2) — the actual row count of q38's shingle self-join. */
  private def joinRows(spark: SparkSession, dir: String, cap: Long): Long = {
    val sh = graft.ops.TextOps.shingleHashes(col("text"))
    Tables.documents(spark, dir)
      .select(explode(sh).as("s"))
      .groupBy("s").agg(count(lit(1)).as("df"))
      .filter(col("df") <= cap)
      .agg(sum(col("df") * (col("df") - 1)))
      .collect()(0).getLong(0) / 2
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.lift(0).getOrElse("/tmp/graft-dfcap")
    val spark = Tables.configure(
      SparkSession.builder().appName("dfcap-sensitivity"), "32").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val (strong, margin, dfs) = buildCorpus(spark, outDir)
    println(s"template dfs: $dfs; planted: ${strong.size} strong, " +
      s"${margin.values.map(_.size).sum} margin")

    val caps = Seq(50L, 100L, 150L, 500L, 1500L, Long.MaxValue)
    println("| cap | pairs found | strong found | margin df100 | margin df400 | margin df1185 | candidate join rows |")
    println("|---|---|---|---|---|---|---|")
    caps.foreach { cap =>
      val t0 = System.nanoTime()
      val pairs = graft.queries.DedupQs.ngramJaccardPairs(spark, outDir, cap)
        .select("doc_a", "doc_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      val secs = (System.nanoTime() - t0) / 1e9
      def found(ps: Seq[(Long, Long)]): Int =
        ps.count(p => pairs.contains(p) || pairs.contains(p.swap))
      val capLabel = if (cap == Long.MaxValue) "uncapped" else cap.toString
      Console.err.println(f"[dfcap] cap=$capLabel $secs%.1fs")
      println(f"| $capLabel | ${pairs.size} | ${found(strong)}/${strong.size} " +
        f"| ${found(margin(1))}/10 | ${found(margin(2))}/10 | ${found(margin(3))}/10 " +
        f"| ${joinRows(spark, outDir, cap)}%,d |")
    }
    spark.stop()
  }
}
