package graft

import graft.ops.VectorOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Spherical k-means: recovery on separable data, quantized-mean accuracy,
  * and the load-bearing distributed claim — bit-identical results under
  * any partitioning (the property plain double sums cannot give).
  */
class KMeansSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark

  /** 3 tight clusters around orthogonal axes in 8-dim space. */
  private def clustered(n: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(59)
    val rows = (0 until n).map { i =>
      val axis = i % 3
      val vec = Array.tabulate(8)(j =>
        (if (j == axis) 1.0f else 0.0f) + (rnd.nextFloat() - 0.5f) * 0.1f)
      (i.toLong, vec)
    }
    rows.toDF("id", "vec")
  }

  test("separable clusters are recovered exactly after 2 rounds") {
    val corpus = clustered(300)
    // one seed per true cluster (ids 0,1,2 lie on axes 0,1,2)
    val seeds = corpus.filter(col("id") < 3)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    val out = VectorOps.kmeans(corpus, seeds, iters = 2)
      .select("id", "cell").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(out.length == 300)
    out.foreach { case (id, cell) =>
      assert(cell == id % 3, s"vector $id (true cluster ${id % 3}) landed in $cell")
    }
  }

  test("quantized mean is within 2^-40 per component of the true mean") {
    val corpus = clustered(90).withColumn("cell", col("id") % 3)
    val cents = VectorOps.kmeansUpdate(corpus).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rows = corpus.select("id", "vec").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))
    (0L to 2L).foreach { c =>
      val members = rows.filter(_._1 % 3 == c).map(_._2)
      val want = Array.tabulate(8)(j => members.map(_(j).toDouble).sum / members.size)
      val got = cents(c)
      want.zip(got).foreach { case (w, g) =>
        // quantization floor loses < 1 grid cell per value before the mean
        assert(math.abs(w - g) < math.pow(2, -40) + 1e-6,
          s"cell $c mean off: $w vs $g")
      }
    }
  }

  test("assignments and centroids are bit-identical under any partitioning") {
    val base = clustered(200)
    val seeds = base.filter(col("id") < 3)
      .select(col("id").as("cid"), col("vec").as("cvec"))
    def run(df: DataFrame): (Seq[(Long, Long)], Seq[(Long, Seq[Float])]) = {
      val assigned = VectorOps.kmeans(df, seeds, iters = 2)
      val cents = VectorOps.kmeansUpdate(assigned).collect()
        .map(r => (r.getLong(0), r.getSeq[Float](1))).sortBy(_._1).toSeq
      val cells = assigned.select("id", "cell").collect()
        .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1).toSeq
      (cells, cents)
    }
    val (c1, m1) = run(base.repartition(1))
    val (c7, m7) = run(base.repartition(7, col("id")))
    val (c13, m13) = run(base.repartition(13))
    assert(c1 == c7 && c7 == c13, "assignments depend on partitioning")
    // float equality is EXACT here — quantized integer sums are
    // associative, so no shuffle order can move a bit
    assert(m1 == m7 && m7 == m13, "centroid bits depend on partitioning")
  }

  test("a cell that loses all members disappears (k shrinks, no NaN poison)") {
    import spark.implicits._
    // two real clusters, three seeds — seed 2 is strictly dominated and
    // must end with no members after the first update round
    val corpus = clustered(100).filter(col("id") % 3 < 2)
    val seeds = corpus.filter(col("id") < 2)
      .select(col("id").as("cid"), col("vec").as("cvec"))
      .unionByName(Seq((99L, Array.fill(8)(-1.0f)))
        .toDF("cid", "cvec"))
    val assigned = VectorOps.kmeans(corpus, seeds, iters = 2)
    val cells = assigned.select("cell").distinct()
      .collect().map(_.getLong(0)).toSet
    assert(cells == Set(0L, 1L))
    val cents = VectorOps.kmeansUpdate(assigned)
    assert(cents.count() == 2)
  }
}
