package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native `vec_dot` expression: bit-equality with the higher-order
  * fold it replaces, SQL-front-end resolution, null propagation.
  */
class VecDotSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  private val sf = "/root/testdata/sf0.001"

  test("vec_dot is bit-identical to the aggregate/zip_with fold") {
    val e = Tables.embeddings(spark, sf).limit(50)
    val a = e.select(col("vec_id").as("ia"), col("embedding").as("ea"))
    val b = e.select(col("vec_id").as("ib"), col("embedding").as("eb"))
    val pairs = a.join(b, col("ia") < col("ib"))
    val fold = aggregate(
      zip_with(col("ea"), col("eb"), (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)
    val diff = pairs
      .select(call_function("vec_dot", col("ea"), col("eb")).as("native"), fold.as("hof"))
      .filter(col("native") =!= col("hof"))
      .count()
    assert(diff == 0)
  }

  test("resolves in the SQL front end via GraftExtensions") {
    Tables.embeddings(spark, sf).createOrReplaceTempView("vd_emb")
    val r = spark.sql(
      "SELECT vec_dot(embedding, embedding) AS sq FROM vd_emb WHERE vec_id = 0").head()
    assert(r.getDouble(0) > 0.0)
  }

  test("null array propagates to null") {
    import spark.implicits._
    val df = Seq((Some(Seq(1.0f, 2.0f)), Option.empty[Seq[Float]]))
      .toDF("a", "b")
    val r = df.select(call_function("vec_dot", col("a"), col("b"))).head()
    assert(r.isNullAt(0))
  }
}
