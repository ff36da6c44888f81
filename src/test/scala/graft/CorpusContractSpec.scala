package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** The corpus contract, pinned at the READER boundary. Round 10 was lost
  * to a silent corpus regeneration (`events.ts` TIMESTAMP(NANOS) →
  * TIMESTAMP_MICROS) that surfaced as fourteen scattered
  * DATATYPE_MISMATCH failures far from the cause. This spec makes the
  * next drift fail in ONE place with the table and column named: every
  * column the queries consume is asserted on the `Tables` accessor
  * output (post-normalization — for events that means the derived
  * `event_ts`/`ts_us`, which hold under BOTH shipped ts encodings).
  * Extra corpus columns are tolerated; a consumed column changing type
  * or vanishing is not. On failure: absorb the change inside the
  * matching `Tables` accessor (Core.scala), never in the queries.
  */
class CorpusContractSpec extends AnyFunSuite {
  private lazy val spark = SparkSessions.spark
  private val sf = "/root/testdata/sf0.001"

  private def check(table: String, df: org.apache.spark.sql.DataFrame,
      expected: (String, DataType)*): Unit = {
    val got = df.schema.map(f => f.name -> f.dataType).toMap
    val problems = expected.flatMap { case (name, dt) =>
      got.get(name) match {
        case None => Some(s"$name: MISSING (expected $dt)")
        case Some(`dt`) => None
        case Some(other) => Some(s"$name: $other (expected $dt)")
      }
    }
    assert(problems.isEmpty,
      s"\ncorpus contract broken for '$table' — absorb the change in " +
        s"Tables.$table (Core.scala), not in the queries:\n  " +
        problems.mkString("\n  "))
  }

  test("every consumed column of every table arrives with its contracted type") {
    check("region", Tables.region(spark, sf),
      "r_regionkey" -> IntegerType, "r_name" -> StringType)
    check("nation", Tables.nation(spark, sf),
      "n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType)
    check("customer", Tables.customer(spark, sf),
      "c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType)
    check("supplier", Tables.supplier(spark, sf),
      "s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType)
    check("part", Tables.part(spark, sf),
      "p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType)
    check("orders", Tables.orders(spark, sf),
      "o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      // the corpus writes its timestamps isAdjustedToUTC=false, so Spark
      // reads NTZ — identical wall-clock semantics under the pinned-UTC
      // session; worth failing loudly on if the encoding flips
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType)
    check("lineitem", Tables.lineitem(spark, sf),
      "l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType)
    // events: the queries consume only the NORMALIZED derivations, so the
    // contract is on those — raw `ts` may ship as any encoding the
    // Tables.events branch absorbs
    check("events", Tables.events(spark, sf),
      "event_id" -> LongType, "user_id" -> LongType,
      "event_type" -> StringType, "value" -> DoubleType,
      "props" -> StringType,
      "event_ts" -> TimestampType, "ts_us" -> LongType)
    check("documents", Tables.documents(spark, sf),
      "doc_id" -> LongType, "text" -> StringType, "lang" -> StringType,
      "source" -> StringType, "n_chars" -> LongType)
    check("embeddings", Tables.embeddings(spark, sf),
      "vec_id" -> LongType, "embedding" -> ArrayType(FloatType),
      "label" -> IntegerType)
  }

  test("events normalization lands on identical microsecond values under either encoding") {
    // the µs-domain invariant behind the dual-encoding branch: ts_us and
    // event_ts must agree with each other and with the DuckDB oracle's
    // CAST(ts AS TIMESTAMP) convention (spot-checked via unix_micros)
    import org.apache.spark.sql.functions._
    val ev = Tables.events(spark, sf)
    val bad = ev.filter(unix_micros(col("event_ts")) =!= col("ts_us")).count()
    assert(bad == 0, s"$bad rows where event_ts and ts_us disagree")
  }

  test("documents text is ASCII with single-space separators — q130's oracle precondition") {
    // The q130/q132 DuckDB mirrors walk bytes via per-char `unicode()`,
    // which equals the UTF-8 byte ONLY for ASCII; and the token
    // contract everywhere is split-on-single-space (no empty tokens).
    // A corpus regeneration breaking either must fail HERE, not as a
    // hash mismatch deep in a banding oracle.
    import org.apache.spark.sql.functions._
    // sf0.1 included because q130/q132's byte-walk oracles are exercised
    // there too (the width-ladder and tier measurements) — a regenerated
    // sf0.1 corpus breaking the contract must fail HERE, not as a deep
    // banding-oracle hash mismatch. One rlike scan over ~60k docs, ~1 s.
    Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1").foreach { d =>
      val docs = Tables.documents(spark, d)
      val nonAscii = docs.filter(col("text").rlike("[^\\x20-\\x7e]")).count()
      assert(nonAscii == 0, s"$d: $nonAscii docs with non-ASCII or control chars")
      val emptyTok = docs.filter(
        col("text").startsWith(" ") || col("text").endsWith(" ") ||
          col("text").contains("  ") || col("text") === "").count()
      assert(emptyTok == 0, s"$d: $emptyTok docs that would tokenize empty tokens")
    }
  }
}
