package graft

import graft.queries._

/** Central registry: every implemented operator from SURVEY.md §2 is one
  * [[Q]] here — a Spark plan builder plus (where SQL-expressible) the
  * DuckDB oracle the driver hash-compares against at sf0.01.
  */
object Queries {
  lazy val all: Seq[Q] =
    Relational.defs ++
      FunctionQs.defs ++
      MovieQs.defs ++
      TextQs.defs ++
      DedupQs.defs ++
      VectorQs.defs ++
      EventQs.defs ++
      GraphQs.defs ++
      MultimodalQs.defs ++
      UdfQs.defs ++
      StatQs.defs

  lazy val headline: Seq[Q] = all.filter(_.headline)

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap

  lazy val fns: Map[String, (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  lazy val oracles: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
