package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Output-layout discipline for the master sinks.
  *
  * At 100 TB the sink's FILE LAYOUT is a query-performance feature: a
  * downstream scan prunes parquet row groups by min/max statistics only
  * if the writer clustered the data. Unsorted writes give every file the
  * full key range (no file prunable); a range-partitioned, within-file
  * sorted write gives disjoint per-file ranges, so a key-range scan
  * touches O(selectivity) files. `maxRecordsPerFile` bounds file size
  * independently of the partition count — task output never balloons
  * into a single unsplittable giant file.
  */
object SinkOps {

  /** Write `df` as parquet clustered by `sortCol`: range-repartitioned
    * (`parts` ways, one exchange — the sampled range partitioner keeps
    * output files balanced even on skewed keys), sorted within each
    * partition (no global sort barrier), each file capped at
    * `maxRecordsPerFile` rows. Result: per-file key ranges are disjoint
    * and ordered, the shape min/max row-group pruning wants.
    */
  def rangedSortedParquet(df: DataFrame, sortCol: String, out: String,
      parts: Int, maxRecordsPerFile: Long): Unit = {
    require(parts >= 1 && maxRecordsPerFile >= 1)
    df.repartitionByRange(parts, col(sortCol))
      .sortWithinPartitions(sortCol)
      .write
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .mode("overwrite")
      .parquet(out)
  }
}
