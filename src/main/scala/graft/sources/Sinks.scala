package graft.sources

import org.apache.spark.sql.DataFrame

/** Sink helpers (SURVEY §2 T1 sink row).
  *
  * The harness's graded sink is `coalesce(1).write.parquet` (Verify.scala);
  * these are the *production* shapes for 100 TB output:
  *  - `writePartitioned`: hive-style directory partitioning so downstream
  *    readers get partition pruning for free (the standard layout for a
  *    time/type-partitioned log store);
  *  - `writeSorted`: additionally sorts within partitions so parquet
  *    row-group min/max stats become selective (scan skipping on the sort
  *    key without any index structure).
  */
object Sinks {

  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String],
                       mode: String = "overwrite"): Unit =
    df.write.mode(mode).partitionBy(partitionCols: _*).parquet(path)

  def writeSorted(df: DataFrame, path: String, partitionCols: Seq[String],
                  sortCols: Seq[String], mode: String = "overwrite"): Unit =
    df.repartition(partitionCols.map(df.col): _*)
      .sortWithinPartitions(sortCols.map(df.col): _*)
      .write.mode(mode).partitionBy(partitionCols: _*).parquet(path)
}
