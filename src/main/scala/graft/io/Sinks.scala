package graft.io

import org.apache.spark.sql.DataFrame

/** Sink writers — reference `scripts/...pyspark.py:116-123`.
  *
  * The contract is a FORMAT FLIP (`:118`): csv input → snappy-parquet
  * output; parquet input → header-csv output. `mode("overwrite")` subsumes
  * the reference's manual S3 pre-delete (`:47-53`).
  *
  * Scale note: no `coalesce(1)` here — output parallelism follows the final
  * stage's partitioning, which is what you want on a cluster. Callers that
  * need a single file (tests) coalesce explicitly on their side.
  */
object Sinks {

  def parquet(df: DataFrame, path: String): Unit =
    df.write
      .option("compression", "snappy")
      .mode("overwrite")
      .parquet(path)

  def csv(df: DataFrame, path: String): Unit =
    df.write
      .option("header", "true")
      .mode("overwrite")
      .csv(path)

  /** Write with the format FLIPPED relative to the input format
    * (reference `:118`): csv in → parquet out, parquet in → csv out.
    * Returns the output format written.
    */
  def writeFlipped(df: DataFrame, inputFormat: String, path: String): String =
    inputFormat.toLowerCase match {
      case "csv"     => parquet(df, path); "parquet"
      case "parquet" => csv(df, path); "csv"
      case other     => throw UnsupportedFormatException(other)
    }

  /** Hive-style partitioned parquet layout (`path/col=value/...`) —
    * the 100 TB lake layout: a filter on the partition column prunes
    * whole directories at planning time (zero I/O for pruned values;
    * asserted in SinksSpec). Partition columns should be low-cardinality
    * (a date, a language, a source) or the file count explodes.
    */
  def parquetPartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write
      .option("compression", "snappy")
      .mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
