package graft.io

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

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

  def json(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  def orc(df: DataFrame, path: String): Unit =
    df.write.option("compression", "snappy").mode("overwrite").orc(path)

  /** Write with the format FLIPPED relative to the input format
    * (reference `:118`): csv in → parquet out, parquet in → csv out.
    * Extension formats follow the same row↔columnar logic: json (row)
    * flips to parquet, orc (columnar) flips to csv. Returns the output
    * format written.
    */
  def writeFlipped(df: DataFrame, inputFormat: String, path: String): String =
    inputFormat.toLowerCase match {
      case "csv"     => parquet(df, path); "parquet"
      case "json"    => parquet(df, path); "parquet"
      case "orc"     => csv(df, path); "csv"
      case "parquet" => csv(df, path); "csv"
      case other     => throw UnsupportedFormatException(other)
    }

  /** Small-file compaction — the operational failure mode of a 100 TB
    * lake that streaming/append writers create (thousands of KB-sized
    * files turn every scan into a file-listing storm and every task
    * into per-file open overhead). Rewrites `path` in place to
    * ceil(bytes / targetBytes) files of roughly `targetBytes` each:
    * read → repartition → write to a sibling temp dir → atomic-ish
    * swap via FileSystem.rename (same-FS rename, the standard batch
    * compaction recipe; concurrent readers of the old listing must
    * retry, as with any in-place table rewrite without a transaction
    * log). Returns the output file-partition count.
    */
  def compact(
      spark: SparkSession,
      path: String,
      format: String = "parquet",
      targetBytes: Long = 128L * 1024 * 1024): Int = {
    val fs = new Path(path).getFileSystem(spark.sessionState.newHadoopConf())
    val src = new Path(path)
    val bytes = fs.getContentSummary(src).getLength
    val parts = math.max(1, math.ceil(bytes.toDouble / targetBytes).toInt)
    val df = Sources.read(spark, format, path).repartition(parts)
    val tmp = new Path(path + "__compact_tmp")
    fs.delete(tmp, true)
    format.toLowerCase match {
      case "csv"     => csv(df, tmp.toString)
      case "json"    => json(df, tmp.toString)
      case "orc"     => orc(df, tmp.toString)
      case "parquet" => parquet(df, tmp.toString)
      case other     => throw UnsupportedFormatException(other)
    }
    fs.delete(src, true)
    require(fs.rename(tmp, src), s"compaction rename failed: $tmp -> $src")
    parts
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
