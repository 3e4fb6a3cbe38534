package graft.io

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SinksSpec extends SparkSpec {

  test("partitioned parquet write prunes partitions at planning time") {
    val dir = Files.createTempDirectory("part_sink").toString
    val docs = spark.read.parquet(s"$sf/documents.parquet")
      .withColumn("lang_part", coalesce(col("lang"), lit("und")))
    Sinks.parquetPartitioned(docs, dir, Seq("lang_part"))

    // hive layout on disk
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.forall(_.startsWith("lang_part=")))
    assert(dirs.length > 1)

    // a filter on the partition column must reach PartitionFilters and
    // scan only the matching directory
    val q = spark.read.parquet(dir).filter(col("lang_part") === "en")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PartitionFilters") && scan.contains("lang_part"),
      s"partition filter missing from scan:\n$scan")
    val expect = docs.filter(col("lang_part") === "en").count()
    assert(q.count() == expect && expect > 0)
  }

  test("format flip: csv in -> parquet out, parquet in -> csv out") {
    import spark.implicits._
    val df = Seq(("a", 1L), ("b", 2L)).toDF("k", "v")
    val d1 = Files.createTempDirectory("flip1").toString
    val d2 = Files.createTempDirectory("flip2").toString
    assert(Sinks.writeFlipped(df, "csv", d1) == "parquet")
    assert(Sinks.writeFlipped(df, "parquet", d2) == "csv")
    assert(spark.read.parquet(d1).count() == 2)
    assert(spark.read.option("header", "true").csv(d2).count() == 2)
    intercept[UnsupportedFormatException](Sinks.writeFlipped(df, "orc", d1))
  }
}
