package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

class StreamingCorpusSpec extends SparkSpec {

  private def ts(min: Int): Timestamp = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")

  private val goodText =
    "the quick brown fox jumps over the lazy dog and the cat watches it with great interest today"

  test("gates + watermark-bounded exact dedup on a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingCorpus.clean(in.toDF.toDF("doc_id", "text", "ts"))
      .select("doc_id")
      .writeStream.format("memory").queryName("sc_out").outputMode("append").start()
    try {
      in.addData(
        (1L, goodText, ts(0)),
        (2L, goodText, ts(1)),    // same fingerprint as 1 → deduped
        (3L, "too short", ts(2)), // fails the token gate
        (4L, goodText + " extra trailing words here", ts(3))) // distinct fp
      q.processAllAvailable()
      val ids = spark.table("sc_out").collect().map(_.getLong(0)).toSet
      assert(ids == Set(1L, 4L))
    } finally q.stop()
  }

  test("file-source pipeline survives checkpointed restart without duplicating output") {
    val srcDir = Files.createTempDirectory("sc_src").toString
    val outDir = Files.createTempDirectory("sc_out").toString
    val ckpt = Files.createTempDirectory("sc_ckpt").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("ts", TimestampType)))

    import spark.implicits._
    def writeBatch(rows: Seq[(Long, String, Timestamp)], name: String): Unit =
      rows.toDF("doc_id", "text", "ts").coalesce(1)
        .write.mode("append").parquet(s"$srcDir/$name")

    def startQuery() =
      StreamingCorpus.clean(
        spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(srcDir))
        .select("doc_id", "fingerprint")
        .writeStream.format("parquet")
        .option("path", outDir).option("checkpointLocation", ckpt)
        .outputMode("append").start()

    writeBatch(Seq((1L, goodText, ts(0)), (2L, goodText + " tail one two three", ts(1))), "b1")
    val q1 = startQuery()
    try q1.processAllAvailable() finally q1.stop()

    // restart from the same checkpoint; add one new doc + one duplicate
    writeBatch(Seq(
      (3L, goodText + " completely different continuation of words", ts(2)),
      (4L, goodText, ts(3))), "b2") // same fingerprint as doc 1 → deduped
    val q2 = startQuery()
    try q2.processAllAvailable() finally q2.stop()

    val out = spark.read.parquet(outDir).select("doc_id")
      .collect().map(_.getLong(0)).sorted
    assert(out.toSeq == Seq(1L, 2L, 3L), s"got ${out.toSeq}")
  }
}
