package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.lake.VersionedTable

class StreamingLakeSpec extends SparkSpec {
  import spark.implicits._

  private def freshTable(): VersionedTable =
    VersionedTable(Files.createTempDirectory("graft-slake").toString, "k")

  test("upsertIfNew applies a batch once; the replay is a version-less no-op") {
    val t = freshTable()
    val batch = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    t.upsertIfNew(batch, "writer-1", 0L)
    val v = t.currentVersion()
    assert(v == 1 && t.lastTxn("writer-1").contains(0L))

    // exact replay (same appId + batchId): no new version, same data
    t.upsertIfNew(Seq((1L, "REPLAYED")).toDF("k", "v"), "writer-1", 0L)
    assert(t.currentVersion() == v)
    assert(t.read(spark).filter($"v" === "REPLAYED").count() == 0)

    // a DIFFERENT writer's batch 0 is not confused with writer-1's
    t.upsertIfNew(Seq((3L, "c")).toDF("k", "v"), "writer-2", 0L)
    assert(t.currentVersion() == v + 1 && t.read(spark).count() == 3)
  }

  test("txn markers survive unrelated commits, compaction, and vacuum") {
    val t = freshTable()
    t.upsertIfNew(Seq((1L, "a")).toDF("k", "v"), "w", 5L)
    t.append(Seq((2L, "b")).toDF("k", "v"))
    t.compact(spark, targetFiles = 1)
    t.vacuum(retainVersions = 1)
    assert(t.lastTxn("w").contains(5L), "carried-forward txn state lost")
    // the stale replay is still recognized after all that history
    t.upsertIfNew(Seq((9L, "late-replay")).toDF("k", "v"), "w", 3L)
    assert(t.read(spark).filter($"k" === 9).count() == 0)
  }

  test("streamed upserts equal the same batches applied by batch merge") {
    implicit val sqlCtx = spark.sqlContext
    val t = freshTable()
    val ckpt = Files.createTempDirectory("slake-ckpt").toString
    val in = MemoryStream[(Long, String)]
    val q = StreamingLake.upsertStream(
      in.toDF.toDF("k", "v"), t, "stream-a", ckpt)
    try {
      in.addData((1L, "a"), (2L, "b"))
      q.processAllAvailable()
      in.addData((2L, "b2"), (3L, "c")) // update 2, insert 3
      q.processAllAvailable()
    } finally q.stop()

    val expected = {
      val bt = freshTable()
      bt.append(Seq((1L, "a"), (2L, "b")).toDF("k", "v"))
      bt.merge(Seq((2L, "b2"), (3L, "c")).toDF("k", "v"))
      bt.read(spark).orderBy("k").collect().map(_.toSeq).toSeq
    }
    assert(t.read(spark).orderBy("k").collect().map(_.toSeq).toSeq == expected)
    assert(t.lastTxn("stream-a").exists(_ >= 1L))
  }

  test("streamed upserts maintain the materialized aggregate batch by batch") {
    implicit val sqlCtx = spark.sqlContext
    val t = freshTable()
    val aggRoot = Files.createTempDirectory("slake-magg").toString
    val m = new graft.lake.MaterializedAgg(t, aggRoot, Seq("g"), Seq("x"))
    val ckpt = Files.createTempDirectory("slake-ckpt3").toString
    val in = MemoryStream[(Long, String, Double)]
    val q = StreamingLake.upsertStreamMaintaining(
      in.toDF.toDF("k", "g", "x"), t, m, "stream-m", ckpt)
    try {
      in.addData((1L, "a", 10.0), (2L, "a", 20.0), (3L, "b", 5.0))
      q.processAllAvailable()
      in.addData((2L, "b", 99.0), (4L, "a", 1.0)) // move key 2 to group b
      q.processAllAvailable()
    } finally q.stop()

    def snap(df: org.apache.spark.sql.DataFrame) =
      df.select($"g", $"cnt", $"sum_x".cast("double"))
        .as[(String, Long, Double)].collect().sortBy(_._1).toSeq
    assert(m.currentVersion() == t.currentVersion())
    assert(snap(m.read(spark)) ==
      snap(graft.lake.IncrementalAgg.init(t.read(spark), Seq("g"), Seq("x"))))
    assert(snap(m.read(spark)) ==
      Seq(("a", 2L, 11.0), ("b", 2L, 104.0)))
  }

  test("checkpointed restart re-delivers the last batch; the table does not double-apply") {
    val srcDir = Files.createTempDirectory("slake-src").toString
    val ckpt = Files.createTempDirectory("slake-ckpt2").toString
    val t = freshTable()
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("k", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("v", org.apache.spark.sql.types.StringType)))

    def writeSrc(rows: Seq[(Long, String)], name: String): Unit =
      rows.toDF("k", "v").coalesce(1).write.mode("append").parquet(s"$srcDir/$name")

    def start() = StreamingLake.upsertStream(
      spark.readStream.schema(schema).option("recursiveFileLookup", "true").parquet(srcDir),
      t, "restart-w", ckpt)

    writeSrc(Seq((1L, "a"), (2L, "b")), "b1")
    val q1 = start()
    try q1.processAllAvailable() finally q1.stop()
    val vAfterFirst = t.currentVersion()

    // restart from the same checkpoint with new source data; recovery
    // may replay the committed batch — the txn marker absorbs it
    writeSrc(Seq((2L, "b2"), (3L, "c")), "b2")
    val q2 = start()
    try q2.processAllAvailable() finally q2.stop()

    val out = t.read(spark).orderBy("k").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(out.toSeq == Seq((1L, "a"), (2L, "b2"), (3L, "c")), s"got ${out.toSeq}")
    assert(t.currentVersion() == vAfterFirst + 1, "replay must not mint extra versions")
  }
}
