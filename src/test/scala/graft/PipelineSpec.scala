package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._

import graft.config.LakeConfig
import graft.io.{Sinks, Sources, UnsupportedFormatException}
import graft.quality.{Cleaner, Validator}
import graft.transform.Derive

/** End-to-end pipeline semantics (SURVEY.md §2.A, §5): CSV all-string
  * typing, fill-before-drop ordering, temp-view plan snapshot, format
  * flip, spaced/case-insensitive column names.
  */
class PipelineSpec extends SparkSpec {

  lazy val (csvPath, pqPath) = PeopleFixture.writeBoth(spark)

  test("CSV source reads header with all-string columns (no inference)") {
    val df = Sources.csv(spark, csvPath)
    assert(df.columns.toSeq == PeopleFixture.header)
    assert(df.schema.fields.forall(_.dataType.typeName == "string"))
  }

  test("parquet source keeps footer types") {
    val df = Sources.parquet(spark, pqPath)
    assert(df.columns.toSeq == PeopleFixture.header)
  }

  test("unsupported format raises typed error") {
    intercept[UnsupportedFormatException](Sources.read(spark, "avro", csvPath))
  }

  test("validator profile: rows, cols, dups, per-column nulls") {
    val p = Validator.profile(Sources.parquet(spark, pqPath))
    assert(p.rows == 7)
    assert(p.cols == 7)
    assert(p.dupRows == 1) // one exact duplicate pair
    assert(p.nullCounts("Phone") == 1)
    assert(p.nullCounts("Job Title") == 1)
    assert(p.nullCounts("Email") == 0)
  }

  test("cleaner: fill Phone BEFORE dropna, then dedup — exact order") {
    val cleaned = Cleaner.clean(Sources.parquet(spark, pqPath))
    val rows = cleaned.collect()
    // u2 (Phone-only null) survives with "Unknown"; u4 (Job null) dropped;
    // u5 dup collapsed → 7 - 1(dropped) - 1(dup) = 5 rows
    assert(rows.length == 5)
    val u2 = rows.find(_.getAs[String]("User Id") == "u2").get
    assert(u2.getAs[String]("Phone") == "Unknown")
    assert(!rows.exists(_.getAs[String]("User Id") == "u4"))
  }

  test("inverting fill/drop order would lose the Phone-null row (pinned)") {
    val raw = Sources.parquet(spark, pqPath)
    val wrong = raw.na.drop().na.fill(Map("Phone" -> "Unknown")).dropDuplicates()
    assert(!wrong.collect().exists(_.getAs[String]("User Id") == "u2"))
  }

  test("temp view snapshots plan BEFORE age transform (dead-branch semantics)") {
    val cfg = LakeConfig(
      "parquet", "data_lake_query",
      "SELECT * FROM data_lake_query WHERE `Date of birth` BETWEEN '2000-01-01' AND '2024-12-31'")
    val out = Files.createTempDirectory("pipeline_out").resolve("result").toString
    val res = new Pipeline(spark).run(cfg, pqPath, out)
    // SQL ran against the snapshot: no age column, no age>30 filter
    assert(!res.result.columns.contains("age"))
    // format flip: parquet in → csv out
    assert(res.outputFormat == "csv")
    val back = Sources.csv(spark, out)
    assert(!back.columns.contains("age"))
    // `Date of birth` (config spelling) resolved case-insensitively against
    // `Date of Birth`; u3 (2001) and u6 (2003) qualify post-cleaning
    val ids = back.select("User Id").collect().map(_.getString(0)).sorted
    assert(ids.toSeq == Seq("u3", "u6"))
  }

  test("csv input direction flips to parquet output") {
    val cfg = LakeConfig("csv", "people_csv", "SELECT * FROM people_csv")
    val out = Files.createTempDirectory("pipeline_out2").resolve("result").toString
    val res = new Pipeline(spark).run(cfg, csvPath, out)
    assert(res.outputFormat == "parquet")
    assert(Sources.parquet(spark, out).count() == 5)
  }

  test("derive.age computes int age against injectable as-of date") {
    val df = Derive.age(
      Sources.parquet(spark, pqPath).na.drop(), asOf = Some("2024-12-18"))
    val ada = df.filter(col("`User Id`") === "u1").select("age").head.getInt(0)
    assert(ada == 39) // 1985-12-10 → 2024-12-18 is 39y8d → 14253d/365 = 39
    val over30 = Derive.adultsOver(df)
    assert(!over30.collect().exists(_.getAs[String]("User Id") == "u3"))
  }

  test("scratch-cleanup prologue clears pre-existing scratch files (A23)") {
    val scratch = Files.createTempDirectory("pipeline_scratch")
    Files.writeString(scratch.resolve("stale1.tmp"), "old")
    Files.createDirectory(scratch.resolve("sub"))
    Files.writeString(scratch.resolve("sub").resolve("stale2.tmp"), "old")
    assert(Files.list(scratch).count() == 2)

    val cfg = LakeConfig("csv", "people_scratch", "SELECT * FROM people_scratch")
    val out = Files.createTempDirectory("pipeline_out3").resolve("result").toString
    new Pipeline(spark).run(cfg, csvPath, out, scratchDir = Some(scratch.toString))

    assert(Files.list(scratch).count() == 0, "scratch dir should be emptied before the run")
    assert(Sources.parquet(spark, out).count() == 5, "run itself unaffected")
  }

  test("scratch cleanup is best-effort: bogus path does not fail the run") {
    val cfg = LakeConfig("csv", "people_scratch2", "SELECT * FROM people_scratch2")
    val out = Files.createTempDirectory("pipeline_out4").resolve("result").toString
    val res = new Pipeline(spark).run(
      cfg, csvPath, out, scratchDir = Some("badscheme://nope/x"))
    assert(res.outputFormat == "parquet")
  }

  test("notifier receives failure on bad format") {
    var got: Option[String] = None
    val notifier = new Notifier {
      def send(subject: String, message: String): Unit = got = Some(subject)
    }
    // "avro": no connector on the classpath, so it stays an unsupported
    // format now that orc/json joined the dispatch
    val cfg = LakeConfig("avro", "x", "SELECT 1")
    intercept[UnsupportedFormatException] {
      new Pipeline(spark, notifier).run(cfg, pqPath, "/tmp/never")
    }
    assert(got.contains("Glue Job Failure"))
  }
}
