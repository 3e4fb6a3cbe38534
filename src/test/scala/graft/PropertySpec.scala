package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.scalacheck.{Gen, Prop, Test => SCTest}

import graft.quality.{Cleaner, Validator}

/** Property-based invariants from SURVEY.md §5, over generated
  * people-shaped frames (spaced column names, nulls, duplicates).
  * Plain ScalaCheck driven through Test.check; frames are kept tiny so
  * each property runs dozens of Spark jobs in seconds.
  */
class PropertySpec extends SparkSpec {

  private val cols = Seq("User Id", "Phone", "Job Title")

  private val cellGen: Gen[String] =
    Gen.frequency(
      4 -> Gen.oneOf("a", "b", "c", "x y", ""),
      1 -> Gen.const(null: String))

  private val rowGen: Gen[Seq[String]] = Gen.listOfN(cols.length, cellGen)

  private val framesGen: Gen[List[Seq[String]]] = for {
    base <- Gen.listOfN(6, rowGen)
    dups <- Gen.someOf(base) // duplicate a random subset
  } yield base ++ dups

  private def toDf(rows: List[Seq[String]]): DataFrame = {
    import scala.jdk.CollectionConverters._
    val schema = StructType(cols.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(rows.map(r => Row(r: _*)).asJava, schema)
  }

  private def check(name: String, p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(15), p)
    assert(res.passed, s"$name: $res")
  }

  test("dropDuplicates is idempotent") {
    check("dedup idempotent", Prop.forAll(framesGen) { rows =>
      val once = toDf(rows).dropDuplicates()
      once.count() == once.dropDuplicates().count()
    })
  }

  test("duplicate count is non-negative: count >= distinct.count") {
    check("dup count", Prop.forAll(framesGen) { rows =>
      val df = toDf(rows)
      df.count() >= df.distinct().count()
    })
  }

  test("targeted fillna eliminates nulls ONLY in the targeted column") {
    check("fillna targeted", Prop.forAll(framesGen) { rows =>
      val df = toDf(rows)
      val filled = df.na.fill(Map("Phone" -> "Unknown"))
      val phoneNulls = filled.filter(col("Phone").isNull).count()
      // other columns keep their null counts
      val othersSame = cols.filterNot(_ == "Phone").forall { c =>
        df.filter(col(c).isNull).count() == filled.filter(col(c).isNull).count()
      }
      phoneNulls == 0 && othersSame
    })
  }

  test("profile null-count vector equals brute-force per-column scan") {
    check("null vector", Prop.forAll(framesGen) { rows =>
      val df = toDf(rows)
      val prof = Validator.profile(df)
      cols.forall(c => prof.nullCounts(c) == df.filter(col(c).isNull).count())
    })
  }

  test("clean = fill(Phone) then dropna then dropDuplicates, in that order") {
    check("clean order", Prop.forAll(framesGen) { rows =>
      val df = toDf(rows)
      val cleaned = Cleaner.clean(df)
      // rows null ONLY in Phone survive (as "Unknown"); rows null in any
      // other column are gone; result is exactly-duplicate-free
      val expectSurvivors = df
        .na.fill(Map("Phone" -> "Unknown")).na.drop().dropDuplicates().count()
      val noNulls = cols.forall(c => cleaned.filter(col(c).isNull).count() == 0)
      cleaned.count() == expectSurvivors && noNulls
    })
  }

  test("csv -> parquet -> csv round-trip preserves cleaned string data") {
    check("format round-trip", Prop.forAll(framesGen) { rows =>
      // cleaned: no nulls, no dups — the subset the reference pipeline
      // actually writes; empty string is EXCLUDED (Spark CSV cannot
      // distinguish "" from null on read — a real, documented limitation)
      val cleaned = Cleaner.clean(toDf(rows)).filter(cols.map(c => col(c) =!= "").reduce(_ && _))
      val dir = java.nio.file.Files.createTempDirectory("roundtrip").toString
      cleaned.write.option("header", "true").mode("overwrite").csv(s"$dir/c1")
      val c1 = spark.read.option("header", "true").csv(s"$dir/c1")
      c1.write.mode("overwrite").parquet(s"$dir/p")
      spark.read.parquet(s"$dir/p").write.option("header", "true").mode("overwrite").csv(s"$dir/c2")
      val c2 = spark.read.option("header", "true").csv(s"$dir/c2")
      c2.exceptAll(cleaned).count() == 0 && cleaned.exceptAll(c2).count() == 0
    })
  }
}
