package graft.queries

import org.apache.spark.sql.types.{ArrayType, MapType, StructType}

import graft.SparkSpec

/** Contract checks over the declared inventory — the driver-facing
  * surface. Schema-level only (no data jobs): every query must at least
  * analyze against the sf0.001 corpus.
  */
class InventorySpec extends SparkSpec {

  test("query names are unique and benchNames all resolve") {
    val names = Inventory.all.map(_.name)
    assert(names.distinct.size == names.size)
    assert(Inventory.benchNames.forall(names.contains))
  }

  test("every query analyzes; oracle-checked queries have flat schemas") {
    // the driver's DuckDB hash-compare cannot digest nested cells —
    // an array/map/struct column in an oracle-checked result would
    // crash the round's correctness gate
    Inventory.all.foreach { q =>
      val schema = q.run(spark, sf).schema // analysis only, no job
      if (q.oracle.isDefined) {
        val nested = schema.fields.filter(f => f.dataType match {
          case _: ArrayType | _: MapType | _: StructType => true
          case _ => false
        })
        assert(nested.isEmpty,
          s"${q.name} is oracle-checked but returns nested columns: ${nested.map(_.name).mkString(",")}")
      }
    }
  }

  test("approx_percentile (q29) lands within 5% of exact percentiles") {
    import org.apache.spark.sql.functions._
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
    val rows = li.groupBy("l_returnflag")
      .agg(
        expr("approx_percentile(l_extendedprice, 0.5, 1000)").as("approx"),
        expr("percentile(l_extendedprice, 0.5)").as("exact"))
      .collect()
    rows.foreach { r =>
      val (a, e) = (r.getDouble(1), r.getDouble(2))
      assert(math.abs(a - e) / e < 0.05, s"${r.getString(0)}: approx $a vs exact $e")
    }
  }

  test("oracle SQL never references current_date/now (nondeterministic)") {
    Inventory.all.flatMap(q => q.oracle.map(q.name -> _)).foreach { case (n, sql) =>
      val lower = sql.toLowerCase
      assert(!lower.contains("current_date") && !lower.contains("now()"),
        s"$n oracle uses wall-clock time")
    }
  }
}
