package graft

import java.io.{File, PrintWriter}

import graft.queries.Inventory

/** Dump `.explain("formatted")` for named declared queries to files —
  * the optimization round's plan-evidence artifact (plans/rN/
  * <query>_<tag>.txt). Usage:
  *
  *   sbt 'runMain graft.PlanDump plans/r14 before q277_frontier_advance …'
  *
  * SPARK_GRAFT_SF_DIR selects the fixture (default sf0.1 — plan SHAPE is
  * sf-independent for everything but AQE-decided strategies, which the
  * formatted explain of the unexecuted plan does not include anyway).
  * Queries that drive actions during CONSTRUCTION (store-building
  * composites) still work: construction runs, and the dumped plan is the
  * final returned frame's.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <outDir> <tag> <query>...")
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2).toSet
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    new File(outDir).mkdirs()
    val spark = GraftSession.get("graft-plandump")
    val qs = (Inventory.all ++ Bench.productionTwins).filter(q => names(q.name))
    val missing = names -- qs.map(_.name).toSet
    if (missing.nonEmpty)
      System.err.println(s"[plandump] unknown queries: ${missing.mkString(", ")}")
    qs.foreach { q =>
      try {
        val df = q.run(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        val w = new PrintWriter(new File(outDir, s"${q.name}_$tag.txt"), "UTF-8")
        try w.println(plan) finally w.close()
        println(s"[plandump] wrote ${q.name}_$tag.txt")
      } catch { case e: Throwable =>
        System.err.println(s"[plandump] ${q.name} failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
