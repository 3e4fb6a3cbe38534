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
    // `pagerank_iteration` pseudo query: the UN-checkpointed per-
    // iteration subtree of GraphOps.pageRank over the fixture's doc-id
    // chain edges — localCheckpoint truncates lineage, so the declared
    // graph queries' dumps never show the loop body (r14 verdict #6);
    // this dump is the standing plan evidence for the hoisted degree
    // join (ONE adjacency join per iteration).
    // The q275–q278 edge chains sit behind localCheckpoint barriers, so
    // their declared-query dumps never show the resolve/canonicalize
    // projection shape — these two pseudo queries dump the SUBTREE both
    // ways (the r14 fused composition vs the shipped split projection)
    // so the plan diff is a committed artifact, not a prose claim.
    def edgesSubtree(splitProj: Boolean): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions._
      import graft.operators.{HtmlText, WebOps}
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val did = col("doc_id").cast("string")
      val base = concat(lit("https://"), col("source"),
        lit(".example.com/doc/"), did)
      val html = concat(
        lit("<html><body><a href=\"/doc/"), (col("doc_id") + 20).cast("string"),
        lit("?utm_source=x\">next</a><a href=\"related/"),
        (col("doc_id") + 2).cast("string"), lit("\">rel</a></body></html>"))
      val exploded = d
        .select(col("doc_id"), col("source"))
        .repartition(spark.sparkContext.defaultParallelism)
        .select(col("doc_id"), base.as("__base"),
          HtmlText.extractLinks(html).as("__hrefs"))
        .select(col("doc_id"), col("__base"), explode(col("__hrefs")).as("__href"))
      val withUrl =
        if (splitProj)
          exploded
            .select(col("doc_id"),
              WebOps.resolveHref(col("__base"), col("__href")).as("__r"))
            .select(col("doc_id"), WebOps.canonicalizeUrl(col("__r")).as("url"))
        else
          exploded.select(col("doc_id"), WebOps.canonicalizeUrl(
            WebOps.resolveHref(col("__base"), col("__href"))).as("url"))
      withUrl.filter(col("url").isNotNull && col("url") =!= "")
    }
    val pseudo: Map[String, () => org.apache.spark.sql.DataFrame] = Map(
      "edges_resolve_canonical_fused" -> (() => edgesSubtree(splitProj = false)),
      "edges_resolve_canonical_split" -> (() => edgesSubtree(splitProj = true)),
      "pagerank_iteration" -> { () =>
        import org.apache.spark.sql.functions._
        val d = spark.read.parquet(s"$sfDir/documents.parquet")
        val edges = d.select(col("doc_id").as("id_a"),
          (col("doc_id") + 1).as("id_b"))
        val directed = edges
          .select(col("id_a").as("src"), col("id_b").as("dst"))
          .unionByName(edges.select(col("id_b").as("src"), col("id_a").as("dst")))
          .localCheckpoint(false)
        val outDeg = directed.groupBy("src").agg(count(lit(1)).as("deg"))
        val adj = directed.repartition(col("src")).join(outDeg, Seq("src"))
          .localCheckpoint(false)
        val nodes = adj.select(col("src").as("id")).distinct()
          .localCheckpoint(false)
        val n = nodes.count()
        val rank0 = nodes.withColumn("rank", lit(1.0 / n))
        graft.operators.GraphOps.pageRankIteration(adj, nodes, rank0, 0.85, n)
      })
    pseudo.foreach { case (name, build) =>
      if (names(name)) {
        try {
          val plan = build().queryExecution.explainString(
            org.apache.spark.sql.execution.FormattedMode)
          val w = new PrintWriter(new File(outDir, s"${name}_$tag.txt"), "UTF-8")
          try w.println(plan) finally w.close()
          println(s"[plandump] wrote ${name}_$tag.txt")
        } catch { case e: Throwable =>
          System.err.println(s"[plandump] $name failed: ${e.getMessage}")
        }
      }
    }
    val qs = (Inventory.all ++ Bench.productionTwins).filter(q => names(q.name))
    val missing = names -- qs.map(_.name).toSet -- pseudo.keySet
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
