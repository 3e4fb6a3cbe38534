package graft.queries

import org.apache.spark.sql.Row

import graft.SparkSpec

/** In-CI half of the differential fuzzer: every generated case's
  * dialect-neutral SQL (what the driver also runs on DuckDB) must agree
  * with its independently-constructed DataFrame-API program. A mismatch
  * localizes a fault to one of the two front ends — or to the generator,
  * which is exactly the class of bug that would otherwise surface as an
  * opaque oracle hash-mismatch in the driver's gate.
  */
class FuzzSpec extends SparkSpec {

  private lazy val tables: Map[String, org.apache.spark.sql.DataFrame] = {
    val m = Map(
      "orders" -> spark.read.parquet(s"$sf/orders.parquet"),
      "lineitem" -> spark.read.parquet(s"$sf/lineitem.parquet"),
      "documents" -> spark.read.parquet(s"$sf/documents.parquet"),
      "embeddings" -> spark.read.parquet(s"$sf/embeddings.parquet"))
    m.foreach { case (n, df) =>
      df.createOrReplaceTempView(n)
      df.cache().count() // tiny at sf0.001; 260 fuzz jobs re-scan them
    }
    m
  }

  private def normalize(r: Row): (String, Long, Option[Double], Option[Long]) = (
    r.getString(0),
    r.getLong(1),
    Option(r.get(2)).map(_.asInstanceOf[Double]),
    Option(r.get(3)).map(_.asInstanceOf[Long]))

  test("generation is a pure function of the seed") {
    assert(FuzzQueries.cases.size ==
      FuzzQueries.nScan + FuzzQueries.nGroup + FuzzQueries.nTop +
        FuzzQueries.nJoin + FuzzQueries.nWin + FuzzQueries.nScalar + FuzzQueries.nSetop +
        FuzzQueries.nRollup + FuzzQueries.nDate + FuzzQueries.nNull + FuzzQueries.nStr +
        FuzzQueries.nDecCorr + FuzzQueries.nLateral + FuzzQueries.nFilter +
        FuzzQueries.nFrame)
    assert(FuzzQueries.cases.map(_.id).distinct.size == FuzzQueries.cases.size)
    // lazy val caches, so regenerate through the private path: sql text
    // equality across two JVM-wide accesses plus a spot re-render
    val again = FuzzQueries.bundles.map { case (n, cs) => n -> FuzzQueries.bundleSql(cs) }
    assert(again == FuzzQueries.bundles.map { case (n, cs) => n -> FuzzQueries.bundleSql(cs) })
  }

  test("all 344 cases: SQL and DataFrame-API programs agree row-for-row") {
    tables // register + cache the views before any spark.sql below
    val failures = FuzzQueries.cases.flatMap { c =>
      val viaSql = normalize(spark.sql(c.sql).head())
      val viaDsl = normalize(c.dsl(tables).head())
      if (viaSql == viaDsl) None
      else Some(s"${c.id}: sql=$viaSql dsl=$viaDsl\n  ${c.sql}")
    }
    assert(failures.isEmpty, s"${failures.size} divergent cases:\n${failures.mkString("\n")}")
  }

  test("family P: registered SQL-surface functions agree with their Column-API twins") {
    tables
    // the model-parameterized cases resolve these names at analysis time
    val docs = tables("documents")
    val fzMerges = graft.operators.Bpe.train(docs, "text", 12)
    // registerIdsSql covers all three kinds (bpe/bpe_ids/bpe_decode)
    // under one name — the kind-12 round-trip cases need the id surface
    graft.operators.Bpe.registerIdsSql(spark, "fz_bpe", fzMerges,
      graft.operators.Bpe.vocabFromCorpus(docs, "text", fzMerges))
    graft.operators.Classify.registerSql("fz_nb",
      graft.operators.Classify.nbTrain(docs, "lang", "text", vocab = 256))
    graft.operators.TextAnalysis.registerLmSql("fz_lm",
      graft.operators.TextAnalysis.charNgramModel(docs, "text", 3), 3)
    // the kind-19 unigram round-trip cases need all three kinds under
    // one name (unigram/unigram_ids/unigram_decode)
    graft.operators.Unigram.registerIdsSql(spark, "fz_uni",
      graft.operators.Unigram.train(docs, "text", vocabSize = 48))

    assert(FuzzQueries.sqlSurfaceCases.size == FuzzQueries.nSurface)
    assert(FuzzQueries.sqlSurfaceCases.map(_.id).distinct.size == FuzzQueries.nSurface)
    val failures = FuzzQueries.sqlSurfaceCases.flatMap { c =>
      val viaSql = normalize(spark.sql(c.sql).head())
      val viaDsl = normalize(c.dsl(tables).head())
      if (viaSql == viaDsl) None
      else Some(s"${c.id}: sql=$viaSql dsl=$viaDsl\n  ${c.sql}")
    }
    assert(failures.isEmpty, s"${failures.size} divergent cases:\n${failures.mkString("\n")}")
  }

  test("bundles cover every case exactly once and execute end-to-end") {
    tables
    val bundled = FuzzQueries.bundles.flatMap(_._2.map(_.id))
    assert(bundled.sorted == FuzzQueries.cases.map(_.id).sorted)
    FuzzQueries.bundles.foreach { case (name, cs) =>
      val out = spark.sql(FuzzQueries.bundleSql(cs)).collect()
      assert(out.length == cs.size, s"$name row count")
      assert(out.map(_.getString(0)).toSeq == cs.map(_.id).sorted, s"$name ordered by fq")
    }
  }
}
