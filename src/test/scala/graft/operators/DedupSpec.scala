package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class DedupSpec extends SparkSpec {

  lazy val docs = spark.read.parquet(s"$sf/documents.parquet")

  test("exactKeepMin keeps the minimum-id row per key, deterministically") {
    import spark.implicits._
    val df = Seq((3L, "a"), (1L, "a"), (2L, "b")).toDF("id", "k")
    val out = Dedup.exactKeepMin(df, Seq("k"), "id").orderBy("k")
      .collect().map(r => (r.getString(1), r.getLong(0)))
    assert(out.toSeq == Seq(("a", 1L), ("b", 2L)))
  }

  test("shingleHashes: distinct w-shingles, empty below w tokens") {
    import spark.implicits._
    val df = Seq("a b c d", "a b", "a b c a b c").toDF("text")
    val sizes = df.select(size(Dedup.shingleHashes(col("text"), 3))).collect().map(_.getInt(0))
    // "a b c d" → {abc,bcd}; "a b" → none; "a b c a b c" → {abc,bca,cab}
    assert(sizes.toSeq == Seq(2, 0, 3))
  }

  test("native ShingleHashesExpr is value-identical to the HOF formulation") {
    import spark.implicits._
    val edge = Seq("", "   ", "one two", "A b C d A b C d", "x\ty  z w").toDF("text")
    for (frame <- Seq(docs, edge)) {
      val both = frame.select(
        Dedup.shingleHashesHof(col("text"), 3).as("hof"),
        Dedup.shingleHashes(col("text"), 3).as("native"))
      val mismatches = both.filter(col("hof") =!= col("native")).count()
      assert(mismatches == 0)
    }
  }

  test("native SimHashExpr is value-identical to the HOF formulation") {
    import spark.implicits._
    val edge = Seq("", "   ", "one", "one two three", "x\ty  z").toDF("text")
    for (frame <- Seq(docs, edge)) {
      val both = frame.select(
        Dedup.simHashHof(col("text")).as("hof"),
        Dedup.simHash(col("text")).as("native"))
      assert(both.filter(col("hof") =!= col("native")).count() == 0)
    }
  }

  test("native MinHashSignatureExpr is value-identical to the HOF formulation") {
    import graft.functions.MinHashSignatureExpr
    val sh = Dedup.shingleHashes(col("text"), 3)
    val both = docs.select(
      Dedup.minHashSignature(sh, k = 128, seed = 42L).as("hof"),
      MinHashSignatureExpr(sh, k = 128, seed = 42L).as("native"))
    val mismatches = both.filter(
      (col("hof").isNull =!= col("native").isNull) ||
        (col("hof").isNotNull && col("hof") =!= col("native"))).count()
    assert(mismatches == 0)
  }

  test("minhash signature is deterministic and k-long") {
    val sig = docs.select(
      Dedup.minHashSignature(Dedup.shingleHashes(col("text"), 3), k = 64).as("s"))
      .filter(col("s").isNotNull)
    val sizes = sig.select(size(col("s"))).distinct().collect().map(_.getInt(0))
    assert(sizes.toSeq == Seq(64))
    // determinism: identical across two evaluations
    val a = sig.collect().map(_.getSeq[Long](0))
    val b = sig.collect().map(_.getSeq[Long](0))
    assert(a.zip(b).forall { case (x, y) => x == y })
  }

  test("minhash LSH near-dups achieve high recall vs exhaustive jaccard") {
    // exhaustive truth at jaccard >= 0.5 over trigram shingle sets
    val a = docs.select(col("doc_id").as("id_a"), Dedup.shingleHashes(col("text"), 3).as("sh_a"))
    val b = docs.select(col("doc_id").as("id_b"), Dedup.shingleHashes(col("text"), 3).as("sh_b"))
    val inter = size(array_intersect(col("sh_a"), col("sh_b"))).cast("double")
    val union = (size(col("sh_a")) + size(col("sh_b"))).cast("double") - inter
    val truth = a.join(b, col("id_a") < col("id_b"))
      .withColumn("jac", when(union === 0, 1.0).otherwise(inter / union))
      .filter(col("jac") >= 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    val found = Dedup.minHashNearDups(docs, "doc_id", "text", k = 128, bands = 32, threshold = 0.5)
      .select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(truth.nonEmpty, "fixture should contain near-dups")
    // verification step guarantees precision = 1.0
    assert(found.subsetOf(truth))
    // banding (32 bands × 4 rows) catches ~all pairs at jac 0.5
    val recall = found.size.toDouble / truth.size
    assert(recall >= 0.9, s"recall $recall (found ${found.size}/${truth.size})")
  }

  test("minHashDedup removes one side of each dup pair") {
    val deduped = Dedup.minHashDedup(docs, "doc_id", "text", threshold = 0.5)
    val pairs = Dedup.minHashNearDups(docs, "doc_id", "text", threshold = 0.5).count()
    assert(deduped.count() < docs.count() || pairs == 0)
    // surviving set has no near-dup pair (greedy keeps min-id)
    val again = Dedup.minHashNearDups(deduped, "doc_id", "text", threshold = 0.5)
    // greedy transitive approximation can retain chained pairs; allow few
    assert(again.count() <= pairs)
  }

  test("maxBucket cap drops saturated hot buckets, default keeps real dups") {
    import spark.implicits._
    // 50 identical docs: every band bucket has all 50 ids
    val hot = (1L to 50L).map(i => (i, "alpha beta gamma delta epsilon zeta")).toDF("id", "text")
    val capped = Dedup.minHashNearDups(hot, "id", "text", maxBucket = 10)
    assert(capped.count() == 0) // all buckets saturated past the cap
    val uncapped = Dedup.minHashNearDups(hot, "id", "text")
    assert(uncapped.count() == 50L * 49 / 2) // every pair found, jaccard 1.0
  }

  test("hotShingles finds corpus-wide boilerplate; exclusion keeps true pairs") {
    import spark.implicits._
    val boiler = "alpha beta gamma"
    val docs = ((1 to 18).map(i =>
      (i.toLong, s"$boiler unique$i word$i token$i extra$i more$i stuff$i")) ++ Seq(
      (100L, s"$boiler shared tail of this near duplicate document pair here"),
      (101L, s"$boiler shared tail of this near duplicate document pair here")))
      .toDF("id", "text")

    val hot = Dedup.hotShingles(docs, "text", w = 3, minDf = 15)
    assert(hot.nonEmpty) // the all-boilerplate shingle appears in all 20 docs

    val plain = Dedup.minHashNearDups(docs, "id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val capped = Dedup.minHashNearDups(docs, "id", "text", excludeShingles = hot)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(plain.contains((100L, 101L)))
    assert(capped.contains((100L, 101L))) // true pair survives boilerplate removal
    assert(!capped.exists { case (a, b) => a <= 18 && b <= 18 }) // no boilerplate-only pairs
  }

  test("simhash: identical docs distance 0; near-dups small distance") {
    import spark.implicits._
    val df = Seq(
      (1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "the quick brown fox jumps over the lazy dog"),
      (3L, "the quick brown fox leaps over the lazy dog"),
      (4L, "completely different words entirely unrelated content here"))
      .toDF("id", "text")
    val fps = df.select(col("id"), Dedup.simHash(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fps(1L) == fps(2L))
    def ham(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(ham(fps(1L), fps(3L)) <= 16)
    assert(ham(fps(1L), fps(4L)) > ham(fps(1L), fps(3L)))
  }

  test("simHashNearDups finds exact-dup pair via pigeonhole banding") {
    import spark.implicits._
    val df = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six seven"))
      .toDF("id", "text")
    val pairs = Dedup.simHashNearDups(df, "id", "text", maxDist = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSeq == Seq((1L, 2L)))
  }

  test("embedding near-dup LSH: precision 1.0 (verified cosine)") {
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val found = Dedup.embeddingNearDups(emb, "vec_id", "embedding", dim = 64,
      threshold = 0.45, nPlanes = 4)
    val bad = found.filter(col("cos") < 0.45).count()
    assert(bad == 0)
  }

  test("embedding near-dup LSH: OR-tables reach recall 1 vs exhaustive") {
    import graft.functions.VectorFunctions
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    val a = emb.select(col("vec_id").as("id_a"), col("embedding").as("v_a"))
    val b = emb.select(col("vec_id").as("id_b"), col("embedding").as("v_b"))
    val truth = a.join(b, col("id_a") < col("id_b"))
      .withColumn("cos", VectorFunctions.cosine(col("v_a"), col("v_b")))
      .filter(col("cos") >= 0.45)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // per-table collision at cos 0.45 is ~0.42 (2 planes); 48 OR-tables
    // miss a true pair w.p. (1 − 0.42)^48 ≈ 4e-11 — recall is 1 in any
    // run that doesn't win the lottery twice
    val found = Dedup.embeddingNearDups(emb, "vec_id", "embedding", dim = 64,
      threshold = 0.45, nPlanes = 2, nTables = 48)
      .select("id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(truth.nonEmpty, "fixture should contain near-dup embeddings")
    assert(found.subsetOf(truth)) // precision 1.0 (verified cosine)
    assert(found == truth, s"missed ${(truth -- found).mkString(",")}")
  }
}
