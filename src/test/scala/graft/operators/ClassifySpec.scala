package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ClassifySpec extends SparkSpec {

  import spark.implicits._

  test("nbScore matches a hand-computed model on a two-label corpus") {
    val train = Seq(
      (0L, "spam", "buy buy now"),
      (1L, "ham", "hello world hello")).toDF("id", "label", "text")
    val m = Classify.nbTrain(train, "label", "text", vocab = 4096)
    val got = Classify.nbScore(Seq((9L, "buy hello")).toDF("id", "text"), m, "id", "text")
      .head()

    // replay: 3 tokens per class; the scored doc has one token of each
    // vocabulary. Buckets are distinct with overwhelming probability at
    // V=4096 (and the assert below fails loudly if not).
    def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP)
    val V = 4096.0
    // per class: seen-token lp + unseen-token lp (other class's word) + prior
    val spamSeen = r6(math.log(3.0 / (3 + V)))  // "buy" counted twice
    val spamMiss = r6(math.log(1.0 / (3 + V)))  // "hello" unseen by spam
    val hamSeen  = r6(math.log(3.0 / (3 + V)))  // "hello" counted twice
    val hamMiss  = r6(math.log(1.0 / (3 + V)))  // "buy" unseen by ham
    val prior    = r6(math.log(0.5))
    val spamScore = (spamSeen + spamMiss + prior).toDouble
    val hamScore  = (hamSeen + hamMiss + prior).toDouble
    assert(spamScore == hamScore) // symmetric corpus → exact tie
    // tie breaks to the lexicographically smallest label
    assert(got.getString(1) == "ham")
    assert(got.getDouble(2) == hamScore)
  }

  test("nbTrain/nbScore separate two disjoint vocabularies perfectly") {
    val aWords = Seq("alpha", "beta", "gamma", "delta")
    val bWords = Seq("uno", "dos", "tres", "cuatro")
    def doc(words: Seq[String], seed: Int) =
      Iterator.continually(words).flatten.slice(seed, seed + 6).mkString(" ")
    val rows = (0 until 40).map { i =>
      val isA = i % 2 == 0
      (i.toLong, if (isA) "A" else "B", doc(if (isA) aWords else bWords, i % 4))
    }
    val df = rows.toDF("id", "label", "text")
    val m = Classify.nbTrain(df.filter($"id" < 20), "label", "text")
    val scored = Classify.nbScore(df.filter($"id" >= 20), m, "id", "text")
      .join(df.select($"id", $"label".as("actual")), "id")
    assert(scored.count() == 20)
    assert(scored.filter($"pred" =!= $"actual").count() == 0)
  }

  test("token-less documents fall back to the argmax prior") {
    val train = Seq(
      (0L, "big", "x y z"), (1L, "big", "x z y"), (2L, "big", "y x"),
      (3L, "small", "q r")).toDF("id", "label", "text")
    val m = Classify.nbTrain(train, "label", "text")
    val got = Classify.nbScore(
        Seq((7L, ""), (8L, "   ")).toDF("id", "text"), m, "id", "text")
      .collect()
    assert(got.length == 2)
    assert(got.forall(_.getString(1) == "big")) // prior ln(3/4) > ln(1/4)
    val expected = BigDecimal(math.log(0.75))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.forall(_.getDouble(2) == expected))
  }

  test("null labels are excluded from training; scoring plan joins the model broadcast-only") {
    val train = Seq(
      (0L, "a", "x x"), (1L, "b", "y y"), (2L, null, "z z"))
      .toDF("id", "label", "text")
    val m = Classify.nbTrain(train, "label", "text")
    assert(m.priors.select("label").as[String].collect().sorted.toSeq == Seq("a", "b"))

    val scored = Classify.nbScore(Seq((5L, "x z")).toDF("id", "text"), m, "id", "text")
    val plan = scored.queryExecution.executedPlan.toString
    // the model attaches via broadcast joins only — a sort-merge join
    // here would mean the bounded model is being shuffled with the data
    assert(!plan.contains("SortMergeJoin"), plan)
    assert(scored.head().getString(1) == "a")
  }

  test("nbScorer native expression equals batch nbScore bit-for-bit on the fixture") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val m = Classify.nbTrain(d.filter($"doc_id" % 2 === 0), "lang", "text")
    val batch = Classify.nbScore(d.filter($"doc_id" % 2 === 1), m, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    val scorer = Classify.nbScorer(m)
    val native = d.filter($"doc_id" % 2 === 1)
      .select($"doc_id", scorer($"text").as("p"))
      .select($"doc_id", $"p.pred", $"p.score")
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getDouble(2))).toMap
    assert(native.keySet == batch.keySet)
    assert(native.keys.forall(k => native(k) == batch(k)),
      native.keys.filter(k => native(k) != batch(k)).take(3)
        .map(k => s"$k: ${native(k)} vs ${batch(k)}").mkString("; "))
    // map-only: no exchange in the native scoring plan
    val plan = d.select(scorer($"text")).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("knnPropagate labels two separable clusters perfectly; weights are the decimal cos sums") {
    // two tight clusters around orthogonal axes; seeds 0-5, queries 10-13
    def jitter(base: Array[Float], eps: Float) = base.map(_ + eps)
    val ax = Array(1f, 0f, 0f)
    val ay = Array(0f, 1f, 0f)
    val seed = Seq(
      (0L, jitter(ax, 0.00f), "X"), (2L, jitter(ax, 0.01f), "X"), (4L, jitter(ax, 0.02f), "X"),
      (1L, jitter(ay, 0.00f), "Y"), (3L, jitter(ay, 0.01f), "Y"), (5L, jitter(ay, 0.02f), "Y"))
      .toDF("vec_id", "embedding", "lang")
    val queries = Seq(
      (10L, jitter(ax, 0.03f)), (11L, jitter(ay, 0.03f)),
      (12L, jitter(ax, 0.04f)), (13L, jitter(ay, 0.04f)))
      .toDF("qid", "embedding")
    val cents = Similarity.centroids(seed, "vec_id", "embedding", 2)
    val got = Classify.knnPropagate(queries, seed, "vec_id", "qid", "embedding",
        "lang", k = 3, cents = cents, nprobe = 2, scale = 6)
      .orderBy("qid").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(3))).toSeq ==
      Seq((10L, "X", 3L), (11L, "Y", 3L), (12L, "X", 3L), (13L, "Y", 3L)))
    // weight is a sum of 3 cosines each <= 1, rounded 6dp — bounded and positive
    assert(got.forall(r => r.getDouble(2) > 2.5 && r.getDouble(2) <= 3.0))
  }

  test("knnPropagate vote ties break to the lexicographically smallest label") {
    // one seed per label at the SAME point: both neighbors have identical
    // cosine to any query, so the weighted vote ties exactly
    val seed = Seq(
      (0L, Array(1f, 0f), "b"), (1L, Array(1f, 0f), "a"))
      .toDF("vec_id", "embedding", "lang")
    val queries = Seq((10L, Array(1f, 0.1f))).toDF("qid", "embedding")
    val cents = Similarity.centroids(seed, "vec_id", "embedding", 1)
    val got = Classify.knnPropagate(queries, seed, "vec_id", "qid", "embedding",
        "lang", k = 2, cents = cents, nprobe = 1).head()
    assert(got.getString(1) == "a")
    assert(got.getLong(3) == 1L) // one vote per label; 'a' wins the tie
  }

  test("declared q175 parameterization converges to the majority prior on the label-independent fixture") {
    val d = spark.read.parquet(s"$sf/documents.parquet")
    val m = Classify.nbTrain(d.filter($"doc_id" % 2 === 0), "lang", "text")
    val scored = Classify.nbScore(d.filter($"doc_id" % 2 === 1), m, "doc_id", "text")
    // text is synthetic and label-independent, so the learned posteriors
    // are dominated by the class prior; the majority label must win the
    // plurality of test docs (a behavioral sanity floor, not a claim of
    // linguistic signal — ClassifySpec's separable test covers learning)
    val top = scored.groupBy("pred").count().orderBy(desc("count"), col("pred"))
      .head().getString(0)
    val majority = d.filter($"doc_id" % 2 === 0).groupBy("lang").count()
      .orderBy(desc("count"), col("lang")).head().getString(0)
    assert(top == majority)
  }

  test("prCurve: hand-computed sweep, null denominators, histogram == row-level definition") {
    import spark.implicits._
    // scores: positives at 0.9/0.7/0.3, negatives at 0.8/0.2/0.1
    val scored = Seq(
      (true, 0.9), (true, 0.7), (true, 0.3),
      (false, 0.8), (false, 0.2), (false, 0.1)).toDF("y", "s")
    val got = Classify.prCurve(scored, "y", "s", Seq(0.0, 0.5, 0.95))
      .collect().map(r => (r.getDouble(0), r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)), Option(r.get(5)), Option(r.get(6))))
    // t=0.0: everything predicted positive → tp=3 fp=3 fn=0
    assert(got(0) == ((0.0, 3L, 3L, 0L, Some(0.5), Some(1.0), Some(0.6667))))
    // t=0.5: tp=2 (0.9,0.7) fp=1 (0.8) fn=1 (0.3)
    assert(got(1) == ((0.5, 2L, 1L, 1L, Some(0.6667), Some(0.6667), Some(0.6667))))
    // t=0.95: nothing predicted positive → precision NULL, recall 0
    assert(got(2) == ((0.95, 0L, 0L, 3L, None, Some(0.0), Some(0.0))))
    // no positives at all: recall and f1 must be NULL, not 0/0
    val negOnly = Seq((false, 0.4), (false, 0.6)).toDF("y", "s")
    val g2 = Classify.prCurve(negOnly, "y", "s", Seq(0.5)).head()
    assert(g2.getLong(1) == 0 && g2.getLong(2) == 1 && g2.getLong(3) == 0)
    assert(g2.isNullAt(5), "recall must be NULL with zero actual positives")
  }
}
