package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GraftSession

/** Deterministic scale-factor amplifier: derives an sf×FACTOR fixture
  * from an existing one by FACTOR-way re-keyed union amplification, so
  * the scaling audit (SCALE.md) can execute the headline bench one order
  * of magnitude above the largest driver-provisioned fixture instead of
  * arguing from plan shapes alone.
  *
  * Design rules:
  *  - every key column shifts by `copy × stride` with ONE stride per key
  *    DOMAIN (orderkey, custkey, partkey, suppkey, doc/vec/user/event id),
  *    so FK integrity holds across tables — copy i's lineitem rows join
  *    copy i's orders/part/supplier exactly as the originals did;
  *  - region/nation are NOT amplified (TPC-H semantics: fixed dims);
  *  - document text is word-mutated per copy (≈⅓ of words get a
  *    copy-suffixed token, chosen by xxhash64(word, position, copy)) so
  *    cross-copy pairs fall far below every near-dup threshold while
  *    WITHIN-copy near-dup pairs keep their relationship (near-identical
  *    originals mutate near-identically) — a plain text copy would turn
  *    each document into a 10-clone LSH cluster and quadratically inflate
  *    bucket verification, which is an artifact, not scale;
  *  - embeddings get hash-derived per-dimension noise (±0.1) for the same
  *    reason;
  *  - everything derives from xxhash64 — re-running the tool reproduces
  *    the fixture bit-for-bit.
  *
  * Usage: runMain graft.tools.GenScale <srcDir> <dstDir> [factor=10]
  */
object GenScale {

  // one stride per key domain. The floor constants are ≥ 100× the
  // sf0.1 key range (keeps single-hop fixtures bit-identical to the
  // round-5..7 ones); [[amplify]] raises each to the next power of ten
  // ABOVE the source's actual max key, because a fixed stride silently
  // COLLIDES ids on a second hop (sf1 vec_ids span 9M, the old 1M
  // stride folded copy i of sf1 onto copy i+1's range — duplicate ids
  // that turn every id equi-join many-to-many; caught round 8 when
  // q166's sf10 pair count exceeded its candidate bound).
  private val OK = 100000000L // orderkey / event_id
  private val CK = 10000000L  // custkey
  private val PK = 10000000L  // partkey
  private val SK = 1000000L   // suppkey
  private val DK = 1000000L   // doc_id
  private val VK = 1000000L   // vec_id
  private val UK = 10000000L  // user_id

  /** Smallest power of ten strictly above `maxKey`. */
  private def niceStride(maxKey: Long): Long = {
    var s = 1L
    while (s <= maxKey) s *= 10
    s
  }

  private def shift(c: String, stride: Long, i: Int): Column =
    col(c) + lit(stride * i)

  /** ≈⅓ of words replaced by a copy-suffixed token; copy 0 untouched. */
  private def mutateText(textCol: Column, i: Int): Column =
    if (i == 0) textCol
    else array_join(
      transform(split(textCol, " "), (w, p) =>
        when(pmod(xxhash64(w, p, lit(i)), lit(3)) === 0,
          concat(w, lit("_" + i))).otherwise(w)),
      " ")

  /** Hash-derived per-dimension noise in (−0.1, 0.1); copy 0 untouched. */
  private def perturbVec(vecCol: Column, idCol: Column, i: Int): Column =
    if (i == 0) vecCol
    else transform(vecCol, (x, j) =>
      (x + (pmod(xxhash64(idCol, j, lit(i)), lit(2000)) - 1000)
        .cast("float") / lit(10000.0f)).cast("float"))

  private def copies(df: DataFrame, factor: Int)(tx: (DataFrame, Int) => DataFrame): DataFrame =
    (0 until factor).map(i => tx(df, i)).reduce(_ unionAll _)

  def amplify(spark: SparkSession, src: String, dst: String, factor: Int): Unit = {
    def read(t: String) = spark.read.parquet(s"$src/$t.parquet")
    def write(df: DataFrame, t: String): Unit =
      df.write.mode("overwrite").parquet(s"$dst/$t.parquet")

    // per-domain strides: floor constant, raised to clear the SOURCE's
    // actual key range (multi-hop safety — see the field comment)
    def domMax(t: String, c: String): Long =
      read(t).agg(max(col(c).cast("long"))).head().getLong(0)
    val okS = math.max(OK, niceStride(
      math.max(domMax("orders", "o_orderkey"), domMax("events", "event_id"))))
    val ckS = math.max(CK, niceStride(domMax("customer", "c_custkey")))
    val pkS = math.max(PK, niceStride(domMax("part", "p_partkey")))
    val skS = math.max(SK, niceStride(domMax("supplier", "s_suppkey")))
    val dkS = math.max(DK, niceStride(domMax("documents", "doc_id")))
    val vkS = math.max(VK, niceStride(domMax("embeddings", "vec_id")))
    val ukS = math.max(UK, niceStride(domMax("events", "user_id")))

    // fixed dims: single copy
    Seq("region", "nation").foreach(t => write(read(t), t))

    write(copies(read("customer"), factor)((d, i) =>
      d.withColumn("c_custkey", shift("c_custkey", ckS, i))), "customer")

    write(copies(read("supplier"), factor)((d, i) =>
      d.withColumn("s_suppkey", shift("s_suppkey", skS, i))), "supplier")

    // p_name/p_type word-mutate per copy for the same reason documents
    // do: the ER family (q178/q182/q186/q192) blocks on (brand, last
    // name word) and prefix-splits on p_name — verbatim copies would
    // stack 10 IDENTICAL names per block per decade, a clone-cluster
    // artifact that routes ~80% of the table into the salt level and
    // measures its bounded-recall scoring, not scale (measured round 8:
    // q182 sf1 13.0 s on verbatim copies vs 5.7 s mutated)
    write(copies(read("part"), factor)((d, i) =>
      d.withColumn("p_partkey", shift("p_partkey", pkS, i))
        .withColumn("p_name", mutateText(col("p_name"), i))
        .withColumn("p_type", mutateText(col("p_type"), i))), "part")

    write(copies(read("orders"), factor)((d, i) =>
      d.withColumn("o_orderkey", shift("o_orderkey", okS, i))
        .withColumn("o_custkey", shift("o_custkey", ckS, i))), "orders")

    write(copies(read("lineitem"), factor)((d, i) =>
      d.withColumn("l_orderkey", shift("l_orderkey", okS, i))
        .withColumn("l_partkey", shift("l_partkey", pkS, i))
        .withColumn("l_suppkey", shift("l_suppkey", skS, i))), "lineitem")

    write(copies(read("events"), factor)((d, i) =>
      d.withColumn("event_id", shift("event_id", okS, i))
        .withColumn("user_id", shift("user_id", ukS, i))), "events")

    write(copies(read("documents"), factor)((d, i) =>
      d.withColumn("doc_id", shift("doc_id", dkS, i))
        .withColumn("text", mutateText(col("text"), i))
        .withColumn("n_chars", length(col("text")).cast("long"))), "documents")

    write(copies(read("embeddings"), factor)((d, i) =>
      d.withColumn("vec_id", shift("vec_id", vkS, i))
        .withColumn("embedding", perturbVec(col("embedding"), col("vec_id"), i))),
      "embeddings")
  }

  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: GenScale <srcDir> <dstDir> [factor=10]")
    val factor = if (args.length > 2) args(2).toInt else 10
    val spark = GraftSession.get("graft-genscale")
    amplify(spark, args(0), args(1), factor)
    // collision guard: every amplified key domain must stay unique — a
    // too-small stride would fold copies onto each other and corrupt
    // every id equi-join downstream (the round-8 finding)
    Seq(("orders", "o_orderkey"), ("customer", "c_custkey"),
      ("part", "p_partkey"), ("supplier", "s_suppkey"),
      ("documents", "doc_id"), ("embeddings", "vec_id"),
      ("events", "event_id")).foreach { case (t, k) =>
      val df = spark.read.parquet(s"${args(1)}/$t.parquet")
      val (n, d) = (df.count(), df.select(k).distinct().count())
      require(n == d, s"$t.$k collided after amplification: $n rows, $d distinct")
    }
    val rows = Seq("lineitem", "orders", "documents", "embeddings", "events")
      .map(t => s"$t=${spark.read.parquet(s"${args(1)}/$t.parquet").count()}")
    println(s"[genscale] wrote factor=$factor fixture at ${args(1)}: ${rows.mkString(", ")}")
    spark.stop()
  }
}
