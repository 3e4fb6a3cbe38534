package graft

import org.apache.spark.sql.SparkSession

/** Canonical SparkSession factory for the engine's mains and tests.
  *
  * Settings rationale (100 TB stance, tested on local[N]):
  *  - shuffle.partitions defaults to 32 locally (not the reference's 200,
  *    `scripts/...pyspark.py:37`) — on a real cluster this is sized to
  *    ~2-3× total cores / target ~128-256 MB per shuffle partition, and
  *    AQE coalesces small partitions at runtime anyway;
  *  - AQE on (runtime re-plan: broadcast conversion, skew-join splitting,
  *    partition coalescing);
  *  - `nanosAsLong`: the events table stores TIMESTAMP(NANOS), which
  *    Spark's vectorized Parquet reader only surfaces as a nanos BIGINT;
  *  - UTC session timezone so date/timestamp semantics match the DuckDB
  *    oracle (naive timestamps).
  */
object GraftSession {

  def builder(appName: String = "graft"): SparkSession.Builder = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // native expressions on the SQL surface (shingle_hashes, simhash,
      // minhash_signature, text_profile) — the config "query language" is
      // raw SQL, so extension operators must be callable from it
      .config("spark.sql.extensions", "org.apache.spark.sql.graft.GraftExtensions")
      // Reference parity: PySpark 3.3 ran with ANSI mode OFF (its default);
      // Spark 4 flipped the default on. OFF restores the reference's
      // implicit-cast/overflow-wraparound semantics (hash mixing in
      // minhash/fingerprint relies on 64-bit wraparound).
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.maxResultSize", "2g")
  }

  def get(appName: String = "graft"): SparkSession = {
    val spark = builder(appName).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
