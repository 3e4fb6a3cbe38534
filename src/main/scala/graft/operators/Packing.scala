package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining — the layout step after cleaning
  * and chunking: documents are concatenated in a deterministic order and
  * the token stream is cut into fixed-length training sequences
  * (concat-and-chunk, the standard pretraining data prep; document
  * boundaries do NOT reset the stream, a document may straddle two
  * sequences).
  *
  * The reference has no packing stage (its lake stops at queryable
  * tables; see scripts/Data_Lake_Construction_Querying_pyspark.py's
  * write path) — this is north-star scope for the 100 TB training
  * pipeline, same family as chunking (q103).
  */
object Packing {

  /** Map each document to the training sequence(s) it lands in.
    *
    * Documents are ordered by `idCol` WITHIN each shard (`shardCol`) and
    * concatenated; sequence `k` of a shard covers the half-open token
    * interval [k·seqLen, (k+1)·seqLen) of that shard's stream. A document
    * spanning a boundary emits one row per sequence it touches, with its
    * token span inside that sequence.
    *
    * Output: (shardCol, seq_idx, idCol, tok_from, tok_to) — `tok_from`
    * inclusive, `tok_to` exclusive, both relative to the sequence start,
    * so sum(tok_to − tok_from) over a closed sequence = seqLen exactly.
    * Empty/whitespace-only/null docs contribute nothing.
    *
    * PRECONDITION: `idCol` must be unique within each shard — it defines
    * the concatenation order, and a duplicate would make "this doc's
    * position in the stream" ill-defined. The cumulative sum uses an
    * explicit ROWS frame (the default RANGE frame would treat duplicate
    * ids as peers and assign both docs the same overlapping span,
    * silently corrupting the layout).
    *
    * Scale: the only shuffle is the per-shard window (cumulative token
    * sum), which partitions by `shardCol` — parallelism equals shard
    * cardinality, so at 100 TB pass a high-cardinality deterministic
    * shard (e.g. `pmod(xxhash64(id), 10_000)`); packing is then
    * embarrassingly parallel across shards and each shard's stream stays
    * independently reproducible. The explode only emits the output rows
    * themselves (a doc touches ⌈n/seqLen⌉+1 sequences at most). No
    * payload text is shuffled — the window carries (shard, id, n) only;
    * callers re-attach text by id downstream if materializing sequences.
    */
  def packConcat(
      df: DataFrame,
      idCol: String,
      textCol: String,
      seqLen: Int,
      shardCol: String): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = Window.partitionBy(shardCol).orderBy(idCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.select(
        col(shardCol), col(idCol),
        TextAnalysis.tokenCount(col(textCol)).cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("__end", sum("__n").over(w))
      .withColumn("__start", col("__end") - col("__n"))
      .withColumn("seq_idx",
        explode(sequence(
          expr(s"__start div $seqLen"), expr(s"(__end - 1) div $seqLen"))))
      .select(
        col(shardCol),
        col("seq_idx").cast("long").as("seq_idx"),
        col(idCol),
        (greatest(col("__start"), col("seq_idx") * seqLen)
          - col("seq_idx") * seqLen).cast("int").as("tok_from"),
        (least(col("__end"), (col("seq_idx") + 1) * seqLen)
          - col("seq_idx") * seqLen).cast("int").as("tok_to"))
  }
}
