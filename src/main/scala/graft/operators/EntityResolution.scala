package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Record linkage over STRUCTURED rows — the classic warehouse dedup
  * (Fellegi–Sunter shape: block, score field-wise, threshold, cluster),
  * complementing the text/embedding near-dup family which keys on
  * content. Reference scope: the reference dedups exact duplicate rows
  * only (`drop_duplicates`, scripts/.../pyspark.py:61); this extends
  * that to fuzzy entity matching under the north-star charter.
  *
  * Scale shape: candidates come from an equi-join on the blocking key —
  * never a cartesian product — under a PAIR budget enforced by
  * prefix-cascade sub-blocking (see [[linkPairs]]); scoring is
  * codegen'd string expressions on
  * the joined pairs, behind a lossless length prefilter; clustering
  * reuses the bounded min-label propagation of
  * [[Dedup.nearDupClusters]]. Every stage is exact and
  * engine-replayable (levenshtein + integer lengths + one rounded
  * division), so the whole path carries a DuckDB oracle.
  */
object EntityResolution {

  /** Normalized edit similarity in [0, 1]: 1 − lev(a,b)/max(len) —
    * 1.0 for identical strings, 0.0 for fully dissimilar. NULL-safe:
    * a null field scores 0 (no evidence), not null (which would
    * poison the weighted sum).
    */
  def levSim(a: Column, b: Column): Column = {
    val sim = lit(1.0) -
      levenshtein(a, b).cast("double") /
        greatest(length(a), length(b), lit(1)).cast("double")
    when(a.isNull || b.isNull, 0.0).otherwise(sim)
  }

  /** Match-candidate pairs with their field-similarity score.
    *
    * `blockCols`: equality blocking key (candidates only form inside a
    * block). `fields`: (column, weight) — the score is
    * Σ wᵢ·levSim(aᵢ, bᵢ) rounded to `roundScale`, and pairs below
    * `threshold` (compared AFTER rounding, the oracle convention) are
    * dropped.
    *
    * `pairBudget` bounds the quadratic term IN PAIRS — the unit the cost
    * is actually paid in (a round-5 row cap of 10 000 still admitted
    * 5·10⁷ pairs from one block; the sf1 audit measured candidate pairs
    * 1.0 M → 101 M at 10× rows under it, the repo's one super-linear
    * headliner). A block whose b(b−1)/2 exceeds the budget is not
    * excluded: it is SUB-BLOCKED on a deterministic secondary key — the
    * 1-, 2-, 4-, then 8-char lowercase prefix of the highest-weight
    * scoring field, the first level whose group fits the budget. True
    * matches score high on that field, so they overwhelmingly share its
    * prefix and survive the split (the spec pins recall parity on a
    * block the old row cap refused wholesale). A group that exceeds the
    * budget even at 8 chars — rows agreeing on block key AND an 8-char
    * head of their best evidence field, i.e. boilerplate — is NOT
    * dropped either: a final md5-salt level splits it into
    * ⌈n/rowCap⌉ buckets with a one-step probe chain (each bucket also
    * receives the previous bucket's rows as probes), so every row still
    * meets ≲ 4·√(2·budget) peers and transitive closure can stitch the
    * buckets back into one entity when the group really is one — bounded
    * recall instead of zero, at the same linear pair bound. Per-row
    * candidate fan-out is bounded by O(√budget) at every level, so
    * total pairs stay LINEAR in corpus size no matter how coarse the
    * blocking vocabulary is.
    *
    * Output: (id_a, id_b, score) with id_a < id_b.
    */
  def linkPairs(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[(String, Double)],
      threshold: Double,
      roundScale: Int = 6,
      pairBudget: Long = 5000L): DataFrame =
    scoredBlockPairs(
      slimProjection(df, idCol, blockCols, fields, isNew = true),
      idCol, fields, threshold, roundScale, pairBudget)

  /** Incremental record linkage, the daily-ingest shape: score only
    * pairs that TOUCH the new batch (batch×batch and batch×store) —
    * store-internal pairs were scored when their rows arrived and are
    * never re-emitted. With |store| ≫ |batch| that removes the dominant
    * quadratic term: a day's ingest costs O(batch·block) comparisons
    * against the slim store projection (id, block key, scoring fields),
    * not a corpus rescore. Same contract as the other incremental twins
    * ([[Dedup.minHashNearDupsIncremental]], pHash, SemDeDup): output ==
    * full-pass [[linkPairs]] over (store ∪ batch), minus the
    * store-internal pairs — spec-pinned, and q182's oracle recomputes
    * exhaustively then side-filters (the q134 discipline).
    *
    * `store` must carry `idCol`, `blockCols`, and every scoring field
    * (it IS the slim projection a deployment persists); ids must be
    * unique across store ∪ batch.
    */
  def linkPairsIncremental(
      batch: DataFrame,
      store: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[(String, Double)],
      threshold: Double,
      roundScale: Int = 6,
      pairBudget: Long = 5000L): DataFrame = {
    val all = slimProjection(batch, idCol, blockCols, fields, isNew = true)
      .unionByName(slimProjection(store, idCol, blockCols, fields, isNew = false))
    scoredBlockPairs(all, idCol, fields, threshold, roundScale, pairBudget)
  }

  private[graft] def slimProjection(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[(String, Double)],
      isNew: Boolean): DataFrame = {
    val key = concat_ws("", blockCols.map(c => col(c).cast("string")): _*)
    df.select(
      (Seq(col(idCol), key.as("__block"), lit(isNew).as("__new")) ++
        fields.map { case (f, _) => col(f) }): _*)
  }

  /** Sub-block assignment under the pair budget. Group sizes are
    * counted once at the FINEST level (one groupBy over the slim
    * projection — (block, p1, p2, p4, p8) with pᵢ the i-char lowercase
    * prefix of the top-weight field), then rolled up to every coarser
    * level with window sums over that already-tiny aggregate; the
    * per-group decision frame joins back on the same five columns.
    * The cascade decision is CONSISTENT across a group by construction
    * (all rows sharing a block+prefix chain see the same counts), so a
    * plain equi-join on the refined key can never pair rows that chose
    * different levels: a row keyed at level 2 has, by definition, a
    * level-1 group that was over budget, which any same-prefix peer
    * shares. Prefixes are null-coalesced to a sentinel so null field
    * values group (and join back) instead of vanishing through
    * null-unsafe equality.
    *
    * Groups still over budget at the 8-char level take a FINAL
    * md5-salt level instead of dropping: the group splits into
    * ⌈c8/rowCap⌉ buckets on pmod(md5(id), s), and every row except the
    * last bucket's also PROBES the next bucket (emitted twice, probe
    * rows flagged `__probe`). Within-bucket pairs are found exactly;
    * adjacent-bucket pairs are found through the probes; the
    * both-probes join filter in [[scoredBlockPairs]] makes each found
    * pair unique. Bucket sizes are ≤ ~2·rowCap (home + probe load), so
    * the per-bucket pair cost stays O(budget) and the chain
    * 0→1→…→s−1 keeps the group CONNECTED: when the group is one true
    * entity (the boilerplate case), min-label closure reassembles it
    * from the found pairs alone — the recall-parity spec pins exactly
    * that. Pairs whose salts differ by ≥ 2 are the bounded loss.
    *
    * Recall note (honest limit): a qualifying pair whose top-field
    * values differ in the first prefix character lands in different
    * sub-blocks once its group is over budget, and a salted pair two
    * buckets apart is only recovered through closure. That loss is
    * confined to over-budget groups (none exist at the oracle scale —
    * verified: sf0.01's largest block is 190 pairs vs a 5 000 budget),
    * is pinned by the recall-parity specs on representative hot
    * blocks, and is the price of a hard linear bound.
    */
  private[graft] def subBlocked(
      slim: DataFrame,
      idCol: String,
      topField: String,
      pairBudget: Long): DataFrame = {
    // largest b with b(b-1)/2 <= budget, computed driver-side to keep
    // the comparison overflow-free at any corpus size
    var rowCap = ((1.0 + math.sqrt(1.0 + 8.0 * pairBudget)) / 2.0).toLong
    while (rowCap > 1 && rowCap * (rowCap - 1) / 2 > pairBudget) rowCap -= 1
    val pfx = (k: Int) =>
      coalesce(lower(substring(col(topField).cast("string"), 1, k)), lit("\u0000"))
    val tagged = slim
      .withColumn("__p1", pfx(1)).withColumn("__p2", pfx(2))
      .withColumn("__p4", pfx(4)).withColumn("__p8", pfx(8))
    val levels = Seq("__p1", "__p2", "__p4", "__p8")
    val fine = tagged.groupBy(col("__block") +: levels.map(col): _*)
      .agg(count(lit(1)).as("__c8"))
    val w = (cols: Seq[String]) =>
      org.apache.spark.sql.expressions.Window.partitionBy(
        ("__block" +: cols).map(col): _*)
    val dec = fine
      .withColumn("__c4", sum("__c8").over(w(levels.take(3))))
      .withColumn("__c2", sum("__c8").over(w(levels.take(2))))
      .withColumn("__c1", sum("__c8").over(w(levels.take(1))))
      .withColumn("__c0", sum("__c8").over(w(Nil)))
      .withColumn("__sub",
        when(col("__c0") <= rowCap, lit(""))
          .when(col("__c1") <= rowCap, concat(lit("1:"), col("__p1")))
          .when(col("__c2") <= rowCap, concat(lit("2:"), col("__p2")))
          .when(col("__c4") <= rowCap, concat(lit("4:"), col("__p4")))
          .when(col("__c8") <= rowCap, concat(lit("8:"), col("__p8")))
          .otherwise(lit(null)))
      .select(("__block" +: levels).map(col) ++ Seq(col("__sub"), col("__c8")): _*)
    // ONE pass assigns every row its refined block (prefix level or
    // salt bucket) via a conditional explode -- a plain/salted union
    // would evaluate the tagged-join subtree twice
    val nb = ceil(col("__c8").cast("double") / lit(rowCap.toDouble)).cast("long")
    val home = pmod(
      conv(substring(md5(col(idCol).cast("string")), 1, 8), 16, 10).cast("long"), nb)
    val variants = when(col("__sub").isNotNull,
        array(struct(col("__sub").as("s"), lit(false).as("p"))))
      .when(home + 1 < nb,
        array(
          struct(concat(lit("s:"), home).as("s"), lit(false).as("p")),
          struct(concat(lit("s:"), home + 1).as("s"), lit(true).as("p"))))
      .otherwise(array(struct(concat(lit("s:"), home).as("s"), lit(false).as("p"))))
    tagged.join(dec, "__block" +: levels)
      .withColumn("__v", explode(variants))
      .withColumn("__block", concat_ws("\u0001", col("__block"), col("__v.s")))
      .withColumn("__probe", col("__v.p"))
      .drop("__v" :: "__sub" :: "__c8" :: levels.toList: _*)
  }

  /** Shared candidate + scoring stage over the slim projection
    * (idCol, __block, __new, fields): pairs form inside sub-blocked
    * blocks — the budget sees the COMBINED block in the incremental
    * case, so a historically hot block stays split the same way for
    * new arrivals instead of charging every ingest an unsplit join.
    *
    * The probe side carries ONLY `__new` rows, so store-internal pairs
    * are never MATERIALIZED by the join (filtering them after a full
    * self-join still pays the dominant quadratic term — measured: the
    * post-join-filter formulation ran SLOWER than the full pass at sf1,
    * 73.7 s vs 45.4 s; this shape is 36M joined rows instead of 100M).
    * New×new pairs arrive twice (each side probes) and are kept once
    * via id order; new×old pairs arrive once and get their ids
    * normalized afterwards — the score is symmetric, so swapping ids
    * alone is sound. Pairs pass the lossless length prefilter and are
    * emitted when the ROUNDED score clears the threshold.
    *
    * Both the join and the scoring run at the DISTINCT-attribute-vector
    * level, expanded back to row pairs afterwards — see the inline
    * note; measured at the sf10 rehearsal this cut candidate DPs ~33×
    * (503M row-level candidates, ~15M value-level) on a fixture whose
    * amplified copies repeat values heavily, which is also the shape of
    * real name/address linkage corpora.
    */
  private def scoredBlockPairs(
      slim: DataFrame,
      idCol: String,
      fields: Seq[(String, Double)],
      threshold: Double,
      roundScale: Int,
      pairBudget: Long): DataFrame =
    expandRowPairs(tupleStage(slim, idCol, fields, threshold, roundScale, pairBudget)._2)

  /** Tuple-level candidate + scoring stage shared by the row-pair
    * expansion ([[expandRowPairs]] → [[linkPairs]]) and the compact
    * closure edges in [[resolve]]. Returns (tuple frame, passing tuple
    * pairs): the tuple frame is one row per refined block + DISTINCT
    * value tuple with its member list; the pair frame carries the
    * member lists of both sides plus the rounded score.
    *
    * The tuple frame is aggregated ONCE and lazily local-checkpointed
    * (the [[Dedup.nearDupClusters]] discipline): both join sides and
    * the star-edge consumer in [[resolve]] read the checkpointed
    * blocks, so the sub-block assignment (count cascade + window
    * rollups + salt explode) executes once instead of once per
    * consumer (measured at sf1: the subBlocked subtree is ~60% of
    * linkage time). The a-side is the b-side's member list filtered to
    * `__new` rows — not a second groupBy over the `__new`-filtered
    * input, which would re-shuffle the full projection. Checkpoint
    * size is O(distinct tuples + membership ids) — strictly smaller
    * than the slim input, so the truncation is safe at any corpus
    * size.
    */
  private def tupleStage(
      slim: DataFrame,
      idCol: String,
      fields: Seq[(String, Double)],
      threshold: Double,
      roundScale: Int,
      pairBudget: Long): (DataFrame, DataFrame) = {
    require(fields.nonEmpty, "at least one scoring field")
    require(pairBudget >= 1, "pairBudget must admit at least one pair")
    val guarded = subBlocked(slim, idCol, fields.maxBy(_._2)._1, pairBudget)
    // Attribute-vector collapse: the score depends only on the field
    // VALUES, and real linkage corpora repeat them heavily (the sf10
    // rehearsal fixture: 2M rows, 349k distinct (block, values) tuples
    // — a 5.7× per-block collapse, squaring to ~33× fewer DPs). So the
    // candidate join and the levenshtein scoring run over DISTINCT
    // value tuples per refined block; row ids ride along as grouped
    // member lists (bounded by the sub-block row cap ≈ 2·√(2·budget),
    // so no list exceeds a few hundred entries) and two explodes
    // expand passing value pairs back to exactly the row pairs the
    // row-level join would have produced — the row-level filters apply
    // unchanged after expansion.
    val vcols = fields.map { case (f, _) => col(f) }
    val tuples = guarded
      .groupBy(col("__block") +: vcols: _*)
      .agg(collect_list(struct(col(idCol).as("id"), col("__new").as("n"),
        col("__probe").as("p"))).as("__mb"))
      .localCheckpoint(eager = false)
    val newMembers = transform(
      filter(col("__mb"), m => m.getField("n")),
      m => struct(m.getField("id").as("id"), m.getField("p").as("p")))
    val ga = tuples
      .select((col("__block") +: newMembers.as("__ma") +:
        fields.map { case (f, _) => col(f).as(s"__a_$f") }): _*)
      .filter(size(col("__ma")) > 0)
    val gb = tuples
      .select((col("__block") +: col("__mb") +:
        fields.map { case (f, _) => col(f).as(s"__b_$f") }): _*)
    // Banded Levenshtein (lossless): a pair whose ROUNDED score clears
    // the threshold needs simᵢ ≥ (t′ − (1−wᵢ))/wᵢ on every field (the
    // other fields contribute at most their full weight), i.e.
    // levᵢ ≤ maxlenᵢ·(1−t′)/wᵢ with t′ = threshold − round-slack. When
    // that cap is real (t′ > 1−wᵢ), the per-pair capped DP computes the
    // EXACT distance when within it and −1 when provably over — the −1
    // poisons the weighted sum to NULL, which the score gate drops, so
    // surviving pairs score bit-identically to the full DP. This is the
    // dominant cost at amplification scale: the sf10 fixture puts ~70%
    // of rows in salted boilerplate buckets where every candidate pays
    // the DP, and the band caps it at ~25% of the table (w=0.6, t=0.85)
    // with early exit on dissimilar rows.
    val tEff = threshold - 0.5 * math.pow(10, -roundScale) - 1e-9
    // The band derives from "other fields contribute at most their full
    // weight" — that total is Σwᵢ, NOT 1.0 (linkPairs never requires
    // normalized weights). With W = Σwᵢ: need simᵢ ≥ (t′ − (W − wᵢ))/wᵢ,
    // i.e. levᵢ ≤ maxlenᵢ·(W − t′)/wᵢ, and the cap is only real when
    // t′ > W − wᵢ. Hard-coding W = 1 under-caps when Σwᵢ > 1 and
    // silently drops true matches.
    val wTotal = fields.map(_._2).sum
    val fieldSim: ((String, Double)) => Column = { case (f, w) =>
      val (la, lb) = (col(s"__a_$f"), col(s"__b_$f"))
      if (tEff > wTotal - w) {
        val maxlen = greatest(length(la), length(lb), lit(1))
        val cap = (maxlen.cast("double") * lit((wTotal - tEff) / w)).cast("int") + lit(1)
        val lev = org.apache.spark.sql.graft.NativeExprs.levWithin(la, lb, cap)
        when(la.isNull || lb.isNull, lit(0.0))
          .when(lev === -1, lit(null).cast("double"))
          .otherwise(lit(1.0) - lev.cast("double") / maxlen.cast("double"))
      } else levSim(la, lb)
    }
    val score = round(
      fields.map { case fw @ (_, w) => lit(w) * fieldSim(fw) }.reduce(_ + _),
      roundScale)
    // Length prefilter (lossless): lev(a,b) ≥ |len(a)−len(b)|, so
    // Σ wᵢ·(1 − |lenΔᵢ|/maxLenᵢ) upper-bounds the score — pairs whose
    // bound can't reach the threshold skip the levenshtein DP entirely.
    // Slack covers the final round-then-compare promote window plus
    // float error; the bound only PRUNES, the real score decides.
    val ubound = fields.map { case (f, w) =>
      val (la, lb) = (col(s"__a_$f"), col(s"__b_$f"))
      val ub = lit(1.0) -
        abs(length(la) - length(lb)).cast("double") /
          greatest(length(la), length(lb), lit(1)).cast("double")
      lit(w) * when(la.isNull || lb.isNull, 0.0).otherwise(ub)
    }.reduce(_ + _)
    val tuplePairs = ga.join(gb, Seq("__block"))
      .filter(ubound >= threshold - 0.5 * math.pow(10, -roundScale) - 1e-9)
      .withColumn("score", score)
      .filter(col("score") >= threshold)
      .select(col("__block"), col("score"), col("__ma"), col("__mb"))
    (tuples, tuplePairs)
  }

  /** Row-pair expansion of [[tupleStage]]'s passing tuple pairs —
    * exactly the pairs the row-level join would have produced, with the
    * row-level dedup filters applied after expansion.
    */
  private def expandRowPairs(tuplePairs: DataFrame): DataFrame = {
    tuplePairs
      // expansion: every (new row with value a) × (row with value b)
      // inside the block — identical to the row-level join's output
      .select(col("score"), explode(col("__ma")).as("__a"), col("__mb"))
      .select(col("score"), col("__a"), explode(col("__mb")).as("__b"))
      .select(
        col("__a.id").as("id_a"), col("__a.p").as("__probe_a"),
        col("__b.id").as("id_b"), col("__b.n").as("__new_b"),
        col("__b.p").as("__probe_b"), col("score"))
      // ordered once for new×new; new×old pairs survive per bucket
      .filter(!col("__new_b") || col("id_a") < col("id_b"))
      .filter(col("id_a") =!= col("id_b"))
      // salt-level uniqueness: a same-home pair meets again in the next
      // bucket with BOTH rows as probes — keep only the meeting where at
      // least one side is home (exactly one bucket per found pair)
      .filter(!(col("__probe_a") && col("__probe_b")))
      .select(
        least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"),
        col("score"))
  }

  /** End-to-end resolution: link pairs, close them transitively
    * (min-label propagation — bounded iterations, lineage-truncated),
    * and return every input row annotated with its `entity_id` (the
    * smallest member id of its match cluster; singletons keep their own
    * id). The survivor policy is the caller's — [[Dedup.nearDupSurvivors]]
    * composes directly.
    *
    * Closure runs on COMPACT edges, not expanded row pairs: for each
    * passing tuple pair one representative edge (min member id to min
    * member id), plus one star edge per member of every PARTICIPATING
    * tuple group (its min id to each member). Components — and
    * therefore min-id entity labels — are identical to closing over the
    * expanded pairs: a passing pair (A, B) connects every a∈A to every
    * b∈B at row level, which is exactly {stars of A} ∪ {stars of B} ∪
    * {minA–minB}; a group whose rows never appear in a passing pair
    * (e.g. identical tuples whose null fields keep the self-score
    * under threshold) contributes no edges on either path; and salted
    * over-budget groups connect adjacent buckets through their shared
    * probe members exactly as the row-level meetings do (equivalence
    * spec-pinned, including both degenerate cases). At the sf10
    * rehearsal this is ~7M closure edges instead of 48M expanded pairs
    * — the expansion explode never materializes — and the closure was
    * the dominant cost of the golden-record composites. The compact
    * topology is GATED on estimated pair volume
    * (`compactClosureMinPairs`): below it the star construction's
    * fixed join overhead dominates its savings, so closure takes the
    * plain expanded row pairs — both paths are spec-pinned identical
    * on the same fixtures.
    *
    * The compact path leans on [[resolve]]'s all-rows-new invariant:
    * the a-side member list (new rows only) must equal the full
    * membership so its min is the group min. [[linkPairs]] callers that
    * need the pair list itself still get the exact row-level expansion.
    */
  def resolve(
      df: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[(String, Double)],
      threshold: Double,
      roundScale: Int = 6,
      pairBudget: Long = 5000L,
      compactClosureMinPairs: Long = 1000000L): DataFrame = {
    val slim = slimProjection(df, idCol, blockCols, fields, isNew = true)
    // Path gate: the compact tuple-edge closure wins when expansion
    // volume is large (sf10: 48M expanded pairs → ~7M edges, q186
    // 126→72 s) but its star topology costs a fixed ~1.5–2 s of extra
    // joins/checkpointing at small scale (the measured r8 sf0.1
    // regression). Estimate row-pair volume as Σ n·(n−1)/2 over RAW
    // blocks — a |blocks|-bounded planning aggregate, and an UPPER
    // bound (sub-blocking only shrinks groups, so inflation errs
    // toward the scale-safe compact path) — and take the plain
    // expanded-pair closure under the threshold. Pass 0 to force the
    // compact path (the equivalence spec does), Long.MaxValue to force
    // row expansion.
    val useCompact = compactClosureMinPairs <= 0L || {
      val est = slim.groupBy("__block").agg(count(lit(1)).as("__n"))
        .agg(sum(col("__n") * (col("__n") - lit(1L))).as("__p"))
        .head()
      (if (est.isNullAt(0)) 0L else est.getLong(0)) / 2 >= compactClosureMinPairs
    }
    val edges = if (!useCompact) {
      scoredBlockPairs(slim, idCol, fields, threshold, roundScale, pairBudget)
        .select(col("id_a"), col("id_b"))
    } else {
      val (tuples, rawTuplePairs) =
        tupleStage(slim, idCol, fields, threshold, roundScale, pairBudget)
      // the scoring join feeds three consumers (rep edges, participation
      // keys ×2) — checkpoint it so the banded DP runs once
      val tuplePairs = rawTuplePairs.localCheckpoint(eager = false)
      val minOf = (members: Column) =>
        array_min(transform(members, m => m.getField("id")))
      val rep = tuplePairs.select(
        minOf(col("__ma")).as("id_a"), minOf(col("__mb")).as("id_b"))
      // participating groups, keyed by (refined block, group min id) —
      // slim keys only; member lists rejoin from the (reused) tuple frame
      val parts = tuplePairs.select(col("__block"), minOf(col("__ma")).as("__gmin"))
        .union(tuplePairs.select(col("__block"), minOf(col("__mb")).as("__gmin")))
        .distinct()
      val stars = tuples
        .withColumn("__gmin", minOf(col("__mb")))
        .join(parts, Seq("__block", "__gmin"), "left_semi")
        .select(col("__gmin").as("id_a"),
          explode(transform(col("__mb"), m => m.getField("id"))).as("id_b"))
      rep.unionByName(stars).filter(col("id_a") =!= col("id_b"))
    }
    // min-label propagation is the measured fast path (near-dup
    // components are shallow); a salted boilerplate block whose bucket
    // CHAIN outruns the iteration budget falls back to alternating
    // star contraction — logarithmic rounds, any diameter — instead of
    // failing the job (fallback correctness spec-pinned on a chain
    // deeper than the label budget)
    val clusters = try Dedup.nearDupClusters(edges) catch {
      case _: IllegalStateException =>
        Dedup.connectedComponentsAlternating(edges)
    } // (id, cluster)
    df.join(clusters.withColumnRenamed("id", idCol), Seq(idCol), "left")
      .withColumn("entity_id", coalesce(col("cluster"), col(idCol)))
      .drop("cluster")
  }

  /** Golden-record construction — the last step of ER: collapse each
    * entity cluster from [[resolve]] into ONE survivor row by per-field
    * survivorship policy. Three policies, all with DETERMINISTIC ties so
    * the output is engine-replayable:
    *
    *  - `modeFields`: most frequent non-null value; count ties break to
    *    the smallest value BY STRING IMAGE (the stacked frame carries
    *    every field as a string — an oracle replaying a numeric field
    *    must tie-break on `CAST(v AS VARCHAR)`).
    *  - `longestFields`: longest non-null value; length ties break to
    *    the smallest value (same string-image caveat).
    *  - `newestFields` (field, orderCol): the value on the row with the
    *    greatest `orderCol` (a timestamp / version / ingest key); order
    *    ties break to the greatest value. Faithful to recency: if the
    *    newest row's field is null, the survivor is null.
    *
    * Scale shape: mode and longest share ONE stacked pass — explode the
    * fields to an (entity, field, value) frame, aggregate counts (the
    * only value-width shuffle, map-side combined), pick winners with
    * per-policy windows over the (entity, field) grain, and pivot back
    * with a single entity-grain groupBy. Newest fields are one more
    * entity-grain groupBy (`max(struct(order, value))`), shared across
    * all of them. No per-entity collects; every join is entity-width.
    * Values travel as strings through the stacked frame and are cast
    * back to their original types on the way out.
    */
  def goldenRecord(
      resolved: DataFrame,
      entityCol: String,
      modeFields: Seq[String] = Nil,
      longestFields: Seq[String] = Nil,
      newestFields: Seq[(String, String)] = Nil): DataFrame = {
    require(
      modeFields.nonEmpty || longestFields.nonEmpty || newestFields.nonEmpty,
      "goldenRecord needs at least one survivorship field")
    require(
      (modeFields ++ longestFields ++ newestFields.map(_._1)).distinct.size ==
        modeFields.size + longestFields.size + newestFields.size,
      "a field may appear under exactly one survivorship policy")
    val schema = resolved.schema
    val stackFields = modeFields ++ longestFields

    // membership and newest-by-order share the per-entity grain — ONE
    // aggregation pass over resolved covers both (one fewer shuffle and
    // one fewer join than aggregating them separately)
    val newestAggs = newestFields.map { case (f, ord) =>
      max(struct(col(ord).as("o"), col(f).as("v"))).getField("v").as(f)
    }
    val base = resolved.groupBy(col(entityCol).as("__ent"))
      .agg(count(lit(1)).as("n_members"), newestAggs: _*)

    val picked: Option[DataFrame] = if (stackFields.isEmpty) None else {
      val stacked = resolved
        .select(
          col(entityCol).as("__ent"),
          explode(array(stackFields.map(f =>
            struct(lit(f).as("f"), col(f).cast("string").as("v"))): _*)).as("__fv"))
        .select(col("__ent"), col("__fv.f").as("__field"), col("__fv.v").as("__value"))
        .filter(col("__value").isNotNull)
      val counted = stacked
        .groupBy("__ent", "__field", "__value").agg(count(lit(1)).as("__cnt"))
      // Winner pick + pivot in ONE entity-grain aggregate: the policy
      // orderings encode as struct minima — min(struct(-cnt, value)) is
      // "largest count, then smallest value" and min(struct(-len, value))
      // "longest, then smallest value" — exactly the former windows'
      // (desc, asc) orderings (struct comparison is field-lexicographic,
      // string order identical to the windows' column order). This
      // replaces two (entity, field)-keyed window sorts + a union + the
      // pivot groupBy with a single groupBy(entity): two fewer exchanges
      // and no sorts on the survivorship path (r11 ER trim, SCALE.md).
      val pickAggs =
        modeFields.map(f =>
          min(when(col("__field") === f,
            struct((-col("__cnt")).as("k"), col("__value").as("v"))))
            .getField("v").cast(schema(f).dataType).as(f)) ++
        longestFields.map(f =>
          min(when(col("__field") === f,
            struct((-length(col("__value")).cast("long")).as("k"),
              col("__value").as("v"))))
            .getField("v").cast(schema(f).dataType).as(f))
      Some(counted.groupBy("__ent").agg(pickAggs.head, pickAggs.tail: _*))
    }

    val joined = picked
      .foldLeft(base)((acc, d) => acc.join(d, Seq("__ent"), "left"))
    val outCols = col("__ent").as(entityCol) +: col("n_members") +:
      (stackFields ++ newestFields.map(_._1)).map(col)
    joined.select(outCols: _*)
  }

  // ---------------------------------------------------- incremental GR

  /** Survivorship STATE for incremental golden records — the IVM
    * pattern applied to [[goldenRecord]]: instead of winners, persist
    * the MERGEABLE sufficient statistics each policy needs, so a new
    * batch advances the store without re-reading history:
    *
    *  - mode/longest: the (entity, field, value) COUNT table (counts
    *    add across batches; longest only needs value presence, which
    *    the same rows carry);
    *  - newest: the per-(entity, field) running max of (order, value)
    *    (maxes combine associatively; order column must be numeric —
    *    it travels as a double; order TIES break on the value's STRING
    *    image here, vs the typed value in [[goldenRecord]] — identical
    *    whenever the order key is unique per entity, the normal case
    *    for a version/ingest key);
    *  - membership: the per-entity row count.
    *
    * One unified frame `(__ent, __kind, __field, __value, __cnt,
    * __ord)` — parquet-persistable, engine-replayable. Entity
    * ASSIGNMENT is the caller's (linkage stays batch): this maintains
    * survivorship state under appends, the common daily-ingest case
    * where new rows join existing entities.
    */
  def goldenRecordState(
      resolved: DataFrame,
      entityCol: String,
      modeFields: Seq[String] = Nil,
      longestFields: Seq[String] = Nil,
      newestFields: Seq[(String, String)] = Nil): DataFrame = {
    val stackFields = modeFields ++ longestFields
    val counts =
      if (stackFields.isEmpty) None
      else Some(resolved
        .select(
          col(entityCol).as("__ent"),
          explode(array(stackFields.map(f =>
            struct(lit(f).as("f"), col(f).cast("string").as("v"))): _*)).as("__fv"))
        .select(col("__ent"), col("__fv.f").as("__field"), col("__fv.v").as("__value"))
        .filter(col("__value").isNotNull)
        .groupBy("__ent", "__field", "__value")
        .agg(count(lit(1)).as("__cnt"))
        .select(col("__ent"), lit("count").as("__kind"), col("__field"),
          col("__value"), col("__cnt"), lit(null).cast("double").as("__ord")))
    val newest =
      if (newestFields.isEmpty) None
      else Some(newestFields.map { case (f, ord) =>
        resolved.groupBy(col(entityCol).as("__ent"))
          .agg(max(struct(col(ord).cast("double").as("o"),
            col(f).cast("string").as("v"))).as("__m"))
          .select(col("__ent"), lit("newest").as("__kind"), lit(f).as("__field"),
            col("__m.v").as("__value"), lit(1L).as("__cnt"),
            col("__m.o").as("__ord"))
      }.reduce(_ unionByName _))
    val members = resolved.groupBy(col(entityCol).as("__ent"))
      .agg(count(lit(1)).as("__cnt"))
      .select(col("__ent"), lit("members").as("__kind"), lit("").as("__field"),
        lit("").as("__value"), col("__cnt"), lit(null).cast("double").as("__ord"))
    (Seq(counts, newest).flatten :+ members).reduce(_ unionByName _)
  }

  /** Combine two survivorship states (associative, commutative):
    * counts and memberships add, newest maxes combine.
    */
  def goldenRecordMerge(a: DataFrame, b: DataFrame): DataFrame =
    normalizeState(a.unionByName(b))

  /** Re-aggregate a state frame whose keys may repeat (after a union,
    * or after an entity-merge re-key): counts/memberships add, newest
    * maxes combine. Idempotent on already-normal state.
    */
  private def normalizeState(u: DataFrame): DataFrame = {
    val added = u.filter(col("__kind") =!= "newest")
      .groupBy("__ent", "__kind", "__field", "__value")
      .agg(sum(col("__cnt")).as("__cnt"))
      .withColumn("__ord", lit(null).cast("double"))
    val maxed = u.filter(col("__kind") === "newest")
      .groupBy("__ent", "__kind", "__field")
      .agg(max(struct(col("__ord"), col("__value"))).as("__m"))
      .select(col("__ent"), col("__kind"), col("__field"),
        col("__m.__value").as("__value"), lit(1L).as("__cnt"),
        col("__m.__ord").as("__ord"))
    added.select("__ent", "__kind", "__field", "__value", "__cnt", "__ord")
      .unionByName(maxed)
  }

  /** One daily-ingest step of the COMPOSED incremental pipeline —
    * incremental linkage AND incremental survivorship, including the
    * case the two-halves composition must get right: a batch row that
    * BRIDGES two existing entities merges them (and their golden
    * records) transitively.
    *
    *  1. [[linkPairsIncremental]] scores batch↔store and batch↔batch
    *     pairs only — store-internal pairs never re-materialize;
    *  2. pair endpoints map to their CURRENT entity ids (batch rows
    *     start as their own singleton entity), and the resulting
    *     ENTITY-level graph — orders of magnitude smaller than the row
    *     graph — closes transitively via [[Dedup.nearDupClusters]];
    *  3. the store's state plus the batch's fresh state re-key to the
    *     canonical entities and re-aggregate — exactly why the state
    *     is MERGEABLE: merging two entities' golden records is a
    *     re-key + the same normalize pass, no history re-read.
    *
    * Returns (newState, remap) where `remap(__ent, __canon)` lists
    * every entity id whose canonical changed — the caller re-keys its
    * row store with it and re-picks winners via
    * [[goldenRecordFromState]] for the union of remapped and
    * batch-touched entities.
    */
  def goldenRecordAdvance(
      store: DataFrame,
      state: DataFrame,
      batch: DataFrame,
      idCol: String,
      blockCols: Seq[String],
      fields: Seq[(String, Double)],
      threshold: Double,
      modeFields: Seq[String] = Nil,
      longestFields: Seq[String] = Nil,
      newestFields: Seq[(String, String)] = Nil,
      roundScale: Int = 6,
      pairBudget: Long = 5000L): (DataFrame, DataFrame) = {
    val pairs = linkPairsIncremental(
      batch, store.drop("entity_id"), idCol, blockCols, fields,
      threshold, roundScale, pairBudget)
    val idToEnt = store.select(col(idCol).as("__id"), col("entity_id").as("__e"))
      .unionByName(batch.select(col(idCol).as("__id"), col(idCol).as("__e")))
    val entPairs = Dedup.entityPairGraph(pairs, idToEnt)
    val remap = Dedup.nearDupClusters(entPairs)
      .select(col("id").as("__ent"), col("cluster").as("__canon"))
      .filter(col("__ent") =!= col("__canon"))
    val batchState = goldenRecordState(
      batch.withColumn("entity_id", col(idCol)), "entity_id",
      modeFields, longestFields, newestFields)
    val rekeyed = state.unionByName(batchState)
      .join(remap, Seq("__ent"), "left")
      .withColumn("__ent", coalesce(col("__canon"), col("__ent")))
      .drop("__canon")
    (normalizeState(rekeyed), remap)
  }

  /** Golden records from a (possibly merged) survivorship state — the
    * same winners, tie rules, and output shape as [[goldenRecord]];
    * `template` supplies the original column types for the cast back
    * from the state's string values.
    */
  def goldenRecordFromState(
      state: DataFrame,
      template: DataFrame,
      entityCol: String,
      modeFields: Seq[String] = Nil,
      longestFields: Seq[String] = Nil,
      newestFields: Seq[(String, String)] = Nil): DataFrame = {
    val schema = template.schema
    val stackFields = modeFields ++ longestFields
    // membership and the newest pivot share the per-entity grain — one
    // aggregation over the (members ∪ newest) state rows covers both
    // (state is normalized: one members row and one newest row per
    // (entity, field), so max-of-when is exact selection)
    val newestAggs = newestFields.map { case (f, _) =>
      max(when(col("__kind") === "newest" && col("__field") === f, col("__value")))
        .cast(schema(f).dataType).as(f)
    }
    val base = state.filter(col("__kind").isin("members", "newest"))
      .groupBy("__ent")
      .agg(max(when(col("__kind") === "members", col("__cnt"))).as("n_members"),
        newestAggs: _*)
    val picked =
      if (stackFields.isEmpty) None
      else {
        val counted = state.filter(col("__kind") === "count")
        // winner pick + pivot as ONE entity-grain aggregate — the
        // struct-minimum encoding of the policy orderings, exactly as in
        // [[goldenRecord]] (measured there: 5.36 -> 4.14 s at sf0.1,
        // identical anchor — two window sorts and the pivot exchange
        // collapse into a single groupBy)
        val pickAggs =
          modeFields.map(f =>
            min(when(col("__field") === f,
              struct((-col("__cnt")).as("k"), col("__value").as("v"))))
              .getField("v").cast(schema(f).dataType).as(f)) ++
          longestFields.map(f =>
            min(when(col("__field") === f,
              struct((-length(col("__value")).cast("long")).as("k"),
                col("__value").as("v"))))
              .getField("v").cast(schema(f).dataType).as(f))
        Some(counted.groupBy("__ent").agg(pickAggs.head, pickAggs.tail: _*))
      }
    val joined = picked
      .foldLeft(base)((acc, d) => acc.join(d, Seq("__ent"), "left"))
    val outCols = col("__ent").as(entityCol) +: col("n_members") +:
      (stackFields ++ newestFields.map(_._1)).map(col)
    joined.select(outCols: _*)
  }
}
