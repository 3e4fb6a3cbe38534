package graft.queries

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Deterministic differential SQL fuzzer — the systematic defense against
  * the cast/widening/ordering divergence class that hand-written queries
  * catch one at a time.
  *
  * A seeded generator produces 344 query cases over `orders`/`lineitem`/`documents`
  * spanning (projection, predicate, group-by, having, order+limit,
  * inner/left joins, window functions, rollup/cube/grouping-sets,
  * date/interval arithmetic, NULL semantics, string functions over
  * prose, decimal arithmetic + correlated scalar subqueries, LATERAL
  * derived tables, FILTER-clause aggregates, explicit ROWS/RANGE
  * window frames). Each case is rendered
  * TWICE from one AST:
  *
  *  1. a SQL string in a deliberately dialect-neutral subset (runs
  *     unchanged on Spark and DuckDB — comparison atoms, IN/LIKE/BETWEEN,
  *     AND/OR, modulo, DATE literals, positional GROUP BY, HAVING,
  *     ORDER BY + LIMIT with a unique-key tiebreak);
  *  2. an independent DataFrame-API program built from
  *     `org.apache.spark.sql.functions` Column constructors — it never
  *     touches the SQL parser, so SQL-vs-DSL disagreement localizes a
  *     fault to one of the two front ends.
  *
  * Every case collapses to ONE summary row with a fixed cross-engine-safe
  * schema `(fq STRING, n_rows BIGINT, agg DOUBLE, aux BIGINT)`:
  * `agg` flows through an exact DECIMAL sum then a final DOUBLE cast
  * (order-independent, bit-identical in both engines — the house rule
  * from SURVEY.md §5), `aux` is an exact integer aggregate. The 344
  * summaries are UNION ALL'd into fifteen declared bundles (by family)
  * whose DuckDB oracle is the SAME generated SQL — so the driver's
  * correctness gate hash-compares all 300 against DuckDB, while
  * FuzzSpec cross-checks SQL-vs-DSL inside `sbt test`.
  *
  * Everything derives from a fixed seed: the generated set is identical
  * across runs, so a failure is reproducible by case id.
  */
object FuzzQueries {

  val seed = 20260812L
  val nScan = 40
  val nGroup = 40
  val nTop = 20
  val nJoin = 20
  val nWin = 20
  val nScalar = 20
  val nSetop = 20
  val nRollup = 20
  val nDate = 20
  val nNull = 20
  val nStr = 20
  val nDecCorr = 20
  val nLateral = 20
  val nFilter = 20
  val nFrame = 20
  val nSurface = 40

  /** One generated case: dialect-neutral SQL producing a single summary
    * row, plus an independent DataFrame-API program with identical
    * semantics (input: the pre-loaded tables by name).
    */
  final case class FuzzCase(
      id: String,
      table: String,
      sql: String,
      dsl: Map[String, DataFrame] => DataFrame)

  /** SQL fragment + independent Column constructor kept in lockstep. */
  private final case class Frag(sql: String, mk: () => Column)

  private def dateLit(rng: scala.util.Random): (String, java.sql.Date) = {
    val y = 1995 + rng.nextInt(7)
    val m = 1 + rng.nextInt(12)
    val d = 1 + rng.nextInt(28)
    (f"$y%04d-$m%02d-$d%02d", java.sql.Date.valueOf(f"$y%04d-$m%02d-$d%02d"))
  }

  // ------------------------------------------------------ predicate atoms

  private def numAtom(c: String, lo: Int, hi: Int, rng: scala.util.Random): Frag = {
    val v = lo + rng.nextInt(hi - lo)
    rng.nextInt(3) match {
      case 0 => Frag(s"$c < $v", () => col(c) < v)
      case 1 => Frag(s"$c >= $v", () => col(c) >= v)
      case _ =>
        val w = v + 1 + rng.nextInt(hi - lo)
        Frag(s"$c BETWEEN $v AND $w", () => col(c) >= v && col(c) <= w)
    }
  }

  private def strAtom(c: String, values: Seq[String], rng: scala.util.Random): Frag =
    if (rng.nextBoolean() || values.size < 3) {
      val v = values(rng.nextInt(values.size))
      Frag(s"$c = '$v'", () => col(c) === v)
    } else {
      val picked = rng.shuffle(values).take(2).sorted
      Frag(s"$c IN (${picked.map(v => s"'$v'").mkString(", ")})",
        () => col(c).isin(picked: _*))
    }

  private def likeAtom(c: String, patterns: Seq[String], rng: scala.util.Random): Frag = {
    val p = patterns(rng.nextInt(patterns.size))
    Frag(s"$c LIKE '$p'", () => col(c).like(p))
  }

  private def dateAtom(c: String, rng: scala.util.Random): Frag = {
    val (s, d) = dateLit(rng)
    if (rng.nextBoolean())
      Frag(s"CAST($c AS DATE) < DATE '$s'", () => col(c).cast("date") < lit(d))
    else
      Frag(s"CAST($c AS DATE) >= DATE '$s'", () => col(c).cast("date") >= lit(d))
  }

  private def modAtom(c: String, rng: scala.util.Random): Frag = {
    val m = 2 + rng.nextInt(9)
    val r = rng.nextInt(m)
    Frag(s"$c % $m = $r", () => col(c) % m === r)
  }

  private def discountAtom(rng: scala.util.Random): Frag = {
    val cents = rng.nextInt(10) // 0.00 .. 0.09 in 2dp steps
    val d = cents / 100.0
    // render the literal locale-independently: f"%.2f" would emit a
    // decimal COMMA (invalid SQL) on comma-decimal default locales
    Frag(s"l_discount >= 0.0$cents", () => col("l_discount") >= d)
  }

  private def atom(table: String, rng: scala.util.Random): Frag = table match {
    case "orders" =>
      rng.nextInt(6) match {
        case 0 => numAtom("o_totalprice", 5000, 450000, rng)
        case 1 => strAtom("o_orderstatus", Seq("O", "F", "P"), rng)
        case 2 => likeAtom("o_orderpriority",
          Seq("%URGENT", "%HIGH", "%LOW", "%MEDIUM", "%SPECIFIED", "1%"), rng)
        case 3 => dateAtom("o_orderdate", rng)
        case 4 => modAtom("o_custkey", rng)
        case _ => numAtom("o_orderkey", 100, 14000, rng)
      }
    case _ =>
      rng.nextInt(7) match {
        case 0 => numAtom("l_quantity", 5, 45, rng)
        case 1 => discountAtom(rng)
        case 2 => strAtom("l_returnflag", Seq("A", "N", "R"), rng)
        case 3 => strAtom("l_linestatus", Seq("O", "F"), rng)
        case 4 => dateAtom("l_shipdate", rng)
        case 5 => modAtom("l_partkey", rng)
        case _ => numAtom("l_extendedprice", 2000, 100000, rng)
      }
  }

  private def predicate(table: String, rng: scala.util.Random): Frag = {
    val n = 1 + rng.nextInt(3)
    val atoms = Seq.fill(n)(atom(table, rng))
    atoms.reduce { (a, b) =>
      if (rng.nextBoolean())
        Frag(s"(${a.sql} AND ${b.sql})", () => a.mk() && b.mk())
      else
        Frag(s"(${a.sql} OR ${b.sql})", () => a.mk() || b.mk())
    }
  }

  // ------------------------------------------------- aggregates and keys

  /** (column, decimal scale) pools — scales match the hand-written
    * queries' precedent (q01), where the double→decimal conversion is
    * pinned to agree across engines.
    */
  private def aggCol(table: String, rng: scala.util.Random): (String, Int) = table match {
    case "orders" => ("o_totalprice", 2)
    case _ => Seq(("l_quantity", 2), ("l_extendedprice", 2), ("l_discount", 4), ("l_tax", 4))(rng.nextInt(4))
  }

  private def aggFrag(table: String, rng: scala.util.Random): Frag = {
    val (c, sc) = aggCol(table, rng)
    Frag(s"CAST(sum(CAST($c AS DECIMAL(28,$sc))) AS DOUBLE)",
      () => sum(col(c).cast(DecimalType(28, sc))).cast("double"))
  }

  private def auxFrag(table: String, rng: scala.util.Random): Frag = table match {
    case "orders" =>
      rng.nextInt(3) match {
        case 0 => Frag("count(DISTINCT o_custkey)", () => countDistinct(col("o_custkey")))
        case 1 => Frag("CAST(min(o_orderkey) AS BIGINT)", () => min(col("o_orderkey")).cast("long"))
        case _ => Frag("CAST(max(o_custkey) AS BIGINT)", () => max(col("o_custkey")).cast("long"))
      }
    case _ =>
      rng.nextInt(3) match {
        case 0 => Frag("count(DISTINCT l_suppkey)", () => countDistinct(col("l_suppkey")))
        case 1 => Frag("CAST(min(l_orderkey) AS BIGINT)", () => min(col("l_orderkey")).cast("long"))
        case _ => Frag("CAST(max(l_partkey) AS BIGINT)", () => max(col("l_partkey")).cast("long"))
      }
  }

  private def groupFrag(table: String, rng: scala.util.Random): Frag = table match {
    case "orders" =>
      rng.nextInt(4) match {
        case 0 => Frag("o_orderstatus", () => col("o_orderstatus"))
        case 1 => Frag("o_orderpriority", () => col("o_orderpriority"))
        case 2 => Frag("year(CAST(o_orderdate AS DATE))", () => year(col("o_orderdate").cast("date")))
        case _ => Frag("o_custkey % 10", () => col("o_custkey") % 10)
      }
    case _ =>
      rng.nextInt(4) match {
        case 0 => Frag("l_returnflag", () => col("l_returnflag"))
        case 1 => Frag("l_linestatus", () => col("l_linestatus"))
        case 2 => Frag("year(CAST(l_shipdate AS DATE))", () => year(col("l_shipdate").cast("date")))
        case _ => Frag("l_suppkey % 10", () => col("l_suppkey") % 10)
      }
  }

  /** Sort column + unique-key tiebreak: the tiebreak makes ORDER BY +
    * LIMIT a deterministic row SET, so the summary is engine-independent
    * even when the sort column has ties.
    */
  private def sortFrag(table: String, rng: scala.util.Random): (Frag, Seq[String]) = table match {
    case "orders" =>
      val s = Seq("o_totalprice", "o_orderdate", "o_custkey")(rng.nextInt(3))
      (Frag(s, () => col(s)), Seq("o_orderkey"))
    case _ =>
      val s = Seq("l_extendedprice", "l_shipdate", "l_quantity")(rng.nextInt(3))
      // NOTE: in the driver-generated data (l_orderkey, l_linenumber) is
      // NOT unique (unlike real TPC-H) — an equal-sort-value duplicate
      // key at a LIMIT boundary once made the selected row SET differ
      // between engines (fzC013 at sf0.001). The 4-column key below is
      // verified unique at every shipped SF, making ORDER BY total.
      (Frag(s, () => col(s)),
        Seq("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice"))
  }

  // ------------------------------------------------------------ families

  /** Family A — filtered scan, whole-table aggregate summary. */
  private def scanCase(id: String, rng: scala.util.Random): FuzzCase = {
    val table = if (rng.nextBoolean()) "orders" else "lineitem"
    val pred = predicate(table, rng)
    val agg = aggFrag(table, rng)
    val aux = auxFrag(table, rng)
    FuzzCase(id, table,
      s"""SELECT '$id' AS fq, count(*) AS n_rows, ${agg.sql} AS agg, ${aux.sql} AS aux
         FROM $table WHERE ${pred.sql}""",
      ts => ts(table).filter(pred.mk())
        .agg(count(lit(1)).as("n_rows"), agg.mk().as("agg"), aux.mk().as("aux"))
        .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
  }

  /** Family B — group-by (1–2 keys, positional), optional HAVING,
    * summarized over the groups.
    */
  private def groupCase(id: String, rng: scala.util.Random): FuzzCase = {
    val table = if (rng.nextBoolean()) "orders" else "lineitem"
    val pred = predicate(table, rng)
    val nG = 1 + rng.nextInt(2)
    val gs = Seq.fill(nG)(groupFrag(table, rng))
    val (c, sc) = aggCol(table, rng)
    val having = if (rng.nextInt(3) == 0) Some(1 + rng.nextInt(5)) else None
    val gList = gs.zipWithIndex.map { case (g, i) => s"${g.sql} AS g$i" }.mkString(", ")
    val ordinals = (1 to nG).mkString(", ")
    val havingSql = having.map(h => s" HAVING count(*) > $h").getOrElse("")
    FuzzCase(id, table,
      s"""SELECT '$id' AS fq, count(*) AS n_rows, CAST(sum(s) AS DOUBLE) AS agg,
           CAST(sum(cnt) AS BIGINT) AS aux
         FROM (
           SELECT $gList, count(*) AS cnt, sum(CAST($c AS DECIMAL(28,$sc))) AS s
           FROM $table WHERE ${pred.sql} GROUP BY $ordinals$havingSql
         ) __g""",
      ts => {
        val grouped = ts(table).filter(pred.mk())
          .groupBy(gs.map(_.mk()).toIndexedSeq: _*)
          .agg(count(lit(1)).as("cnt"), sum(col(c).cast(DecimalType(28, sc))).as("s"))
        val gated = having.map(h => grouped.filter(col("cnt") > h)).getOrElse(grouped)
        gated.agg(
            count(lit(1)).as("n_rows"),
            sum(col("s")).cast("double").as("agg"),
            sum(col("cnt")).cast("long").as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux"))
      })
  }

  /** Family C — ORDER BY + LIMIT with unique tiebreak, summarized. */
  private def topCase(id: String, rng: scala.util.Random): FuzzCase = {
    val table = if (rng.nextBoolean()) "orders" else "lineitem"
    val pred = predicate(table, rng)
    val (sort, keys) = sortFrag(table, rng)
    val desc_ = rng.nextBoolean()
    val limit = 10 + rng.nextInt(500)
    val (c, sc) = aggCol(table, rng)
    val dirSql = if (desc_) "DESC" else "ASC"
    val tiebreakSql = keys.map(k => s"$k ASC").mkString(", ")
    FuzzCase(id, table,
      s"""SELECT '$id' AS fq, count(*) AS n_rows,
           CAST(sum(CAST($c AS DECIMAL(28,$sc))) AS DOUBLE) AS agg,
           CAST(min(${keys.head}) AS BIGINT) AS aux
         FROM (
           SELECT * FROM $table WHERE ${pred.sql}
           ORDER BY ${sort.sql} $dirSql, $tiebreakSql LIMIT $limit
         ) __t""",
      ts => {
        val sortCol = if (desc_) sort.mk().desc else sort.mk().asc
        ts(table).filter(pred.mk())
          .orderBy((sortCol +: keys.map(col(_).asc)).toIndexedSeq: _*)
          .limit(limit)
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col(c).cast(DecimalType(28, sc))).cast("double").as("agg"),
            min(col(keys.head)).cast("long").as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux"))
      })
  }

  /** Family D — two-table joins on the lineitem→orders FK: half INNER
    * with a mixed-table WHERE, half LEFT OUTER with an extra predicate
    * in the ON clause (the classic divergence area: a right-side filter
    * in ON preserves unmatched left rows, in WHERE it silently turns the
    * join inner — both engines must agree on the distinction). Aggregates
    * run over right-side columns, so null-skipping semantics of
    * sum/count(DISTINCT) over unmatched rows are exercised too.
    */
  private def joinCase(id: String, rng: scala.util.Random): FuzzCase = {
    val (c, sc) = aggCol("lineitem", rng)
    val aggSql = s"CAST(sum(CAST($c AS DECIMAL(28,$sc))) AS DOUBLE)"
    val aggMk = () => sum(col(c).cast(DecimalType(28, sc))).cast("double")
    val aux = auxFrag(if (rng.nextBoolean()) "orders" else "lineitem", rng)
    if (rng.nextBoolean()) {
      // INNER: predicate mixes atoms from both sides
      val po = atom("orders", rng)
      val pl = atom("lineitem", rng)
      val pred = if (rng.nextBoolean())
        Frag(s"(${po.sql} AND ${pl.sql})", () => po.mk() && pl.mk())
      else
        Frag(s"(${po.sql} OR ${pl.sql})", () => po.mk() || pl.mk())
      FuzzCase(id, "lineitem",
        s"""SELECT '$id' AS fq, count(*) AS n_rows, $aggSql AS agg, ${aux.sql} AS aux
           FROM lineitem JOIN orders ON l_orderkey = o_orderkey
           WHERE ${pred.sql}""",
        ts => ts("lineitem")
          .join(ts("orders"), col("l_orderkey") === col("o_orderkey"))
          .filter(pred.mk())
          .agg(count(lit(1)).as("n_rows"), aggMk().as("agg"), aux.mk().as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
    } else {
      // LEFT: lineitem-side atom in ON (keeps unmatched orders rows),
      // orders-side atom in WHERE
      val onAtom = atom("lineitem", rng)
      val whereAtom = atom("orders", rng)
      FuzzCase(id, "orders",
        s"""SELECT '$id' AS fq, count(*) AS n_rows, $aggSql AS agg, ${aux.sql} AS aux
           FROM orders LEFT JOIN lineitem
             ON l_orderkey = o_orderkey AND ${onAtom.sql}
           WHERE ${whereAtom.sql}""",
        ts => ts("orders")
          .join(ts("lineitem"),
            col("l_orderkey") === col("o_orderkey") && onAtom.mk(), "left")
          .filter(whereAtom.mk())
          .agg(count(lit(1)).as("n_rows"), aggMk().as("agg"), aux.mk().as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
    }
  }

  /** Family E — window functions: row_number with a unique tiebreak
    * (deterministic row identity) and rank without one (deterministic
    * BY VALUE even under ties — both engines must group equal sort keys
    * identically), summarized as a conditional top-5-per-partition
    * decimal sum plus the rank total.
    */
  private def windowCase(id: String, rng: scala.util.Random): FuzzCase = {
    val table = if (rng.nextBoolean()) "orders" else "lineitem"
    val pred = predicate(table, rng)
    val part = groupFrag(table, rng)
    val (sort, keys) = sortFrag(table, rng)
    val desc_ = rng.nextBoolean()
    val (c, sc) = aggCol(table, rng)
    val dirSql = if (desc_) "DESC" else "ASC"
    val tiebreakSql = keys.map(k => s"$k ASC").mkString(", ")
    FuzzCase(id, table,
      s"""SELECT '$id' AS fq, count(*) AS n_rows,
           CAST(sum(CASE WHEN rn <= 5 THEN CAST($c AS DECIMAL(28,$sc)) END) AS DOUBLE) AS agg,
           CAST(sum(rk) AS BIGINT) AS aux
         FROM (
           SELECT $c,
             row_number() OVER (PARTITION BY ${part.sql} ORDER BY ${sort.sql} $dirSql, $tiebreakSql) AS rn,
             rank() OVER (PARTITION BY ${part.sql} ORDER BY ${sort.sql} $dirSql) AS rk
           FROM $table WHERE ${pred.sql}
         ) __w""",
      ts => {
        import org.apache.spark.sql.expressions.Window
        val sortCol = if (desc_) sort.mk().desc else sort.mk().asc
        val wRn = Window.partitionBy(part.mk())
          .orderBy((sortCol +: keys.map(col(_).asc)).toIndexedSeq: _*)
        val wRk = Window.partitionBy(part.mk()).orderBy(sortCol)
        ts(table).filter(pred.mk())
          .select(
            col(c),
            row_number().over(wRn).as("rn"),
            rank().over(wRk).as("rk"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(when(col("rn") <= 5, col(c).cast(DecimalType(28, sc)))).cast("double").as("agg"),
            sum(col("rk")).cast("long").as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux"))
      })
  }

  /** Family F — scalar functions (the q60-family surface, fuzzed):
    * string transforms (upper/lower/substr/concat/length) and date
    * parts (year/month/day), summarized as count(DISTINCT expr) plus a
    * length/value sum. Exercises per-function semantic agreement
    * (1-based substr, char-counting length, date-part integer widths)
    * rather than plan shapes.
    */
  private def scalarCase(id: String, rng: scala.util.Random): FuzzCase = {
    val table = if (rng.nextBoolean()) "orders" else "lineitem"
    val pred = predicate(table, rng)
    val strCol = if (table == "orders") "o_orderpriority" else "l_returnflag"
    val str2Col = if (table == "orders") "o_orderstatus" else "l_linestatus"
    val dateCol = if (table == "orders") "o_orderdate" else "l_shipdate"
    if (rng.nextBoolean()) {
      // string kind
      val k = 1 + rng.nextInt(6)
      val (eSql, eMk): (String, () => Column) = rng.nextInt(4) match {
        case 0 => (s"upper($strCol)", () => upper(col(strCol)))
        case 1 => (s"substr($strCol, 1, $k)", () => substring(col(strCol), 1, k))
        case 2 => (s"concat($strCol, '_', $str2Col)",
          () => concat(col(strCol), lit("_"), col(str2Col)))
        case _ => (s"lower(concat($str2Col, $strCol))",
          () => lower(concat(col(str2Col), col(strCol))))
      }
      FuzzCase(id, table,
        s"""SELECT '$id' AS fq, count(*) AS n_rows,
             CAST(sum(length($eSql)) AS DOUBLE) AS agg,
             count(DISTINCT $eSql) AS aux
           FROM $table WHERE ${pred.sql}""",
        ts => ts(table).filter(pred.mk())
          .agg(
            count(lit(1)).as("n_rows"),
            sum(length(eMk())).cast("double").as("agg"),
            countDistinct(eMk()).as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
    } else {
      // date-part kind
      val (eSql, eMk): (String, () => Column) = rng.nextInt(3) match {
        case 0 => (s"year(CAST($dateCol AS DATE))", () => year(col(dateCol).cast("date")))
        case 1 => (s"month(CAST($dateCol AS DATE))", () => month(col(dateCol).cast("date")))
        case _ => (s"day(CAST($dateCol AS DATE))", () => dayofmonth(col(dateCol).cast("date")))
      }
      FuzzCase(id, table,
        s"""SELECT '$id' AS fq, count(*) AS n_rows,
             CAST(sum($eSql) AS DOUBLE) AS agg,
             count(DISTINCT $eSql) AS aux
           FROM $table WHERE ${pred.sql}""",
        ts => ts(table).filter(pred.mk())
          .agg(
            count(lit(1)).as("n_rows"),
            sum(eMk()).cast("double").as("agg"),
            countDistinct(eMk()).as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
    }
  }

  /** Family H — ROLLUP / CUBE / GROUPING SETS with GROUPING() markers:
    * the multi-granularity aggregate surface where engines diverge on
    * subtotal-row NULL semantics and grouping-flag assignment. The
    * summary weights each result group's count by (1 + 2·GROUPING(g0)
    * + GROUPING(g1)), so a subtotal row attributed to the wrong
    * granularity changes `aux` even when the group count matches.
    *
    * The DSL twin deliberately does NOT use Spark's rollup()/cube():
    * it expands the construct into a UNION of plain groupBys (one per
    * grouping set, with literal grouping flags) — an independent
    * formulation of the semantics, so a Spark rollup planner bug and a
    * DuckDB subtotal bug are both catchable.
    *
    * DIVERGENCE FOUND (and normalized away): over an EMPTY input,
    * DuckDB follows the SQL standard and still emits the grand-total
    * grouping-set row (count 0, GROUPING flags 1) — Spark SQL emits no
    * rows at all. Every generated case therefore appends
    * `HAVING count(*) > 0`: a no-op for real groups (cardinality ≥ 1
    * by construction), but it drops the standard's empty-input row so
    * both engines agree on every predicate the generator can produce.
    */
  private def rollupCase(id: String, rng: scala.util.Random): FuzzCase = {
    val table = if (rng.nextBoolean()) "orders" else "lineitem"
    val pred = predicate(table, rng)
    val (k0, k1) = {
      val ks = if (table == "orders") Seq("o_orderpriority", "o_orderstatus")
               else Seq("l_returnflag", "l_linestatus")
      if (rng.nextBoolean()) (ks.head, ks.last) else (ks.last, ks.head)
    }
    val (c, sc) = aggCol(table, rng)
    val construct = rng.nextInt(3)
    val constructSql = construct match {
      case 0 => s"ROLLUP ($k0, $k1)"
      case 1 => s"CUBE ($k0, $k1)"
      case _ => s"GROUPING SETS (($k0), ($k1), ())"
    }
    // the grouping sets each construct expands to, as (keys, gx, gy)
    val sets: Seq[(Seq[String], Int, Int)] = construct match {
      case 0 => Seq((Seq(k0, k1), 0, 0), (Seq(k0), 0, 1), (Nil, 1, 1))
      case 1 => Seq((Seq(k0, k1), 0, 0), (Seq(k0), 0, 1), (Seq(k1), 1, 0), (Nil, 1, 1))
      case _ => Seq((Seq(k0), 0, 1), (Seq(k1), 1, 0), (Nil, 1, 1))
    }
    FuzzCase(id, table,
      s"""SELECT '$id' AS fq, count(*) AS n_rows,
           CAST(sum(s) AS DOUBLE) AS agg,
           CAST(sum(cnt * (1 + 2 * gx + gy)) AS BIGINT) AS aux
         FROM (
           SELECT count(*) AS cnt, sum(CAST($c AS DECIMAL(28,$sc))) AS s,
             GROUPING($k0) AS gx, GROUPING($k1) AS gy
           FROM $table WHERE ${pred.sql} GROUP BY $constructSql
           HAVING count(*) > 0
         ) __r""",
      ts => {
        val base = ts(table).filter(pred.mk())
        val perSet = sets.map { case (keys, gx, gy) =>
          val g = if (keys.isEmpty)
            base.agg(count(lit(1)).as("cnt"),
              sum(col(c).cast(DecimalType(28, sc))).as("s"))
          else
            base.groupBy(keys.map(col).toIndexedSeq: _*)
              .agg(count(lit(1)).as("cnt"),
                sum(col(c).cast(DecimalType(28, sc))).as("s"))
          g.select(col("cnt"), col("s"), lit(gx).as("gx"), lit(gy).as("gy"))
        }
        perSet.reduce(_.unionByName(_))
          .filter(col("cnt") > 0) // the HAVING twin: drop the empty-input grand-total row
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("s")).cast("double").as("agg"),
            sum(col("cnt") * (lit(1) + lit(2) * col("gx") + col("gy")))
              .cast("long").as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux"))
      })
  }

  /** Family G — set operations and correlated EXISTS. Set ops run two
    * predicates over one table's key column through UNION [ALL] /
    * INTERSECT / EXCEPT (default-DISTINCT semantics must agree);
    * EXISTS/NOT EXISTS correlate orders against a pre-filtered lineitem
    * (the DSL twin renders them as semi/anti joins — a genuinely
    * different plan for the same semantics).
    */
  private def setopCase(id: String, rng: scala.util.Random): FuzzCase =
    if (rng.nextBoolean()) {
      val table = if (rng.nextBoolean()) "orders" else "lineitem"
      val key = if (table == "orders") "o_orderkey" else "l_partkey"
      val p1 = predicate(table, rng)
      val p2 = predicate(table, rng)
      val op = Seq("UNION", "UNION ALL", "INTERSECT", "EXCEPT")(rng.nextInt(4))
      FuzzCase(id, table,
        s"""SELECT '$id' AS fq, count(*) AS n_rows,
             CAST(sum(k) AS DOUBLE) AS agg, count(DISTINCT k) AS aux
           FROM (
             (SELECT $key AS k FROM $table WHERE ${p1.sql})
             $op
             (SELECT $key AS k FROM $table WHERE ${p2.sql})
           ) __s""",
        ts => {
          val a = ts(table).filter(p1.mk()).select(col(key).as("k"))
          val b = ts(table).filter(p2.mk()).select(col(key).as("k"))
          val combined = op match {
            case "UNION"     => a.union(b).distinct()
            case "UNION ALL" => a.union(b)
            case "INTERSECT" => a.intersect(b)
            case _           => a.except(b)
          }
          combined.agg(
              count(lit(1)).as("n_rows"),
              sum(col("k")).cast("double").as("agg"),
              countDistinct(col("k")).as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux"))
        })
    } else {
      val oPred = atom("orders", rng)
      val lAtom = atom("lineitem", rng)
      val negated = rng.nextBoolean()
      val exSql = if (negated) "NOT EXISTS" else "EXISTS"
      FuzzCase(id, "orders",
        s"""SELECT '$id' AS fq, count(*) AS n_rows,
             CAST(sum(CAST(o_totalprice AS DECIMAL(28,2))) AS DOUBLE) AS agg,
             count(DISTINCT o_custkey) AS aux
           FROM orders o
           WHERE ${oPred.sql} AND $exSql (
             SELECT 1 FROM lineitem l
             WHERE l.l_orderkey = o.o_orderkey AND ${lAtom.sql})""",
        ts => {
          val right = ts("lineitem").filter(lAtom.mk())
          ts("orders").filter(oPred.mk())
            .join(right, col("o_orderkey") === col("l_orderkey"),
              if (negated) "left_anti" else "left_semi")
            .agg(
              count(lit(1)).as("n_rows"),
              sum(col("o_totalprice").cast(DecimalType(28, 2))).cast("double").as("agg"),
              countDistinct(col("o_custkey")).as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux"))
        })
    }

  /** Family I — date/interval arithmetic: truncation (year/quarter/
    * month/ISO week), interval addition (day offsets; month offsets with
    * end-of-month clamping), last_day, and EXTRACT parts incl. ISO WEEK
    * and DOY. The classic silent-divergence surface (week start, clamp
    * rules, part numbering) — every primitive used here was probed equal
    * on both engines, incl. ISO week at a year boundary (1996-12-30 →
    * week 1) and leap-clamping (1996-01-31 + 1 month → 02-29).
    *
    * Date-valued results are summarized through a yyyymmdd integer
    * encoding built from EXTRACTs (dates never cross the hash boundary
    * as raw values), numeric parts summed directly; both flow through
    * the house BIGINT→DOUBLE rule.
    */
  private def dateCase(id: String, rng: scala.util.Random): FuzzCase = {
    val table = if (rng.nextBoolean()) "orders" else "lineitem"
    val pred = predicate(table, rng)
    val dc = if (table == "orders") "o_orderdate" else "l_shipdate"
    val dSql = s"CAST($dc AS DATE)"
    val dMk = () => col(dc).cast("date")

    def encodeSql(e: String) =
      s"CAST(EXTRACT(YEAR FROM $e) * 10000 + EXTRACT(MONTH FROM $e) * 100 + EXTRACT(DAY FROM $e) AS BIGINT)"
    def encodeMk(e: Column) =
      (year(e) * 10000 + month(e) * 100 + dayofmonth(e)).cast("long")

    if (rng.nextBoolean()) {
      // date-valued expression
      val (eSql, eMk): (String, () => Column) = rng.nextInt(4) match {
        case 0 =>
          val u = Seq("year", "quarter", "month", "week")(rng.nextInt(4))
          (s"CAST(date_trunc('$u', $dSql) AS DATE)", () => trunc(dMk(), u))
        case 1 =>
          val n = 1 + rng.nextInt(30)
          (s"CAST($dSql + INTERVAL $n DAY AS DATE)", () => date_add(dMk(), n))
        case 2 =>
          val n = 1 + rng.nextInt(11)
          (s"CAST($dSql + INTERVAL $n MONTH AS DATE)", () => add_months(dMk(), n))
        case _ =>
          (s"last_day($dSql)", () => last_day(dMk()))
      }
      FuzzCase(id, table,
        s"""SELECT '$id' AS fq, count(*) AS n_rows,
             CAST(sum(${encodeSql(eSql)}) AS DOUBLE) AS agg,
             count(DISTINCT $eSql) AS aux
           FROM $table WHERE ${pred.sql}""",
        ts => ts(table).filter(pred.mk())
          .agg(
            count(lit(1)).as("n_rows"),
            sum(encodeMk(eMk())).cast("double").as("agg"),
            countDistinct(eMk()).as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
    } else {
      // numeric date-part expression
      val (u, mk): (String, () => Column) = Seq[(String, () => Column)](
        ("YEAR", () => year(dMk())),
        ("MONTH", () => month(dMk())),
        ("DAY", () => dayofmonth(dMk())),
        ("QUARTER", () => quarter(dMk())),
        ("WEEK", () => weekofyear(dMk())),
        ("DOY", () => dayofyear(dMk())))(rng.nextInt(6))
      val eSql = s"CAST(EXTRACT($u FROM $dSql) AS BIGINT)"
      FuzzCase(id, table,
        s"""SELECT '$id' AS fq, count(*) AS n_rows,
             CAST(sum($eSql) AS DOUBLE) AS agg,
             count(DISTINCT $eSql) AS aux
           FROM $table WHERE ${pred.sql}""",
        ts => ts(table).filter(pred.mk())
          .agg(
            count(lit(1)).as("n_rows"),
            sum(mk().cast("long")).cast("double").as("agg"),
            countDistinct(mk().cast("long")).as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
    }
  }

  /** Family J — NULL semantics: the corpus tables are null-free, so
    * nulls are SYNTHESIZED identically in both engines with
    * NULLIF(col, value), then pushed through the constructs whose
    * null-handling diverges silently when engines disagree: aggregate
    * null-skipping (sum/avg/count over a nullable expression),
    * count(*) vs count(expr), COALESCE fallbacks, IS [NOT] DISTINCT
    * FROM comparisons (null-safe equality), CASE over nullable inputs,
    * and null-producing arithmetic. Summary flows through the house
    * BIGINT/DECIMAL→DOUBLE rules.
    */
  private def nullCase(id: String, rng: scala.util.Random): FuzzCase = {
    val table = if (rng.nextBoolean()) "orders" else "lineitem"
    val pred = predicate(table, rng)
    val (sc, scVals) = if (table == "orders") ("o_orderstatus", Seq("O", "F", "P"))
                       else ("l_returnflag", Seq("A", "N", "R"))
    val (sc2, sc2Vals) = if (table == "orders") ("o_orderpriority", Seq("1-URGENT", "2-HIGH"))
                         else ("l_linestatus", Seq("O", "F"))
    val (nc, ncDiv) = if (table == "orders") ("o_custkey", 3 + rng.nextInt(5))
                      else ("l_suppkey", 3 + rng.nextInt(5))
    val v1 = scVals(rng.nextInt(scVals.size))
    val v2 = sc2Vals(rng.nextInt(sc2Vals.size))
    // nullable string: null where the column equals v1
    val nstrSql = s"NULLIF($sc, '$v1')"
    val nstrMk = () => nullif(col(sc), lit(v1))
    // nullable number: null where nc % div = 0
    val nnumSql = s"NULLIF($nc % $ncDiv, 0)"
    val nnumMk = () => nullif(col(nc) % ncDiv, lit(0))
    rng.nextInt(3) match {
      case 0 =>
        // aggregate null-skipping: count(expr) skips, count(*) doesn't;
        // sum over nullable; count distinct of nullable
        FuzzCase(id, table,
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum($nnumSql) AS DOUBLE) AS agg,
               count($nstrSql) AS aux
             FROM $table WHERE ${pred.sql}""",
          ts => ts(table).filter(pred.mk())
            .agg(
              count(lit(1)).as("n_rows"),
              sum(nnumMk()).cast("double").as("agg"),
              count(nstrMk()).as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
      case 1 =>
        // COALESCE fallback + null-safe distinct-from comparison
        FuzzCase(id, table,
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(length(COALESCE($nstrSql, '$v2'))) AS DOUBLE) AS agg,
               CAST(sum(CASE WHEN $nstrSql IS DISTINCT FROM NULLIF($sc2, '$v2')
                 THEN 1 ELSE 0 END) AS BIGINT) AS aux
             FROM $table WHERE ${pred.sql}""",
          ts => ts(table).filter(pred.mk())
            .agg(
              count(lit(1)).as("n_rows"),
              sum(length(coalesce(nstrMk(), lit(v2)))).cast("double").as("agg"),
              sum(when(!(nstrMk() <=> nullif(col(sc2), lit(v2))), 1).otherwise(0))
                .cast("long").as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
      case _ =>
        // group by a nullable key: the null group must aggregate
        // identically (one group, not dropped) in both engines
        FuzzCase(id, table,
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(cnt) AS DOUBLE) AS agg, count(g) AS aux
             FROM (
               SELECT $nstrSql AS g, count(*) AS cnt
               FROM $table WHERE ${pred.sql} GROUP BY 1
             ) __n""",
          ts => ts(table).filter(pred.mk())
            .groupBy(nstrMk().as("g"))
            .agg(count(lit(1)).as("cnt"))
            .agg(
              count(lit(1)).as("n_rows"),
              sum(col("cnt")).cast("double").as("agg"),
              count(col("g")).as("aux")) // count(g) skips the null group
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
    }
  }

  /** Family K — string functions over the DOCUMENTS table (real prose,
    * not categorical codes): substr/left/right windows, replace, lpad/
    * rpad, translate, reverse, split_part, instr positions, contains,
    * and levenshtein (on a bounded prefix — it is O(n·m)). Every
    * primitive probed value-identical on both engines first (incl.
    * translate's drop-unmapped-chars rule, split_part out-of-range →
    * empty string, lpad truncation, instr miss → 0).
    */
  private def docAtom(rng: scala.util.Random): Frag =
    rng.nextInt(4) match {
      case 0 => strAtom("lang", Seq("en", "es", "fr", "de", "zh"), rng)
      case 1 => strAtom("source", (0 until 20).map(i => s"src$i"), rng)
      case 2 => numAtom("n_chars", 10, 3000, rng)
      case _ => modAtom("doc_id", rng)
    }

  private def strCase(id: String, rng: scala.util.Random): FuzzCase = {
    val atoms = Seq.fill(1 + rng.nextInt(2))(docAtom(rng))
    val pred = atoms.reduce { (a, b) =>
      if (rng.nextBoolean())
        Frag(s"(${a.sql} AND ${b.sql})", () => a.mk() && b.mk())
      else
        Frag(s"(${a.sql} OR ${b.sql})", () => a.mk() || b.mk())
    }
    val k = 5 + rng.nextInt(40)
    val j = 1 + rng.nextInt(5)
    rng.nextInt(3) match {
      case 0 =>
        // string-transform kind
        val (eSql, eMk): (String, () => Column) = rng.nextInt(6) match {
          case 0 => (s"replace(substr(text, 1, $k), 'e', 'xy')",
            () => regexp_replace(substring(col("text"), 1, k), "e", "xy"))
          case 1 => (s"left(text, $k)", () => substring(col("text"), 1, k))
          case 2 => (s"lpad(substr(text, 1, $j), $k, '*')",
            () => lpad(substring(col("text"), 1, j), k, "*"))
          case 3 => (s"translate(substr(text, 1, $k), 'aeiou', '123')",
            () => translate(substring(col("text"), 1, k), "aeiou", "123"))
          case 4 => (s"reverse(substr(text, 1, $k))",
            () => reverse(substring(col("text"), 1, k)))
          case _ => (s"split_part(text, ' ', $j)",
            () => split_part(col("text"), lit(" "), lit(j)))
        }
        FuzzCase(id, "documents",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(length($eSql)) AS DOUBLE) AS agg,
               count(DISTINCT $eSql) AS aux
             FROM documents WHERE ${pred.sql}""",
          ts => ts("documents").filter(pred.mk())
            .agg(
              count(lit(1)).as("n_rows"),
              sum(length(eMk())).cast("double").as("agg"),
              countDistinct(eMk()).as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
      case 1 =>
        // numeric kind: positions and edit distances
        val (eSql, eMk): (String, () => Column) = rng.nextInt(3) match {
          case 0 =>
            val needle = Seq("the", "an", "of", "ion", "ing")(rng.nextInt(5))
            (s"instr(text, '$needle')", () => instr(col("text"), needle))
          case 1 =>
            (s"levenshtein(substr(text, 1, 15), 'the quick brown')",
              () => levenshtein(substring(col("text"), 1, 15), lit("the quick brown")))
          case _ =>
            (s"length(split_part(text, ' ', $j))",
              () => length(split_part(col("text"), lit(" "), lit(j))))
        }
        FuzzCase(id, "documents",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum($eSql) AS DOUBLE) AS agg,
               count(DISTINCT $eSql) AS aux
             FROM documents WHERE ${pred.sql}""",
          ts => ts("documents").filter(pred.mk())
            .agg(
              count(lit(1)).as("n_rows"),
              sum(eMk()).cast("double").as("agg"),
              countDistinct(eMk()).as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
      case _ =>
        // membership kind
        val needle = Seq("the", "data", "and", "model", "xyzzy")(rng.nextInt(5))
        FuzzCase(id, "documents",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(CAST(contains(text, '$needle') AS INT)) AS DOUBLE) AS agg,
               count(DISTINCT substr(text, 1, $k)) AS aux
             FROM documents WHERE ${pred.sql}""",
          ts => ts("documents").filter(pred.mk())
            .agg(
              count(lit(1)).as("n_rows"),
              sum(col("text").contains(needle).cast("int")).cast("double").as("agg"),
              countDistinct(substring(col("text"), 1, k)).as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
    }
  }

  /** Family L — the two dialect corners the other families don't sweep.
    *
    * Even ids: fixed-point DECIMAL arithmetic at controlled precision —
    * a two-factor product whose inferred type lands exactly on Spark's
    * 38-digit cap (still lossless), a three-factor product exact at
    * scale 6, a power-of-ten scale shift, and round()/floor()/ceiling()
    * on exact decimals — each narrowed via round-then-cast, because a
    * bare narrowing CAST is NOT dialect-neutral: Spark rounds HALF_UP
    * where DuckDB truncates. Every mathematical value stays
    * exactly representable at every step (no engine-dependent overflow:
    * Spark NULLs on decimal overflow where DuckDB raises) and all
    * operands are positive, where Spark's HALF_UP and DuckDB's
    * half-away-from-zero rounding agree.
    *
    * Odd ids: correlated scalar subqueries in the SELECT list over the
    * lineitem→orders FK — count-over-empty-group (= 0, the classic
    * COUNT-bug decorrelation corner), sum-over-empty (= NULL, pinned
    * via COALESCE), correlated MIN, and a CASE gate over the correlated
    * count. The DSL twin decorrelates BY HAND (filtered aggregate +
    * left join + COALESCE), so a Spark decorrelation-rewrite fault
    * localizes against both DuckDB and the manual plan.
    */
  private def decimalCase(id: String, rng: scala.util.Random): FuzzCase = {
    val pred = predicate("lineitem", rng)
    val k = rng.nextInt(4)
    val (eSql, eMk): (String, () => Column) = rng.nextInt(5) match {
      case 0 =>
        // (18,2) × (19,2) infers DECIMAL(38,4) in Spark — exactly the
        // precision cap, with no loss — then narrows via an EXPLICIT
        // round(): DuckDB's decimal→decimal narrowing cast TRUNCATES
        // (2.679 → 2.67) where Spark's rounds HALF_UP, so the only
        // dialect-neutral narrowing is round-then-cast — the rule this
        // family exists to pin (a bare narrowing CAST hash-mismatched
        // six of ten decimal cases on first contact)
        (s"CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2))), $k) AS DECIMAL(28,$k))",
          () => round(col("l_extendedprice").cast(DecimalType(18, 2)) *
            (lit(1).cast(DecimalType(18, 2)) - col("l_discount").cast(DecimalType(18, 2))), k)
            .cast(DecimalType(28, k)))
      case 1 =>
        // three-factor product, exact at scale 6 in both engines ((9,2)
        // factors keep DuckDB's p1+p2 width rule under ITS 38 cap too)
        (s"CAST(round(CAST(l_extendedprice AS DECIMAL(9,2)) * (CAST(1 AS DECIMAL(9,2)) - CAST(l_discount AS DECIMAL(9,2))) * (CAST(1 AS DECIMAL(9,2)) + CAST(l_tax AS DECIMAL(9,2))), $k) AS DECIMAL(28,$k))",
          () => round(col("l_extendedprice").cast(DecimalType(9, 2)) *
            (lit(1).cast(DecimalType(9, 2)) - col("l_discount").cast(DecimalType(9, 2))) *
            (lit(1).cast(DecimalType(9, 2)) + col("l_tax").cast(DecimalType(9, 2))), k)
            .cast(DecimalType(28, k)))
      case 2 =>
        // division by 1000 as an exact scale-shift product (scale 5),
        // rounded only at the narrowing cast
        (s"CAST(round(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(0.001 AS DECIMAL(6,3)), $k) AS DECIMAL(28,$k))",
          () => round(col("l_extendedprice").cast(DecimalType(18, 2)) *
            lit(new java.math.BigDecimal("0.001")).cast(DecimalType(6, 3)), k)
            .cast(DecimalType(28, k)))
      case 3 =>
        // round() on an exact decimal: value-identical across engines
        // even where result TYPES differ (both re-cast before summing)
        (s"CAST(round(CAST(l_tax AS DECIMAL(18,4)), $k) AS DECIMAL(28,$k))",
          () => round(col("l_tax").cast(DecimalType(18, 4)), k).cast(DecimalType(28, k)))
      case _ =>
        val (f, fMk): (String, Column => Column) =
          if (rng.nextBoolean()) ("floor", floor) else ("ceiling", ceil)
        (s"CAST($f(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(28,0))",
          () => fMk(col("l_extendedprice").cast(DecimalType(12, 2)) *
            col("l_quantity").cast(DecimalType(12, 2))).cast(DecimalType(28, 0)))
    }
    FuzzCase(id, "lineitem",
      s"""SELECT '$id' AS fq, count(*) AS n_rows,
           CAST(sum($eSql) AS DOUBLE) AS agg,
           count(DISTINCT $eSql) AS aux
         FROM lineitem WHERE ${pred.sql}""",
      ts => ts("lineitem").filter(pred.mk())
        .agg(
          count(lit(1)).as("n_rows"),
          sum(eMk()).cast("double").as("agg"),
          countDistinct(eMk()).as("aux"))
        .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
  }

  private def correlCase(id: String, rng: scala.util.Random): FuzzCase = {
    val outer = predicate("orders", rng)
    val inner = predicate("lineitem", rng)
    def summarize(sub: DataFrame, aggC: Column, auxC: Column): DataFrame =
      sub.agg(count(lit(1)).as("n_rows"), aggC.as("agg"), auxC.as("aux"))
        .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux"))
    rng.nextInt(4) match {
      case 0 =>
        // correlated count: empty group must yield 0, not NULL
        FuzzCase(id, "orders",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(c) AS DOUBLE) AS agg, CAST(max(c) AS BIGINT) AS aux
             FROM (
               SELECT (SELECT count(*) FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND ${inner.sql}) AS c
               FROM orders o WHERE ${outer.sql}
             ) __s""",
          ts => {
            val cnt = ts("lineitem").filter(inner.mk())
              .groupBy(col("l_orderkey")).agg(count(lit(1)).as("__c"))
            val o = ts("orders").filter(outer.mk())
            val c = coalesce(col("__c"), lit(0L))
            summarize(
              o.join(cnt, o("o_orderkey") === cnt("l_orderkey"), "left"),
              sum(c).cast("double"), max(c).cast("long"))
          })
      case 1 =>
        // correlated sum: empty group yields NULL, pinned via COALESCE;
        // aux counts the empty groups (quantity ≥ 1, so a real zero sum
        // cannot alias the sentinel)
        FuzzCase(id, "orders",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(s) AS DOUBLE) AS agg,
               CAST(sum(CASE WHEN s = 0 THEN 1 ELSE 0 END) AS BIGINT) AS aux
             FROM (
               SELECT COALESCE((SELECT sum(CAST(l.l_quantity AS DECIMAL(28,2)))
                                FROM lineitem l
                                WHERE l.l_orderkey = o.o_orderkey AND ${inner.sql}), 0) AS s
               FROM orders o WHERE ${outer.sql}
             ) __s""",
          ts => {
            val sums = ts("lineitem").filter(inner.mk())
              .groupBy(col("l_orderkey"))
              .agg(sum(col("l_quantity").cast(DecimalType(28, 2))).as("__s"))
            val o = ts("orders").filter(outer.mk())
            val s = coalesce(col("__s"), lit(0))
            summarize(
              o.join(sums, o("o_orderkey") === sums("l_orderkey"), "left"),
              sum(s).cast("double"),
              sum(when(s === 0, 1).otherwise(0)).cast("long"))
          })
      case 2 =>
        // correlated MIN: NULL on empty skipped by the outer sum; aux
        // counts matched orders
        FuzzCase(id, "orders",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(CAST(m AS DECIMAL(28,2))) AS DOUBLE) AS agg,
               count(m) AS aux
             FROM (
               SELECT (SELECT min(l.l_extendedprice) FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND ${inner.sql}) AS m
               FROM orders o WHERE ${outer.sql}
             ) __s""",
          ts => {
            val mins = ts("lineitem").filter(inner.mk())
              .groupBy(col("l_orderkey")).agg(min(col("l_extendedprice")).as("__m"))
            val o = ts("orders").filter(outer.mk())
            summarize(
              o.join(mins, o("o_orderkey") === mins("l_orderkey"), "left"),
              sum(col("__m").cast(DecimalType(28, 2))).cast("double"),
              count(col("__m")))
          })
      case _ =>
        // CASE gate over the correlated count in the SELECT list
        val j = 1 + rng.nextInt(5)
        FuzzCase(id, "orders",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(g) AS DOUBLE) AS agg,
               CAST(max(CASE WHEN g = 1 THEN o_custkey ELSE -1 END) AS BIGINT) AS aux
             FROM (
               SELECT o_custkey,
                 CASE WHEN (SELECT count(*) FROM lineitem l
                            WHERE l.l_orderkey = o.o_orderkey AND ${inner.sql}) > $j
                      THEN 1 ELSE 0 END AS g
               FROM orders o WHERE ${outer.sql}
             ) __s""",
          ts => {
            val cnt = ts("lineitem").filter(inner.mk())
              .groupBy(col("l_orderkey")).agg(count(lit(1)).as("__c"))
            val o = ts("orders").filter(outer.mk())
            val g = when(coalesce(col("__c"), lit(0L)) > j, 1).otherwise(0)
            summarize(
              o.join(cnt, o("o_orderkey") === cnt("l_orderkey"), "left")
                .select(o("o_custkey"), g.as("g")),
              sum(col("g")).cast("double"),
              max(when(col("g") === 1, col("o_custkey")).otherwise(-1)).cast("long"))
          })
    }
  }

  /** Family M — LATERAL derived tables (correlated top-k / aggregate /
    * argmin): the decorrelation surface the scalar-subquery half of
    * family L does not reach. A lateral LIMIT-k subquery must rewrite
    * into a partitioned rank, and an aggregate lateral into a left
    * join that distinguishes the empty group (count 0, sum NULL). The
    * DSL twin IS that manual rewrite (row_number window / groupBy +
    * left join), so a disagreement localizes to Spark's lateral
    * decorrelation against both DuckDB and the reference plan.
    */
  private def lateralCase(id: String, rng: scala.util.Random): FuzzCase = {
    import org.apache.spark.sql.expressions.Window
    val outer = predicate("orders", rng)
    val inner = predicate("lineitem", rng)
    def summarize(df: DataFrame, n: Column, a: Column, x: Column): DataFrame =
      df.agg(n.as("n_rows"), a.as("agg"), x.as("aux"))
        .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux"))
    rng.nextInt(3) match {
      case 0 =>
        // top-j lines per order, unique-key tiebreak
        val j = 1 + rng.nextInt(4)
        FuzzCase(id, "orders",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(CAST(t.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS agg,
               count(DISTINCT o.o_orderkey) AS aux
             FROM orders o,
             LATERAL (SELECT l.l_extendedprice FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND ${inner.sql}
                      ORDER BY l.l_extendedprice DESC, l.l_linenumber LIMIT $j) t
             WHERE ${outer.sql}""",
          ts => {
            val w = Window.partitionBy(col("l_orderkey"))
              .orderBy(col("l_extendedprice").desc, col("l_linenumber"))
            val top = ts("lineitem").filter(inner.mk())
              .withColumn("__rn", row_number().over(w))
              .filter(col("__rn") <= j)
            val o = ts("orders").filter(outer.mk())
            summarize(o.join(top, o("o_orderkey") === top("l_orderkey")),
              count(lit(1)),
              sum(col("l_extendedprice").cast(DecimalType(28, 2))).cast("double"),
              countDistinct(o("o_orderkey")))
          })
      case 1 =>
        // aggregate lateral: exactly ONE row per outer row; the empty
        // group must come back (c=0, s=NULL), pinned via COALESCE and
        // an empty-group counter
        FuzzCase(id, "orders",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(COALESCE(t.s, 0)) AS DOUBLE) AS agg,
               CAST(sum(CASE WHEN t.c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS aux
             FROM orders o,
             LATERAL (SELECT count(*) AS c,
                        sum(CAST(l.l_quantity AS DECIMAL(28,2))) AS s
                      FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND ${inner.sql}) t
             WHERE ${outer.sql}""",
          ts => {
            val g = ts("lineitem").filter(inner.mk())
              .groupBy(col("l_orderkey"))
              .agg(count(lit(1)).as("__c"),
                sum(col("l_quantity").cast(DecimalType(28, 2))).as("__s"))
            val o = ts("orders").filter(outer.mk())
            summarize(o.join(g, o("o_orderkey") === g("l_orderkey"), "left"),
              count(lit(1)),
              sum(coalesce(col("__s"), lit(0))).cast("double"),
              sum(when(coalesce(col("__c"), lit(0L)) === 0, 1).otherwise(0)).cast("long"))
          })
      case _ =>
        // argmin via LIMIT 1: the cheapest line per order, plus which
        // line it was (sum of linenumbers pins the argmin itself)
        FuzzCase(id, "orders",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(sum(CAST(t.l_extendedprice AS DECIMAL(28,2))) AS DOUBLE) AS agg,
               CAST(sum(t.l_linenumber) AS BIGINT) AS aux
             FROM orders o,
             LATERAL (SELECT l.l_extendedprice, l.l_linenumber FROM lineitem l
                      WHERE l.l_orderkey = o.o_orderkey AND ${inner.sql}
                      ORDER BY l.l_extendedprice ASC, l.l_linenumber LIMIT 1) t
             WHERE ${outer.sql}""",
          ts => {
            val w = Window.partitionBy(col("l_orderkey"))
              .orderBy(col("l_extendedprice").asc, col("l_linenumber"))
            val top = ts("lineitem").filter(inner.mk())
              .withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1)
            val o = ts("orders").filter(outer.mk())
            summarize(o.join(top, o("o_orderkey") === top("l_orderkey")),
              count(lit(1)),
              sum(col("l_extendedprice").cast(DecimalType(28, 2))).cast("double"),
              sum(col("l_linenumber")).cast("long"))
          })
    }
  }

  /** Family N — FILTER-clause aggregates (SQL:2003): the filter is part
    * of the AGGREGATE, not the WHERE, so empty-filter semantics differ
    * per aggregate (sum/max → NULL, count → 0) and per-group filters
    * coexist with unfiltered ones in a single agg. The DSL twin is the
    * canonical conditional-aggregation rewrite (`sum(when(p, x))`,
    * `countDistinct(when(p, x))` — NULLs drop out), so a disagreement
    * localizes Spark's FILTER path against both DuckDB and the rewrite.
    */
  /** Family O — explicit window FRAMES: running/sliding aggregates
    * under ROWS/RANGE BETWEEN bounds. ROWS frames ride a TOTAL order
    * (unique tiebreak appended) so frame membership is deterministic;
    * the RANGE variant orders by a single numeric column where peers
    * join the frame by VALUE — both engines must agree on the frame
    * extent of every row AND on the decimal-exact sums inside it. The
    * per-row framed sums then collapse through the house summary
    * (exact DECIMAL outer sum → one DOUBLE cast).
    */
  private def frameCase(id: String, rng: scala.util.Random, variant: Int): FuzzCase = {
    val table = if (rng.nextBoolean()) "orders" else "lineitem"
    val pred = predicate(table, rng)
    val part = groupFrag(table, rng)
    val (c, sc) = aggCol(table, rng)
    val k = 1 + rng.nextInt(5)
    val desc_ = rng.nextBoolean()
    val (sort, keys) = sortFrag(table, rng)
    val rangeCol = if (table == "orders") "o_custkey" else "l_partkey"
    val dateCol = if (table == "orders") "o_orderdate" else "l_shipdate"

    import org.apache.spark.sql.expressions.{Window, WindowSpec}
    val dirSql = if (desc_) "DESC" else "ASC"
    val tiebreakSql = keys.map(k0 => s"$k0 ASC").mkString(", ")
    def rowsOrder: WindowSpec = {
      val sortCol = if (desc_) sort.mk().desc else sort.mk().asc
      Window.partitionBy(part.mk())
        .orderBy((sortCol +: keys.map(col(_).asc)).toIndexedSeq: _*)
    }
    val (orderSql, frameSql, spec) = variant match {
      case 0 => (s"${sort.sql} $dirSql, $tiebreakSql",
        s"ROWS BETWEEN $k PRECEDING AND CURRENT ROW",
        rowsOrder.rowsBetween(-k, 0))
      case 1 => (s"${sort.sql} $dirSql, $tiebreakSql",
        s"ROWS BETWEEN CURRENT ROW AND $k FOLLOWING",
        rowsOrder.rowsBetween(0, k))
      case 2 => (s"$rangeCol ASC",
        s"RANGE BETWEEN ${k * 100} PRECEDING AND CURRENT ROW",
        Window.partitionBy(part.mk()).orderBy(col(rangeCol).asc)
          .rangeBetween(-k * 100L, 0L))
      case 3 => (s"${sort.sql} $dirSql, $tiebreakSql",
        s"ROWS BETWEEN UNBOUNDED PRECEDING AND $k FOLLOWING",
        rowsOrder.rowsBetween(Window.unboundedPreceding, k))
      case _ =>
        // date-typed RANGE frame with an INTERVAL offset. The DSL twin
        // is a genuinely independent formulation: the same frame over
        // datediff-to-an-anchor as a NUMERIC range — peers (equal
        // dates) and the k·10-day inclusive bound coincide exactly.
        (s"CAST($dateCol AS DATE) ASC",
          s"RANGE BETWEEN INTERVAL ${k * 10} DAY PRECEDING AND CURRENT ROW",
          Window.partitionBy(part.mk())
            .orderBy(datediff(col(dateCol).cast("date"),
              lit(java.sql.Date.valueOf("1990-01-01"))).asc)
            .rangeBetween(-k * 10L, 0L))
    }
    FuzzCase(id, table,
      s"""SELECT '$id' AS fq, count(*) AS n_rows,
           CAST(sum(fs) AS DOUBLE) AS agg,
           CAST(sum(fc) AS BIGINT) AS aux
         FROM (
           SELECT
             sum(CAST($c AS DECIMAL(28,$sc))) OVER w AS fs,
             count(*) OVER w AS fc
           FROM $table WHERE ${pred.sql}
           WINDOW w AS (PARTITION BY ${part.sql} ORDER BY $orderSql $frameSql)
         ) __f""",
      ts =>
        ts(table).filter(pred.mk())
          .select(
            sum(col(c).cast(DecimalType(28, sc))).over(spec).as("fs"),
            count(lit(1)).over(spec).as("fc"))
          .agg(
            count(lit(1)).as("n_rows"),
            sum(col("fs")).cast("double").as("agg"),
            sum(col("fc")).cast("long").as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
  }

  private def filterCase(id: String, rng: scala.util.Random): FuzzCase = {
    val outer = predicate("lineitem", rng)
    val p1 = predicate("lineitem", rng)
    val p2 = predicate("lineitem", rng)
    rng.nextInt(3) match {
      case 0 =>
        // ungrouped: decimal sum FILTER (NULL on empty set, pinned via
        // COALESCE) next to count FILTER (0 on empty set, no coalesce)
        FuzzCase(id, "lineitem",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(COALESCE(sum(CAST(l_extendedprice AS DECIMAL(28,2)))
                 FILTER (WHERE ${p1.sql}), 0) AS DOUBLE) AS agg,
               count(*) FILTER (WHERE ${p2.sql}) AS aux
             FROM lineitem WHERE ${outer.sql}""",
          ts => ts("lineitem").filter(outer.mk())
            .agg(
              count(lit(1)).as("n_rows"),
              coalesce(sum(when(p1.mk(),
                col("l_extendedprice").cast(DecimalType(28, 2)))), lit(0))
                .cast("double").as("agg"),
              sum(when(p2.mk(), 1L).otherwise(0L)).cast("long").as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
      case 1 =>
        // grouped: per-group FILTER aggregates; aux counts the groups
        // whose filter set is EMPTY — the count-0-vs-sum-NULL corner
        FuzzCase(id, "lineitem",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(COALESCE(sum(s), 0) AS DOUBLE) AS agg,
               CAST(sum(CASE WHEN c = 0 THEN 1 ELSE 0 END) AS BIGINT) AS aux
             FROM (
               SELECT l_returnflag,
                 sum(CAST(l_quantity AS DECIMAL(28,2))) FILTER (WHERE ${p1.sql}) AS s,
                 count(*) FILTER (WHERE ${p2.sql}) AS c
               FROM lineitem WHERE ${outer.sql} GROUP BY l_returnflag
             ) __g""",
          ts => {
            val g = ts("lineitem").filter(outer.mk())
              .groupBy(col("l_returnflag"))
              .agg(
                sum(when(p1.mk(), col("l_quantity").cast(DecimalType(28, 2)))).as("s"),
                sum(when(p2.mk(), 1L).otherwise(0L)).as("c"))
            g.agg(
              count(lit(1)).as("n_rows"),
              coalesce(sum(col("s")), lit(0)).cast("double").as("agg"),
              sum(when(col("c") === 0, 1).otherwise(0)).cast("long").as("aux"))
              .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux"))
          })
      case _ =>
        // max FILTER (exact, no division) + count(DISTINCT) FILTER —
        // the distinct-with-filter plan is its own rewrite path
        FuzzCase(id, "lineitem",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(COALESCE(max(CAST(l_extendedprice AS DECIMAL(28,2)))
                 FILTER (WHERE ${p1.sql}), 0) AS DOUBLE) AS agg,
               count(DISTINCT l_partkey) FILTER (WHERE ${p2.sql}) AS aux
             FROM lineitem WHERE ${outer.sql}""",
          ts => ts("lineitem").filter(outer.mk())
            .agg(
              count(lit(1)).as("n_rows"),
              coalesce(max(when(p1.mk(),
                col("l_extendedprice").cast(DecimalType(28, 2)))), lit(0))
                .cast("double").as("agg"),
              countDistinct(when(p2.mk(), col("l_partkey"))).cast("long").as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
    }
  }

  // --------------------------------------------------------- public API

  /** The full generated set — a pure function of [[seed]]. */
  lazy val cases: Seq[FuzzCase] = {
    val rng = new scala.util.Random(seed)
    val scans = (0 until nScan).map(i => scanCase(f"fzA$i%03d", rng))
    val groups = (0 until nGroup).map(i => groupCase(f"fzB$i%03d", rng))
    val tops = (0 until nTop).map(i => topCase(f"fzC$i%03d", rng))
    val joins = (0 until nJoin).map(i => joinCase(f"fzD$i%03d", rng))
    val wins = (0 until nWin).map(i => windowCase(f"fzE$i%03d", rng))
    val scalars = (0 until nScalar).map(i => scalarCase(f"fzF$i%03d", rng))
    val setops = (0 until nSetop).map(i => setopCase(f"fzG$i%03d", rng))
    val rollups = (0 until nRollup).map(i => rollupCase(f"fzH$i%03d", rng))
    val dates = (0 until nDate).map(i => dateCase(f"fzI$i%03d", rng))
    val nulls = (0 until nNull).map(i => nullCase(f"fzJ$i%03d", rng))
    val strs = (0 until nStr).map(i => strCase(f"fzK$i%03d", rng))
    val deccorrs = (0 until nDecCorr).map(i =>
      if (i % 2 == 0) decimalCase(f"fzL$i%03d", rng) else correlCase(f"fzL$i%03d", rng))
    val laterals = (0 until nLateral).map(i => lateralCase(f"fzM$i%03d", rng))
    val filters = (0 until nFilter).map(i => filterCase(f"fzN$i%03d", rng))
    // variant by index, not by draw: every frame shape gets 4 cases
    val frames = (0 until nFrame).map(i => frameCase(f"fzO$i%03d", rng, i % 5))
    scans ++ groups ++ tops ++ joins ++ wins ++ scalars ++ setops ++ rollups ++ dates ++ nulls ++ strs ++ deccorrs ++ laterals ++ filters ++ frames
  }

  /** Family P — the registered graft SQL functions (GraftExtensions),
    * fuzzed through `spark.sql` against their Column-API twins.
    *
    * Deliberately NOT part of [[cases]]/[[bundles]]: the native kernels
    * do not exist in DuckDB (each is value-oracled at the operator
    * level — q148 simhash_md5, q172 winnow, q183 gopher, q190 Luhn,
    * q187 html, …), so the differential here is front-end vs front-end:
    * SQL parse/resolution/codegen vs the Scala expression constructors.
    * Every double-valued kernel is rounded PER ROW to 6dp and scaled to
    * BIGINT before the sum, so both programs aggregate exact integers
    * and the comparison is order-independent. Model-parameterized
    * cases (`fz_bpe`/`fz_nb`/`fz_lm`) resolve names FuzzSpec registers
    * on the fixture corpus before running the family.
    */
  lazy val sqlSurfaceCases: Seq[FuzzCase] = {
    val rng = new scala.util.Random(seed + 16)
    (0 until nSurface).map(i => surfaceCase(f"fzP$i%03d", rng, i % 20))
  }

  /** One family-P case (see [[sqlSurfaceCases]]). The SQL text uses
    * only function names GraftExtensions registers; the twin builds the
    * same tree through NativeExprs / the operator Column APIs, never
    * touching the parser. Summary shape matches every other family.
    */
  private def surfaceCase(id: String, rng: scala.util.Random, kind: Int): FuzzCase = {
    import org.apache.spark.sql.graft.NativeExprs
    // per-row 6dp fix-point of a double kernel, summed exactly
    def fix6Sql(e: String) = s"sum(CAST(round(($e) * 1000000, 0) AS BIGINT))"
    def fix6(c: Column) = sum(round(c * 1000000d, 0).cast("long"))
    def doc(pred: Frag,
            aggSql: String, auxSql: String,
            aggMk: () => Column, auxMk: () => Column): FuzzCase =
      FuzzCase(id, "documents",
        s"""SELECT '$id' AS fq, count(*) AS n_rows,
             CAST($aggSql AS DOUBLE) AS agg,
             $auxSql AS aux
           FROM documents WHERE ${pred.sql}""",
        ts => ts("documents").filter(pred.mk())
          .agg(
            count(lit(1)).as("n_rows"),
            aggMk().cast("double").as("agg"),
            auxMk().as("aux"))
          .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))

    kind match {
      case 0 => // SimHash pair: xxhash64 fingerprint + md5 twin halves
        val pred = docAtom(rng)
        doc(pred,
          "count(DISTINCT simhash(text))",
          "count(DISTINCT element_at(simhash_md5(text), 1))",
          () => countDistinct(graft.operators.Dedup.simHash(col("text"))),
          () => countDistinct(element_at(graft.operators.Dedup.simHashMd5(col("text")), 1)))
      case 1 => // shingle → minhash → band chain
        val pred = docAtom(rng)
        val w = 2 + rng.nextInt(3)
        val k = Seq(16, 32, 64)(rng.nextInt(3))
        val sd = 1 + rng.nextInt(100)
        val b = Seq(4, 8)(rng.nextInt(2))
        doc(pred,
          s"count(DISTINCT element_at(band_hashes(minhash_signature(shingle_hashes(text, $w), $k, $sd), $b), 1))",
          s"sum(size(shingle_hashes(text, $w)))",
          () => countDistinct(element_at(NativeExprs.bandHashes(
            NativeExprs.minhashSignature(NativeExprs.shingleHashes(col("text"), w), k, sd.toLong), b), 1)),
          () => sum(size(NativeExprs.shingleHashes(col("text"), w))))
      case 2 => // winnowing fingerprints
        val pred = docAtom(rng)
        val k = 4 + rng.nextInt(7)
        val w = 3 + rng.nextInt(4)
        doc(pred,
          s"sum(size(winnow_md5(text, $k, $w)))",
          s"count(DISTINCT element_at(winnow_md5(text, $k, $w), 1))",
          () => sum(size(NativeExprs.winnowMd5(col("text"), k, w))),
          () => countDistinct(element_at(NativeExprs.winnowMd5(col("text"), k, w), 1)))
      case 3 => // repetition ratio + text profile
        val pred = docAtom(rng)
        val n = 2 + rng.nextInt(3)
        doc(pred,
          fix6Sql(s"repetition_ratio(text, $n)"),
          "sum(text_profile(text).n_tokens)",
          () => fix6(NativeExprs.repetitionRatio(col("text"), n)),
          () => sum(NativeExprs.textProfile(col("text")).getField("n_tokens")))
      case 4 => // Gopher counters
        val pred = docAtom(rng)
        doc(pred,
          "sum(gopher_signals(text).word_chars)",
          "sum(gopher_signals(text).alpha_words)",
          () => sum(NativeExprs.gopherSignals(col("text")).getField("word_chars")),
          () => sum(NativeExprs.gopherSignals(col("text")).getField("alpha_words")))
      case 5 => // PII + Luhn card redaction
        val pred = docAtom(rng)
        doc(pred,
          "sum(length(redact_pii(text)))",
          "sum(length(redact_cards(text)))",
          () => sum(length(graft.operators.TextAnalysis.redactPii(col("text")))),
          () => sum(length(graft.operators.TextAnalysis.redactCards(col("text")))))
      case 6 => // mojibake score + md5 fingerprint
        val pred = docAtom(rng)
        doc(pred,
          fix6Sql("encoding_noise(text)"),
          "count(DISTINCT md5_fingerprint(text))",
          () => fix6(graft.operators.TextAnalysis.encodingNoiseScore(col("text"))),
          () => countDistinct(graft.operators.TextAnalysis.md5Fingerprint(col("text"))))
      case 7 => // HTML extraction (prose in, prose out — still the full pipeline)
        val pred = docAtom(rng)
        doc(pred,
          "sum(length(html_text(text)))",
          "sum(length(html_title(text)))",
          () => sum(length(graft.operators.HtmlText.extractText(col("text")))),
          () => sum(length(graft.operators.HtmlText.extractTitle(col("text")))))
      case 8 => // vector kernels over embeddings
        val pred = modAtom("vec_id", rng)
        val p = 4 + rng.nextInt(13)
        val sd = 1 + rng.nextInt(100)
        FuzzCase(id, "embeddings",
          s"""SELECT '$id' AS fq, count(*) AS n_rows,
               CAST(${fix6Sql("l2_sq(embedding, reverse(embedding))")} AS DOUBLE) AS agg,
               count(DISTINCT hyperplane_sig(embedding, 64, $p, $sd)) AS aux
             FROM embeddings WHERE ${pred.sql}""",
          ts => ts("embeddings").filter(pred.mk())
            .agg(
              count(lit(1)).as("n_rows"),
              fix6(NativeExprs.l2Sq(col("embedding"), reverse(col("embedding"))))
                .cast("double").as("agg"),
              countDistinct(NativeExprs.hyperplaneSig(col("embedding"),
                graft.functions.VectorFunctions.randomPlanes(64, p, sd.toLong))).as("aux"))
            .select(lit(id).as("fq"), col("n_rows"), col("agg"), col("aux")))
      case 9 => // named models: LM score + BPE encode
        val pred = docAtom(rng)
        doc(pred,
          fix6Sql("lm_score(text, 'fz_lm')"),
          "sum(size(bpe_encode(text, 'fz_bpe')))",
          () => fix6(graft.functions.GraftModels.resolve("fz_lm", "lm")(col("text"))),
          () => sum(size(graft.functions.GraftModels.resolve("fz_bpe", "bpe")(col("text")))))
      case 10 => // named NB model + KMV bottom-k aggregate
        val pred = docAtom(rng)
        val k = Seq(8, 16, 32)(rng.nextInt(3))
        doc(pred,
          "count(DISTINCT nb_score(text, 'fz_nb').pred)",
          s"element_at(bottom_k(doc_id, $k), 1)",
          () => countDistinct(
            graft.functions.GraftModels.resolve("fz_nb", "nb")(col("text")).getField("pred")),
          () => element_at(graft.functions.BottomKSketch.sketch(col("doc_id"), k), 1))
      case 11 => // bounded top-k + bloom bitset aggregates
        val pred = docAtom(rng)
        val k = 2 + rng.nextInt(5)
        doc(pred,
          s"element_at(top_k_by_score(doc_id, CAST(n_chars AS DOUBLE), $k), 1).id",
          "aggregate(bloom_sketch(lang, 256), CAST(0 AS BIGINT), (a, x) -> a + bit_count(x))",
          () => element_at(graft.functions.TopKByScore.topK(
            col("doc_id"), col("n_chars").cast("double"), k), 1).getField("id"),
          () => aggregate(
            graft.functions.BloomSketch.sketch(col("lang"), 256),
            lit(0L), (a, x) => a + bit_count(x)))
      case 12 => // BPE id round trip through the multi-kind named model
        val pred = docAtom(rng)
        def ids(c: Column) =
          graft.functions.GraftModels.resolve("fz_bpe", "bpe_ids")(c)
        doc(pred,
          "sum(size(bpe_encode_ids(text, 'fz_bpe')))",
          "sum(length(bpe_decode(bpe_encode_ids(text, 'fz_bpe'), 'fz_bpe')))",
          () => sum(size(ids(col("text")))),
          () => sum(length(
            graft.functions.GraftModels.resolve("fz_bpe", "bpe_decode")(ids(col("text"))))))
      case 13 => // mojibake repair: ghost injection must round-trip away
        val pred = docAtom(rng)
        // ghost of U+00E9 appended in SQL via chr(); the repair must
        // shrink each injected pair to one char, so the length sum
        // pins the whole inverse-map + strict-decode path through both
        // front ends (text itself is ASCII: repair is the identity on
        // the base, the delta is exactly one char per injection).
        doc(pred,
          "sum(length(fix_mojibake(text || chr(195) || chr(169) || ' x')))",
          "count(DISTINCT md5(fix_mojibake(chr(226) || chr(8364) || chr(8482) || text)))",
          () => sum(length(NativeExprs.fixMojibake(
            concat(col("text"), lit("\u00C3\u00A9"), lit(" x"))))),
          () => countDistinct(md5(NativeExprs.fixMojibake(
            concat(lit("\u00E2\u20AC\u2122"), col("text"))))))

      case 14 => // script profile: struct-field access through both front ends
        val pred = docAtom(rng)
        doc(pred,
          "sum(script_profile(text).n_latin + script_profile(text).n_space)",
          "max(script_profile(text).n_digit * 10 + script_profile(text).n_other)",
          () => sum(NativeExprs.scriptProfile(col("text")).getField("n_latin") +
            NativeExprs.scriptProfile(col("text")).getField("n_space")),
          () => max(NativeExprs.scriptProfile(col("text")).getField("n_digit") * 10 +
            NativeExprs.scriptProfile(col("text")).getField("n_other")))

      case 17 => // fixed-point vector kernels: quant_dot + vec_moments
        val pred = docAtom(rng)
        val bits = 4 + rng.nextInt(8)
        val scale = (1L << bits).toDouble
        // quant_dot values are exact multiples of 0.5 (floor(x·2^b)·{.5,2})
        // and sums stay far below 2^53, so the double sum is exact and
        // order-independent — no fix6 needed
        doc(pred,
          s"sum(quant_dot(array(CAST(n_chars AS DOUBLE), CAST(length(lang) AS DOUBLE)), " +
            s"array(0.5D, 2.0D), CAST($scale AS DOUBLE)))",
          s"element_at(vec_moments(array(CAST(n_chars AS DOUBLE)), 1, $bits).sums, 1)",
          () => sum(NativeExprs.quantDot(
            array(col("n_chars").cast("double"), length(col("lang")).cast("double")),
            Array(0.5, 2.0), scale)),
          () => element_at(
            graft.functions.VectorMoments.agg(
              array(col("n_chars").cast("double")), 1, bits).getField("sums"), 1))

      case 18 => // outlink harvest + href resolution (the q275 chain)
        val pred = docAtom(rng)
        doc(pred,
          "sum(size(html_links('<a href=\"/a\">x</a><a href=\"' || lang || '\">y</a>')))",
          "count(DISTINCT resolve_href('https://' || source || '.example.com/p/q', lang))",
          () => sum(size(graft.operators.HtmlText.extractLinks(
            concat(lit("<a href=\"/a\">x</a><a href=\""), col("lang"), lit("\">y</a>"))))),
          () => countDistinct(graft.operators.WebOps.resolveHref(
            concat(lit("https://"), col("source"), lit(".example.com/p/q")),
            col("lang"))))
      case 19 => // unigram named model: encode + id round trip
        val pred = docAtom(rng)
        def uids(c: Column) =
          graft.functions.GraftModels.resolve("fz_uni", "unigram_ids")(c)
        doc(pred,
          "sum(size(unigram_encode(text, 'fz_uni')))",
          "sum(length(unigram_decode(unigram_encode_ids(text, 'fz_uni'), 'fz_uni')))",
          () => sum(size(
            graft.functions.GraftModels.resolve("fz_uni", "unigram")(col("text")))),
          () => sum(length(
            graft.functions.GraftModels.resolve("fz_uni", "unigram_decode")(uids(col("text"))))))
      case 16 => // one-permutation signature + 1-bit sketch chain
        val pred = docAtom(rng)
        val w = 2 + rng.nextInt(3)
        val k = Seq(64, 128)(rng.nextInt(2))
        val sd = 1 + rng.nextInt(100)
        doc(pred,
          s"count(DISTINCT element_at(oneperm_signature(shingle_hashes(text, $w), $k, $sd), 1))",
          s"sum(aggregate(one_bit_minhash(minhash_signature(shingle_hashes(text, $w), $k, $sd)), CAST(0 AS BIGINT), (a, x) -> a + bit_count(x)))",
          () => countDistinct(element_at(NativeExprs.onepermSignature(
            NativeExprs.shingleHashes(col("text"), w), k, sd.toLong), 1)),
          () => sum(aggregate(NativeExprs.oneBitMinHash(
            NativeExprs.minhashSignature(NativeExprs.shingleHashes(col("text"), w), k, sd.toLong)),
            lit(0L), (a, x) => a + bit_count(x))))
      case _ => // banded levenshtein: in-cap values exact, -1 ≡ over-cap
        val pred = docAtom(rng)
        val cap = 3 + rng.nextInt(8)
        def lw(a: Column, b: Column) =
          org.apache.spark.sql.graft.NativeExprs.levWithin(a, b, lit(cap))
        doc(pred,
          // the CASE folds the -1 sentinel back through the BUILT-IN
          // levenshtein, so the sum equals sum(levenshtein(..)) iff the
          // band's within/over split is exactly right on every row
          s"""sum(CASE WHEN lev_within(lang, reverse(lang), $cap) = -1
                  THEN levenshtein(lang, reverse(lang))
                  ELSE lev_within(lang, reverse(lang), $cap) END)""",
          s"count(DISTINCT lev_within(substr(text, 1, 24), substr(text, 5, 24), $cap))",
          () => sum(
            when(lw(col("lang"), reverse(col("lang"))) === -1,
              levenshtein(col("lang"), reverse(col("lang"))))
              .otherwise(lw(col("lang"), reverse(col("lang"))))),
          () => countDistinct(
            lw(substring(col("text"), 1, 24), substring(col("text"), 5, 24))))
    }
  }

  /** Declared bundles, one per family: each is a UNION ALL of its cases'
    * summary rows, totally ordered by case id. The same text serves as
    * the Spark query AND the DuckDB oracle (dialect-neutral subset).
    */
  lazy val bundles: Seq[(String, Seq[FuzzCase])] = Seq(
    "q120_fuzz_scan" -> cases.filter(_.id.startsWith("fzA")),
    "q121_fuzz_groupagg" -> cases.filter(_.id.startsWith("fzB")),
    "q122_fuzz_toplimit" -> cases.filter(_.id.startsWith("fzC")),
    "q123_fuzz_join" -> cases.filter(_.id.startsWith("fzD")),
    "q124_fuzz_window" -> cases.filter(_.id.startsWith("fzE")),
    "q125_fuzz_scalar" -> cases.filter(_.id.startsWith("fzF")),
    "q126_fuzz_setop_exists" -> cases.filter(_.id.startsWith("fzG")),
    "q127_fuzz_rollup" -> cases.filter(_.id.startsWith("fzH")),
    "q128_fuzz_datetime" -> cases.filter(_.id.startsWith("fzI")),
    "q129_fuzz_null_semantics" -> cases.filter(_.id.startsWith("fzJ")),
    "q133_fuzz_string_text" -> cases.filter(_.id.startsWith("fzK")),
    "q143_fuzz_decimal_correlated" -> cases.filter(_.id.startsWith("fzL")),
    "q162_fuzz_lateral" -> cases.filter(_.id.startsWith("fzM")),
    "q167_fuzz_filter_agg" -> cases.filter(_.id.startsWith("fzN")),
    "q189_fuzz_frames" -> cases.filter(_.id.startsWith("fzO")))

  def bundleSql(cs: Seq[FuzzCase]): String =
    cs.map(c => s"(${c.sql})").mkString(
      "SELECT * FROM (\n", "\nUNION ALL\n", "\n) __all ORDER BY fq")
}
