package graft.functions

import org.apache.spark.sql.Column

/** Named-model registry bridging TRAINED state onto the SQL surface.
  *
  * The engine's model-parameterized kernels (BPE merge ranks, the NB
  * micro-model, the char-ngram LM, a bloom bitset) are `Column =>
  * Column` closures over a broadcast — trivially composable from Scala
  * but unreachable from `spark.sql(...)`, which is the reference's one
  * public query language (`config/data_lake_config.json:4`). This
  * registry gives each trained closure a NAME; the matching SQL
  * functions (`bpe_encode(text, 'name')`, `nb_score(text, 'name')`,
  * `lm_score(text, 'name')` — GraftExtensions) resolve the name at
  * ANALYSIS time and splice in exactly the expression tree the Scala
  * API would build, so there is one semantics per kernel, not two.
  *
  * Registration helpers live next to the trainers (`Bpe.registerSql`,
  * `Classify.registerSql`, `TextAnalysis.registerLmSql`) so the
  * operator layer owns model construction and this object stays a plain
  * name → closure map. Scope is the application (same lifetime as the
  * broadcasts the closures capture); names are small in number —
  * model-like state, never data.
  *
  * The `kind` tag keeps the SQL surface honest: `nb_score(text,
  * 'my_bpe')` is a resolution-time error, not a silent apply of the
  * wrong kernel.
  */
object GraftModels {

  final case class Entry(kind: String, fn: Column => Column)

  private val registry = new java.util.concurrent.ConcurrentHashMap[String, Entry]()

  /** Register (or replace) a named scorer of the given kind. */
  def register(name: String, kind: String, fn: Column => Column): Unit = {
    require(name.nonEmpty, "model name must be non-empty")
    registry.put(name, Entry(kind, fn))
  }

  def drop(name: String): Unit = registry.remove(name)

  /** Registered (name, kind) pairs, name-ordered. */
  def registered: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    registry.asScala.toSeq.map { case (n, e) => (n, e.kind) }.sortBy(_._1)
  }

  /** Resolve a name for a SQL builder; the error text lists what IS
    * registered because the caller is inside query analysis with no
    * stack worth reading.
    */
  def resolve(name: String, kind: String): Column => Column = {
    val e = registry.get(name)
    if (e == null)
      throw new IllegalArgumentException(
        s"no registered graft model '$name'; registered: " +
          registered.map { case (n, k) => s"$n($k)" }.mkString("[", ", ", "]"))
    require(e.kind == kind,
      s"registered model '$name' has kind '${e.kind}', not '$kind'")
    e.fn
  }
}
