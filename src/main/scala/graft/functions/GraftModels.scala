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

  // name → (kind → closure): ONE model name can carry several kinds —
  // a trained BPE registers both its encoder ('bpe') and its id decoder
  // ('bpe_decode') under the same name, so `bpe_encode(text, 'm')` and
  // `bpe_decode(ids, 'm')` round-trip through one registration.
  private val registry = new java.util.concurrent.ConcurrentHashMap[
    String, Map[String, Column => Column]]()

  /** Register (or replace) a named scorer of the given kind; other
    * kinds already registered under the name are preserved.
    */
  def register(name: String, kind: String, fn: Column => Column): Unit = {
    require(name.nonEmpty, "model name must be non-empty")
    registry.merge(name, Map(kind -> fn), (old, add) => old ++ add)
  }

  /** Drop every kind registered under the name. */
  def drop(name: String): Unit = registry.remove(name)

  /** Registered (name, kind) pairs, (name, kind)-ordered. */
  def registered: Seq[(String, String)] = {
    import scala.jdk.CollectionConverters._
    registry.asScala.toSeq
      .flatMap { case (n, ks) => ks.keys.map(n -> _) }.sorted
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
    e.getOrElse(kind, throw new IllegalArgumentException(
      s"registered model '$name' has kind ${e.keys.mkString("'", "'/'", "'")}, " +
        s"not '$kind'"))
  }
}
