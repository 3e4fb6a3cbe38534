package graft.query

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Temp-view registration + SQL execution — reference `:104` and `:113`.
  *
  * `register` binds the DataFrame's LOGICAL PLAN AT CALL TIME: later
  * transformations on the same variable do not affect the view. The
  * reference depends on this (view registered before the age transform ⇒
  * SQL sees cleaned-but-untransformed data). We simply preserve Spark's
  * native semantics.
  */
object QueryRunner {

  def register(df: DataFrame, name: String): Unit =
    df.createOrReplaceTempView(name)

  /** Full Catalyst parse → analyze → optimize → execute. The engine's one
    * and only user-programmable query path (arbitrary Spark SQL).
    */
  def run(spark: SparkSession, sql: String): DataFrame =
    spark.sql(sql)
}
