package graft.functions

import org.apache.spark.sql.SparkSession
import graft.plans.DotProduct

/** Registration of graft's native Catalyst expressions as SQL functions —
  * the public entry points go through `call_function`, which resolves
  * against the session registry (the supported route to a custom
  * `Expression` without touching private Column constructors). */
object GraftFunctions {

  /** Idempotently register graft's native functions on a session. */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        org.apache.spark.sql.catalyst.FunctionIdentifier("vec_dot"))) {
      registry.createOrReplaceTempFunction(
        "vec_dot", exprs => DotProduct(exprs(0), exprs(1)), "built-in")
      spark.udf.register("balance_stats",
        org.apache.spark.sql.functions.udaf(BalanceStatsAgg))
    }
  }
}
