package graft.core

import org.apache.spark.sql.SparkSession

/** SQL registration of the graft kernels, so the engine's surface is
  * reachable from `spark.sql(...)` as well as the Column API:
  *
  *   SELECT vec_squared_l2(a.embedding, b.embedding) FROM ...
  *
  * Idempotent; call once per session (QueryModules call it defensively).
  */
object GraftFunctions {
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "vec_squared_l2", exprs => FloatVecSquaredL2(exprs.head, exprs(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "vec_dot", exprs => FloatVecDot(exprs.head, exprs(1)), "scala_udf")
  }
}
