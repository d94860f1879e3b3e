package graft.core

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression

/** SQL registration of the graft kernels, so the engine's surface is
  * reachable from `spark.sql(...)` as well as the Column API:
  *
  *   SELECT vec_squared_l2(a.embedding, b.embedding) FROM ...
  *
  * Two bindings, one builder table: [[GraftExtensions]] injects these at
  * session build (`spark.sql.extensions`); `register` adds them to an
  * already-built session. Idempotent; QueryModules call it defensively.
  */
object GraftFunctions {

  /** name → expression builder for every SQL-exposed kernel. */
  val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "vec_squared_l2" -> (exprs => FloatVecSquaredL2(exprs.head, exprs(1))),
    "vec_dot" -> (exprs => FloatVecDot(exprs.head, exprs(1))),
    "vec_cosine_sim" -> (exprs => FloatVecCosineSim(exprs.head, exprs(1))),
    "nfc_normalize" -> (exprs => NfcNormalize(exprs.head)),
    "jaro_winkler" -> (exprs => JaroWinkler(exprs.head, exprs(1))),
    "holt_linear_fold" -> (exprs => HoltLinearTrajectory(exprs.head)),
    "holt_winters_fold" -> (exprs => HoltWintersTrajectory(exprs.head))
  )

  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, b) =>
      reg.createOrReplaceTempFunction(name, b, "scala_udf")
    }
  }
}
