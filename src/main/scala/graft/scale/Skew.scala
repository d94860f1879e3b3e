package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resistant aggregation: two-phase (salted partial → final) groupBy.
  *
  * At 100 TB a groupBy on a hot key (one tenant, one language, one label)
  * concentrates a partition on one task. Salting splits each key into
  * `buckets` sub-keys for the wide partial aggregation, then reduces the
  * per-(key, salt) partials — the second shuffle carries keys × buckets
  * rows, not data rows. AQE's skew handling covers joins; this covers
  * aggregations whose partials are algebraic.
  *
  * The salt is derived (hash of a row id), not random, so results are
  * deterministic and oracle-checkable.
  */
object Skew {

  /** Exact double sum + count per key, computed through a salted partial
    * phase. `sumExpr` must be a decimal-cast column for exactness. */
  def saltedSumCount(df: DataFrame, key: Column, saltSource: Column, sumExpr: Column,
      buckets: Int = 8): DataFrame =
    df.groupBy(key.as("key"), pmod(hash(saltSource), lit(buckets)).as("salt"))
      .agg(sum(sumExpr).as("psum"), count(lit(1)).as("pcnt"))
      .groupBy(col("key"))
      .agg(sum(col("psum")).as("sum"), sum(col("pcnt")).as("n"))
}
