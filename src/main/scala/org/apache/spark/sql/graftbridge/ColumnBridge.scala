package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge to the `private[sql]` Column ⇄ Expression converters —
  * the one hook a library needs to expose custom Catalyst expressions as
  * `Column`-returning functions in Spark 4.x (where `new Column(expr)` no
  * longer exists). Lives in an `org.apache.spark.sql` subpackage solely
  * for access; nothing else of Spark's internals is touched.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** A DataFrame over an arbitrary (analyzed) logical plan — the
    * `private[sql]` `Dataset.ofRows`. Lets plan-level tests re-execute a
    * SUBTREE of an optimized plan (e.g. measure a window operator's
    * actual input cardinality) without reconstructing the query. */
  def ofRows(spark: org.apache.spark.sql.SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The catalog's resolved storage location for a (future) managed
    * table — the authoritative path, replacing hand-parsed
    * `spark.sql.warehouse.dir` handling (which breaks on unencoded
    * special characters and non-file schemes). */
  def defaultTablePath(spark: org.apache.spark.sql.SparkSession,
      table: String): java.net.URI =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.catalog
      .defaultTablePath(org.apache.spark.sql.catalyst.TableIdentifier(table))

  /** V2 `Column` (carrying a `ColumnDefaultValue`) → `StructField` with
    * the CURRENT_DEFAULT/EXISTS_DEFAULT metadata the analyzer reads —
    * the exact conversion Spark's own `CREATE TABLE` path runs
    * (`private[sql]` CatalogV2Util), so an `ALTER TABLE ... ADD COLUMN
    * ... DEFAULT` records its default identically. */
  def v2ColumnToStructField(
      c: org.apache.spark.sql.connector.catalog.Column)
      : org.apache.spark.sql.types.StructField =
    org.apache.spark.sql.connector.catalog.CatalogV2Util
      .v2ColumnsToStructType(Array(c)).fields.head

  /** The session's stable unique id (`private[sql]` on the classic
    * implementation) — a collision-free memo key where
    * `System.identityHashCode` isn't (hash reuse after GC) and a weak
    * session key can't work (cached DataFrames strongly reference their
    * session). */
  def sessionUuid(spark: org.apache.spark.sql.SparkSession): String =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].sessionUUID
}
