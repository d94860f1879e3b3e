package graft.queries

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE deterministic train/val/test assignment — one rule, one place.
  * Every split-aware operator (`deterministic_split`,
  * `split_contamination`, `semantic_decontam`) and every corresponding
  * DuckDB oracle derives the assignment from here, so the alignment the
  * decontamination operators' correctness depends on ("the same rule as
  * deterministic_split") cannot drift copy by copy.
  *
  * The rule: first two hex chars of md5("split:" + id) bucket the id into
  * test (< 0x1a ≈ 10%), val (< 0x34 ≈ 10%), train (rest) — a pure
  * function of the id, so any worker on any cluster at any time assigns
  * identically (no RNG, no sampleBy). */
object SplitRule {
  /** Engine form: the split of an id column. */
  def of(id: Column): Column = {
    val h2 = substring(
      md5(concat(lit("split:"), id.cast("string")).cast("binary")), 1, 2)
    when(h2 < "1a", "test").when(h2 < "34", "val").otherwise("train")
  }

  /** Oracle form: the identical rule as a DuckDB SQL expression. */
  def sql(idExpr: String): String =
    s"CASE WHEN substring(md5('split:' || CAST($idExpr AS VARCHAR)), 1, 2) < '1a' THEN 'test' " +
      s"WHEN substring(md5('split:' || CAST($idExpr AS VARCHAR)), 1, 2) < '34' THEN 'val' " +
      "ELSE 'train' END"
}
