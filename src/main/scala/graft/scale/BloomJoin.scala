package graft.scale

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal, XxHash64}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.BinaryType

/** Bloom-filter semi-join reduction — the join-pruning shape that matters
  * at 100 TB: when a fact table joins a selective dimension, ship a few
  * megabytes of bloom filter to every fact scan task instead of shuffling
  * every fact row to discover most of them match nothing. The surviving
  * ~(selectivity + fpp) fraction then pays the exact semi join, so the
  * result is EXACT — false positives only cost work, never wrong rows —
  * which is what keeps the declared query DuckDB-oracle-checkable.
  *
  * Built from Spark's own runtime-filter machinery
  * (`BloomFilterAggregate` / `BloomFilterMightContain`, the expressions
  * AQE's InjectRuntimeFilter plants), exposed as an explicit operator:
  * AQE only injects when its cost heuristics fire and only below shuffle
  * joins; a pipeline author sometimes knows better (e.g. pruning a scan
  * feeding an expensive UDF stage, or a pre-aggregation). The probe is
  * codegen'd (`BloomFilterMightContain.doGenCode`), so the fact scan stays
  * inside whole-stage codegen.
  */
object BloomJoin {

  /** Serialized bloom filter over `key` of `dim` (one distributed
    * aggregation; partial filters OR-merge). `expectedItems` sizes the
    * filter — ~1 byte/item at the default false-positive target. */
  def buildBloom(dim: DataFrame, key: Column, expectedItems: Long): Array[Byte] = {
    val agg = new BloomFilterAggregate(
      new XxHash64(Seq(ColumnBridge.expression(key))), expectedItems)
    dim.select(ColumnBridge.column(agg.toAggregateExpression()).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** Codegen'd membership probe against a built filter. NULL keys probe
    * NULL (never match), matching semi-join semantics for null keys. */
  def mightContain(bloom: Array[Byte], key: Column): Column =
    ColumnBridge.column(BloomFilterMightContain(
      Literal(bloom, BinaryType),
      new XxHash64(Seq(ColumnBridge.expression(key)))))

  /** Exact semi join of `fact` to `dim`, bloom-pruned: fact rows failing
    * the probe never reach the join shuffle. Returns fact rows with at
    * least one dim match — identical to a plain left-semi join.
    *
    * The probe key is cast to the BUILD key's type before hashing:
    * XxHash64 hashes an int 5 and a long 5 differently, so a type
    * mismatch between fact and dim keys would otherwise drop TRUE matches
    * at the probe — a silent wrong-rows bug the exact join can't repair. */
  def prunedSemiJoin(fact: DataFrame, dim: DataFrame,
      factKey: String, dimKey: String, expectedItems: Long = 1L << 20): DataFrame = {
    val dimType = dim.schema(dimKey).dataType
    val factK =
      if (fact.schema(factKey).dataType == dimType) fact(factKey)
      else fact(factKey).try_cast(dimType) // null on failure, even under ANSI
    val bloom = buildBloom(dim, dim(dimKey), expectedItems)
    // null-safe probe: a null factK (a genuinely-null key, or a cast the
    // join's own coercion might still match, e.g. string '5.0' vs int)
    // passes through unpruned — the exact join decides it. Anything else
    // would drop rows the plain semi join keeps.
    fact.filter(factK.isNull || mightContain(bloom, factK))
      .join(dim, fact(factKey) === dim(dimKey), "left_semi")
  }
}
