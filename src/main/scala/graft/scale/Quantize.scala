package graft.scale

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Per-vector 8-bit scalar quantization (SQ8) for embedding storage — the
  * standard 4× storage/IO cut for vector corpora at 100 TB scale (a
  * float32 corpus of 25 TB becomes ~6 TB of int8 codes + 2 floats of
  * scale metadata per vector). Each vector is affinely mapped onto
  * 0..255 by its own (min, max); search decodes approximate values and
  * reranks — recall loss is bounded by the per-dimension step
  * (max-min)/255.
  *
  * All arithmetic is double-typed with a fixed op order
  * (`vmin + round((x - vmin)·255/(vmax - vmin))·(vmax - vmin)/255`), so a
  * DuckDB oracle reproduces the decode bit-for-bit and quantized queries
  * stay hash-checkable. HOF (`transform`) based: quantization is a
  * map-only pass, no shuffle at any scale.
  */
object Quantize {

  /** int8 codes (as int array) for an `array<float>` column. */
  def sq8Codes(vec: Column): Column = {
    val vmin = array_min(vec).cast("double")
    val vmax = array_max(vec).cast("double")
    when(vmax === vmin, transform(vec, _ => lit(0)))
      .otherwise(transform(vec,
        x => round((x.cast("double") - vmin) * lit(255.0) / (vmax - vmin)).cast("int")))
  }

  /** 1-bit (binary/sign) quantization: 32 sign bits packed into one
    * BIGINT — dims [offset, offset+32) of an `array<float>` column, bit
    * i set iff the element is ≥ 0. A 64-dim float32 vector becomes two
    * longs: a 16× storage cut below even SQ8's 4×, and candidate
    * scoring collapses to `bit_count(xor)` — the binary-quantization
    * design modern vector stores ship for the first-pass shortlist
    * (rerank on exact floats recovers precision). The static literal
    * sum (no HOF, no shift-by-column) keeps the whole pack inside
    * whole-stage codegen and is reproduced term-for-term by a SQL
    * oracle. */
  def signBits(vec: Column, offset: Int): Column = {
    val bits = (0 until 32).map { i =>
      when(element_at(vec, offset + i + 1) >= 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ + _)
    // fail fast on null / too-short vectors (the Ivf kernel's contract):
    // element_at past the end returns NULL, NULL >= 0 falls to the
    // otherwise-branch, and the vector would silently pack as 0-bits —
    // hamming-matching everything instead of raising. assert_true
    // returns NULL on pass; coalesce keeps it in the plan.
    coalesce(
      assert_true(vec.isNotNull && size(vec) >= lit(offset + 32),
        lit(s"sign-bit pack needs >= ${offset + 32} dims")).cast("long"),
      bits)
  }

  /** Hamming distance between two (lo, hi) bit-packed vectors. */
  def hamming(aLo: Column, aHi: Column, bLo: Column, bHi: Column): Column =
    bit_count(aLo.bitwiseXOR(bLo)) + bit_count(aHi.bitwiseXOR(bHi))

  /** Decoded (approximate, double) values for a vector quantized by its
    * own min/max — the exact arithmetic the oracle mirrors. Fused
    * encode+decode of the raw vector: `sq8Decode(v) ≡ decode(sq8Codes(v))`
    * without materializing codes. */
  def sq8Roundtrip(vec: Column): Column = {
    val vmin = array_min(vec).cast("double")
    val vmax = array_max(vec).cast("double")
    when(vmax === vmin, transform(vec, x => x.cast("double")))
      .otherwise(transform(vec,
        x => vmin + round((x.cast("double") - vmin) * lit(255.0) / (vmax - vmin)) *
          (vmax - vmin) / lit(255.0)))
  }
}
