package graft.scale

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT set-similarity self-join via prefix filtering — the AllPairs /
  * PPJoin family (Bayardo et al., WWW'07; Xiao et al., WWW'08), the
  * deterministic sibling of the MinHash screen: where MinHash trades
  * recall for cost, prefix filtering keeps 100% recall and prunes with
  * an inequality that is provably safe.
  *
  * Reference scope: the reference has no set-similarity operator; this is
  * a SURVEY §2.3 training-data-pipeline extension (dedup family) — the
  * algorithm production systems reach for when a legal/contractual
  * setting ("remove EVERY pair above t", e.g. benchmark decontamination)
  * forbids probabilistic misses.
  *
  * Shape: one groupBy builds element document-frequency; one join
  * annotates each (record, element) with its df; one groupBy per record
  * sorts its elements by GLOBAL RARITY (df asc, element asc — a total
  * order that needs no materialized global rank: the per-record sort is
  * map-side work after the df join, and the join key stays the element
  * itself) and emits only the first `n - ceil(t·n) + 1` elements — the
  * prefix. Candidates are the equi-join of prefixes with the size filter
  * `t·max(na,nb) ≤ min(na,nb)` folded into the join condition;
  * verification counts true intersections for candidate pairs only.
  *
  * Completeness: J(a,b) ≥ t implies inter ≥ t·max(na,nb), so a record's
  * non-prefix tail (ceil(t·n) − 1 elements) is too short to contain the
  * whole intersection; the globally-first common element therefore lies
  * in BOTH prefixes and the equi-join surfaces the pair
  * (PrefixJoinSpec checks candidates ⊇ brute force on adversarial
  * orderings). The threshold compare is pure integer arithmetic
  * (`inter·tDen ≥ uni·tNum`) — no float epsilon anywhere.
  *
  * 100 TB shape: every stage is an element- or record-keyed shuffle —
  * no global sort, no driver state, no all-pairs anywhere. Rare elements
  * dominate prefixes by construction, so candidate groups are small; the
  * known hot spot (a rare-ish element shared by f records → f²/2
  * candidates) is bounded by the df-ascending order itself: an element
  * only pairs records for which it falls inside their prefix.
  */
object PrefixJoin {

  /** Word k-gram element frame (`doc_id`, `el`): distinct k-word shingles
    * per document, documents shorter than k words dropped (their set is
    * empty — no pair can include them). Generalizes
    * [[NearDup.shingles]]'s fixed 3-gram window. */
  def wordKGrams(docs: DataFrame, k: Int,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    docs
      .select(col(idCol).as("doc_id"), split(col(textCol), " ").as("__ws"))
      .filter(size(col("__ws")) >= k)
      .select(col("doc_id"),
        explode(transform(
          sequence(lit(0), size(col("__ws")) - k),
          i => concat_ws(" ", (1 to k).map(j => element_at(col("__ws"), i + j)): _*)))
          .as("el"))
      .distinct()
  }

  /** Shared scaffold for the prefix-filter family: the element frame
    * (normalized to `doc_id`, `sh`), the rarity-sorted record frame
    * (`doc_id`, `n`, `els`, `plen` = n − ceil(t·n) + 1), and the NARROW
    * exploded prefix frame (`doc_id`, `n`, `sh`).
    *
    * The element frame feeds several consumers (df count, record
    * roll-up, verify postings, sizes); callers pass a STORED frame
    * (ShingleStore — both in-repo call sites do), so each consumer is a
    * parquet re-scan, not an explode+distinct recompute, and nothing is
    * pinned in session memory across invocations. sort_array on
    * (df, sh) structs realizes the global rarity order per record
    * without materializing a dense rank. The prefix frame stays narrow
    * — carrying the full element arrays through the candidate shuffle
    * would move ~n× the bytes. */
  private def prefixFrames(elements: DataFrame, tNum: Int, tDen: Int)
      : (DataFrame, DataFrame) = {
    require(tNum > 0 && tNum <= tDen, s"threshold must be in (0,1], got $tNum/$tDen")
    val el = elements.select(col("doc_id"), col("el").as("sh"))
    val dfreq = el.groupBy(col("sh")).agg(count(lit(1)).as("df"))
    val prefixes = el.join(dfreq, "sh")
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("sorted"),
        count(lit(1)).as("n"))
      .withColumn("plen",
        expr(s"n - (($tNum * n + ${tDen - 1}) div $tDen) + 1"))
      .select(col("doc_id"), col("n"),
        explode(expr("slice(sorted.sh, 1, cast(plen as int))")).as("sh"))
    (el, prefixes)
  }

  /** PPJoin-style verification, PAIR-KEYED: each candidate (`a_id`,
    * `b_id`) rejoins the element posting frame on both ids and counts
    * matching elements — the NearDup.jaccardOnPairs shape. Every join
    * here is an ordinary doc_id- or (doc_id, sh)-keyed equi-join with NO
    * broadcast hint: AQE picks a broadcast when the frames are small
    * (fixture scale) and a shuffle hash join when the corpus outgrows
    * one — no driver-side build of anything that grows with the corpus.
    * The intermediate is |cand|·avg-set-size narrow rows, partial-
    * aggregated map-side before the pair shuffle. Candidates always
    * share ≥1 element (they came from an equi-join on a common element),
    * so the inner join loses no pair. Returns (`a_id`, `b_id`, `inter`,
    * `na`, `nb`). */
  private def verified(cand: DataFrame, el: DataFrame): DataFrame = {
    val sizes = el.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    cand
      .join(el.as("ea"), col("a_id") === col("ea.doc_id"))
      .join(el.as("eb"), col("b_id") === col("eb.doc_id") && col("ea.sh") === col("eb.sh"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("inter"))
      .join(sizes.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(sizes.as("sb"), col("b_id") === col("sb.doc_id"))
      .select(col("a_id"), col("b_id"), col("inter"),
        col("sa.n").as("na"), col("sb.n").as("nb"))
  }

  /** All ORDERED pairs (a, b), a ≠ b, with containment
    * |A∩B|/|A| ≥ tNum/tDen — the exact quote/subset screen (is most of
    * record a inside record b?), the deterministic sibling of the
    * bottom-k-sketch containment screen. Asymmetric prefix filtering:
    * containment bounds the intersection only relative to the PROBE
    * side (inter ≥ ceil(t·na)), so a emits its rarity-order prefix
    * while b — whose size the predicate does not constrain — stays a
    * full posting frame (the classic probe-prefix/index-full
    * decomposition). Verification and export are integer-exact.
    * Output: (`a_id`, `b_id`, `inter`, `na`). */
  def containmentSelfJoin(elements: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val (el, prefixes) = prefixFrames(elements, tNum, tDen)
    val cand = prefixes.as("a")
      .join(el.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") =!= col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    verified(cand, el)
      .select(col("a_id"), col("b_id"), col("inter"), col("na"))
      .filter(col("inter") * tDen >= col("na") * tNum)
  }

  /** All pairs with Jaccard ≥ tNum/tDen over `elements` (`doc_id`, `el`,
    * distinct). Output: (`a_id`, `b_id`, `inter`, `uni`) with a_id < b_id
    * — exact, 100% recall, threshold compared in integer arithmetic. */
  def jaccardSelfJoin(elements: DataFrame, tNum: Int, tDen: Int): DataFrame = {
    val (el, prefixes) = prefixFrames(elements, tNum, tDen)
    // size filter folded into the join: J ≥ t forces t·max ≤ min
    val cand = prefixes.as("a")
      .join(prefixes.as("b"),
        col("a.sh") === col("b.sh") && col("a.doc_id") < col("b.doc_id") &&
          lit(tNum) * greatest(col("a.n"), col("b.n")) <=
            lit(tDen) * least(col("a.n"), col("b.n")))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    verified(cand, el)
      .select(col("a_id"), col("b_id"), col("inter"),
        (col("na") + col("nb") - col("inter")).as("uni"))
      .filter(col("inter") * tDen >= col("uni") * tNum)
  }
}
