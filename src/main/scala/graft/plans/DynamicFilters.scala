package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}

/** Dynamic filtering for selective semi joins — the runtime analogue of the
  * reference's TupleDomain pushdown (SPI/predicate/TupleDomain.java; the
  * planner narrows a scan's domain from predicates, and
  * MAIN/sql/planner/optimizations/MetadataQueryOptimizer.java +
  * IndexJoinOptimizer.java turn small-side lookups into scan constraints).
  * The same technique ships in modern engines as "dynamic filtering": run
  * the small (dimension) side first, turn its join keys into a scan-level
  * predicate on the fact side, and only fall back to a full join when the
  * domain is too large to ship.
  *
  * Why it matters at scale: a selective `fact.key IN (SELECT key FROM dim
  * WHERE …)` is statically un-plannable — the filter's selectivity is
  * invisible, so the fact side shuffles in FULL before the semi join prunes
  * it (measured at the sf30 soak: h02 shuffles 180 M rows / 6.2 GB to keep
  * 0.4%). Evaluating the dim side first (it is small by contract — that is
  * what makes the semi join selective) converts that to a map-side prune.
  *
  * Three tiers, chosen at runtime from the observed key count:
  *   1. `keys ≤ maxInKeys`: collect the distinct keys and apply
  *      `isin` — Catalyst compiles to an InSet hash lookup inside
  *      whole-stage codegen AND pushes to the parquet scan (an In/range
  *      PushedFilter ⇒ row-group stats can skip). Zero fact shuffle.
  *   2. `keys ≤ maxBroadcastKeys`: broadcast LEFT SEMI join — one
  *      executor-local hash probe per fact row, still zero fact shuffle.
  *   3. otherwise: plain shuffled semi join (the status-quo plan) — at
  *      100 TB a dim side this large is exactly where a shuffled join is
  *      the right call (and where Spark's own runtime bloom injection,
  *      which defaults to ≥10 GB application scans, takes over).
  *
  * Semantics: equivalent to `WHERE factKey IN (SELECT dimKey FROM dim)` in
  * a WHERE context — NULL fact keys and non-matches are both dropped (the
  * 3VL NULL-vs-false distinction is invisible to a filter), and NULL dim
  * keys never match, so they are excluded before the count. */
object DynamicFilters {

  def semiJoinPrune(
      fact: DataFrame,
      factKey: String,
      dim: DataFrame,
      dimKey: String,
      maxInKeys: Int = 131072,
      maxBroadcastKeys: Long = 4L * 1000 * 1000): DataFrame = {
    val keyDf = dim.select(col(dimKey)).where(col(dimKey).isNotNull).distinct()
    // probe one past the cap so "fits" vs "overflows" is decided exactly
    val head = keyDf.limit(maxInKeys + 1).collect().map(_.get(0))
    if (head.length <= maxInKeys) {
      fact.where(col(factKey).isin(head.toIndexedSeq: _*))
    } else {
      val keys = keyDf.withColumnRenamed(dimKey, factKey)
      if (keyDf.count() <= maxBroadcastKeys)
        fact.join(broadcast(keys), Seq(factKey), "left_semi")
      else
        fact.join(keys, Seq(factKey), "left_semi")
    }
  }
}
