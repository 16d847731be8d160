package graft.sources

import org.apache.parquet.filter2.predicate.{Statistics => PqStatistics, UserDefinedPredicate}

/** Parquet [[UserDefinedPredicate]] for a large IN key set over a column
  * the file is SORTED by — the page-skipping mechanism parquet's native
  * `Operators.In` does not provide: `ColumnIndexBuilder.ColumnIndexBase
  * .visit(In)` reduces a multi-value set to ONE `[min(set), max(set)]`
  * range intersection per page (bytecode-verified on parquet-column
  * 1.16.0), so a key set spread uniformly over the column domain skips
  * nothing while still paying the filtered-read machinery (measured on
  * h02 at sf100: scanTime 16.7 s → 528.7 s for 795 of 600 M rows
  * skipped). A UserDefinedPredicate instead gets `canDrop(pageStats)`
  * per page through the column index, so this class answers exactly:
  * "does [page.min, page.max] contain any probed key?" by binary search
  * over the sorted key array — O(log n) per page, no false drops.
  *
  * STATUS (round 16): DIAGNOSTIC ONLY — measured a net NEGATIVE on the
  * h02 shape and NOT shipped as an engine rule. tools.ScanProbe `udp`
  * mode measured, on the sf100 partkey-sorted layout rebuilt with
  * 2048-row pages, numOutputRows 599,996,388 of 600 M (0.0006% of rows
  * skipped) and a slower wall than the plain scan. The reason is
  * geometric, not an implementation defect: the layout is HASH-BUCKETED
  * (32 buckets), so each bucket file holds every 32nd key of the domain
  * and a 2048-row page (~68 in-bucket keys) spans ~68×32 ≈ 2,176 RAW key
  * values — at h02's probe density (72 k keys / 20 M domain = 0.36%) the
  * chance a page's [min,max] contains no probed key is e^(−2176×0.0036)
  * ≈ 0.04%. Min/max-granularity skipping cannot work on a hash-bucketed
  * layout at this density; only a range-partitioned layout (which would
  * forfeit the exchange-free bucketed aggregation the pk layout exists
  * for) changes the geometry. Kept with tools.ScanProbe as the evidence
  * for that conclusion (OPTIMIZATION_r16.md, h02 section). */
final class SortedLongInPredicate(val keys: Array[Long])
    extends UserDefinedPredicate[java.lang.Long] with Serializable {
  // keys must be sorted ascending and non-empty (caller sorts once)

  override def keep(value: java.lang.Long): Boolean =
    value != null && java.util.Arrays.binarySearch(keys, value.longValue()) >= 0

  override def canDrop(stats: PqStatistics[java.lang.Long]): Boolean = {
    val min = stats.getMin
    val max = stats.getMax
    if (min == null || max == null) return false // no stats: keep
    val i = java.util.Arrays.binarySearch(keys, min.longValue())
    if (i >= 0) return false // min itself is a probed key
    val ins = -i - 1
    ins == keys.length || keys(ins) > max.longValue()
  }

  // inverse (NOT IN) can never safely drop from min/max alone
  override def inverseCanDrop(stats: PqStatistics[java.lang.Long]): Boolean =
    false

  override def toString: String = s"graft_sorted_in(${keys.length} keys)"
}

object SortedInPredicate {
  import org.apache.parquet.filter2.predicate.{FilterApi, FilterPredicate}
  import org.apache.parquet.filter2.predicate.SparkFilterApi

  /** Build the parquet predicate for `column IN keys` (long/int key
    * domains; both are INT64/INT32 physical — int columns are probed
    * through the long API only when the parquet type is INT64, so int
    * layouts use the int column type). */
  def forLongColumn(column: String, keys: Array[Long]): FilterPredicate = {
    val sorted = keys.clone()
    java.util.Arrays.sort(sorted)
    FilterApi.userDefined(
      SparkFilterApi.longColumn(Array(column)),
      new SortedLongInPredicate(sorted))
  }

  /** Serialized form for the hadoop-conf relay
    * (`parquet.private.read.filter.predicate`): the exact encoding
    * parquet's own `ParquetInputFormat.setFilterPredicate` writes, so
    * `HadoopReadOptions` deserializes it on the executor side. */
  def toConfValue(pred: FilterPredicate): String = {
    val conf = new org.apache.hadoop.conf.Configuration(false)
    org.apache.parquet.hadoop.util.SerializationUtil.writeObjectToConfAsBase64(
      "graft.tmp.pred", pred, conf)
    conf.get("graft.tmp.pred")
  }

  val CONF_KEY = "parquet.private.read.filter.predicate"
}
