package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot join keys: salting.
  *
  * AQE's skew-join split (on by default in GraftSession) handles most skew
  * at runtime; salting is the explicit plan-level fallback for pathological
  * keys (one key ≫ a partition): replicate the build side `salt` ways and
  * scatter the probe side uniformly, so the hot key's rows spread across
  * `salt` tasks instead of one straggler.
  *
  * Contract: exact same join result as the unsalted equi-join (spec-checked).
  */
object Skew {

  /** Inner equi-join of `probe` (large, possibly skewed on `probeKey`)
    * against `build` (smaller), salted `salt` ways. */
  def saltedJoin(probe: DataFrame, build: DataFrame,
      probeKey: String, buildKey: String, salt: Int): DataFrame = {
    // probe rows get a random-but-deterministic salt from a row hash;
    // build rows are replicated across every salt value.
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(col(probeKey), monotonically_increasing_id()), lit(salt)))
    val exploded = build
      .withColumn("_salt", explode(sequence(lit(0L), lit(salt - 1L))))
    salted.join(exploded,
        salted(probeKey) === exploded(buildKey) &&
          salted("_salt") === exploded("_salt"))
      .drop("_salt")
  }
}
