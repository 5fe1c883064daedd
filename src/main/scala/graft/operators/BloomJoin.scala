package graft.operators

import java.io.ByteArrayOutputStream

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.functions.expressions.GraftFunctions

/** Bloom-filter join pruning: filter a huge fact table down to
  * probably-matching rows BEFORE the join's shuffle, using a compact
  * bloom filter built over the (already filtered) dimension keys.
  *
  * Scale shape, mirroring Spark's own `InjectRuntimeFilter` rewrite but
  * as an explicit deterministic operator:
  *  1. the dim side tree-aggregates a bloom filter over its join keys
  *     (`df.stat.bloomFilter` — distributed build, driver merges; at
  *     fpp=1% the filter is ~1.2 bytes/key, so 10^8 dim keys ≈ 120 MB
  *     and 10^6 ≈ 1.2 MB);
  *  2. the serialized filter ships to executors as a plan reference and
  *     probes inside whole-stage codegen AT THE SCAN, so fact rows that
  *     cannot join are dropped before any exchange;
  *  3. an exact semi-join on the survivors removes bloom false
  *     positives — the final result is EXACT, the bloom pass only cuts
  *     pre-shuffle volume (at fpp=0.01, the shuffle carries ~1% noise
  *     over the true matches instead of the full fact table).
  *
  * Reference analog: the driver-side "fetch existing, then probe before
  * sync" pattern (REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1709-1754)
  * is this operator's degenerate single-node form.
  */
object BloomJoin {

  /** Exact semi-join of `fact` against `dim` keys, bloom-pruned before
    * the shuffle. Keys must be integral (cast to long for the probe). */
  def semiJoin(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey)).where(col(dimKey).isNotNull)
    val bf = keys.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    val pruned = fact.filter(
      GraftFunctions.bloomContains(col(factKey), bos.toByteArray))
    pruned.join(keys, pruned(factKey) === keys(dimKey), "left_semi")
  }

  /** The bloom-pruned fact rows WITHOUT the exactness join — the raw
    * prefilter (may contain ~fpp false positives). Exposed so tests can
    * assert the pre-shuffle reduction the bloom pass achieves. */
  def prefilter(
      fact: DataFrame, factKey: String,
      dim: DataFrame, dimKey: String,
      expectedItems: Long = 1L << 20,
      fpp: Double = 0.01): DataFrame = {
    val keys = dim.select(col(dimKey)).where(col(dimKey).isNotNull)
    val bf = keys.stat.bloomFilter(dimKey, expectedItems, fpp)
    val bos = new ByteArrayOutputStream()
    bf.writeTo(bos)
    fact.filter(GraftFunctions.bloomContains(col(factKey), bos.toByteArray))
  }
}
