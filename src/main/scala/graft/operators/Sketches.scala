package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bottom-k (KMV) distinct-count sketches with exact, engine-portable
  * arithmetic.
  *
  * The sketch of a set is its k smallest DISTINCT 60-bit hash values
  * (md5 prefix). It is a commutative monoid — merge = union-then-trim —
  * so sketches of partitions/groups combine associatively, and the
  * distinct-count estimate is the classic KMV (k−1)·space/kth. Both the
  * sketch and the estimate are deterministic integers: unlike HLL
  * (q45's ±5%-bound gate), this sketch hash-matches an oracle exactly.
  *
  * The aggregation buffer is capped at k entries and dedupes on
  * insert, so map-side partial aggregation sends at most k values per
  * group per partition into the shuffle — the bounded-state shape that
  * makes sketching worthwhile at 100 TB (same discipline as
  * [[TopK.BoundedTopK]]).
  */
object Sketches {

  /** Keep the k smallest distinct longs. Buffer sorted ascending. */
  final class BottomKDistinct(k: Int)
      extends Aggregator[Long, Seq[Long], Seq[Long]] {
    def zero: Seq[Long] = Vector.empty
    def reduce(b: Seq[Long], a: Long): Seq[Long] =
      if (b.size >= k && a >= b.last) b
      else if (b.contains(a)) b
      else ((b :+ a).sorted).take(k)
    def merge(x: Seq[Long], y: Seq[Long]): Seq[Long] =
      (x ++ y).distinct.sorted.take(k)
    def finish(r: Seq[Long]): Seq[Long] = r
    def bufferEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
    def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** 60-bit hash: first 15 hex digits of md5 of the value's string
    * form — portable to any engine that has md5. */
  def hash60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Count-Min row bucket for a 60-bit hash: row r maps h to
    * ((h mod P)·(r+2) + r·12345) mod P mod width with P = 2³¹−1 —
    * overflow-safe 64-bit integer mixing ((h mod P) < 2³¹ times a
    * single-digit factor) that any engine reproduces exactly. */
  def cmBucket(h: Long, r: Int, width: Int): Int = {
    val P = 2147483647L
    // floorMod guards a caller passing a raw SIGNED hash: JVM % is
    // remainder (sign-preserving), so a negative h would otherwise
    // produce a negative bucket index. For the documented 60-bit
    // non-negative contract floorMod ≡ %, so existing oracles are
    // unchanged; the SQL replay uses pmod for the same reason.
    ((java.lang.Math.floorMod(h, P) * (r + 2) + r * 12345L) % P % width).toInt
  }

  /** Count-Min sketch: a depth×width matrix of long counters, flat
    * row-major. Input is a (pre-hashed 60-bit value, weight) pair; a
    * raw occurrence stream uses weight 1, and a pre-aggregated
    * (value, frequency) stream uses the frequency — weighted inserts
    * land on the identical matrix, which is the smarter shape at
    * scale (aggregate first, sketch |distinct| rows, not |stream|).
    * The matrix is a commutative monoid under elementwise addition, so
    * map-side partial aggregation ships depth·width longs per
    * partition — constant-size state regardless of input size, the
    * third classic sketch beside HLL (q45) and KMV (q142). Estimates
    * (min over rows of the addressed counters) never under-count;
    * over-count is bounded by bucket collisions. Fully deterministic:
    * the same corpus always yields the same matrix in any engine. */
  final class CountMin(depth: Int, width: Int)
      extends Aggregator[(Long, Long), Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.ofDim[Long](depth * width)
    def reduce(b: Array[Long], in: (Long, Long)): Array[Long] = {
      val (h, w) = in
      var r = 0
      while (r < depth) {
        b(r * width + cmBucket(h, r, width)) += w
        r += 1
      }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  // ---- mergeable quantile sketch ------------------------------------------
  // HDR-histogram-style log-bucketed counts: bucket = the value's
  // exponent (bit length) plus its top `subBits` mantissa bits — pure
  // integer arithmetic, relative error ≤ 2^-subBits. The sketch is a
  // fixed 960-long counter vector and a PERFECT commutative monoid
  // under elementwise addition (same discipline as [[CountMin]]), which
  // is why it's the quantile sketch chosen here over KLL/t-digest:
  // those are sampling/centroid-based, so their content depends on
  // merge order — fine for tolerance-band answers, useless for a
  // hash-exact oracle and for bit-identical results at any parallelism.
  // Quantile answers are bucket lower bounds at ceil-rank targets —
  // deterministic integers an oracle rebuilds algebraically.

  /** Sub-mantissa bits: 16 sub-buckets per octave, ≤ 6.25 % rel. err. */
  val HdrSubBits = 4
  private val HdrSub = 1 << HdrSubBits // 16
  /** Buckets 0..31 are exact small values; 58 octaves × 16 above
    * (max idx = (63−5)·16 + 31 = 959 at bit length 63). */
  val HdrBuckets: Int = (64 - HdrSubBits - 2) * HdrSub + 2 * HdrSub // 960

  /** Bucket index of a non-negative value: v < 32 maps exactly to v;
    * otherwise (e−5)·16 + top-5-bits with e = bit length of v. */
  def hdrBucket(v: Long): Int = {
    require(v >= 0, s"hdrBucket: negative value $v")
    if (v < 2L * HdrSub) v.toInt
    else {
      val e = 64 - java.lang.Long.numberOfLeadingZeros(v) // bit length
      (e - HdrSubBits - 1) * HdrSub + (v >>> (e - HdrSubBits - 1)).toInt
    }
  }

  /** Smallest value in bucket `idx` — the deterministic quantile
    * answer. Inverse of [[hdrBucket]]. */
  def hdrLowerBound(idx: Int): Long =
    if (idx < 2 * HdrSub) idx.toLong
    else ((idx % HdrSub) + HdrSub).toLong << (idx / HdrSub - 1)

  /** The histogram aggregator: one counter vector per group, map-side
    * partial aggregation ships 960 longs per group per partition. */
  final class LogHist extends Aggregator[Long, Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.ofDim[Long](HdrBuckets)
    def reduce(b: Array[Long], v: Long): Array[Long] = {
      b(hdrBucket(v)) += 1; b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = {
      var i = 0
      while (i < x.length) { x(i) += y(i); i += 1 }
      x
    }
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Merge already-built histograms (the monoid's second stage — how a
    * '__all' rollup or a cross-day re-aggregation combines sketches
    * without touching raw data). */
  final class LogHistMerge
      extends Aggregator[Array[Long], Array[Long], Array[Long]] {
    def zero: Array[Long] = Array.ofDim[Long](HdrBuckets)
    def reduce(b: Array[Long], a: Array[Long]): Array[Long] = {
      var i = 0
      while (i < b.length) { b(i) += a(i); i += 1 }
      b
    }
    def merge(x: Array[Long], y: Array[Long]): Array[Long] = reduce(x, y)
    def finish(r: Array[Long]): Array[Long] = r
    def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    def outputEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  }

  /** Quantile answers from a histogram: for each q% the lower bound of
    * the bucket holding rank ceil(q·W/100) — all-integer, replayable
    * in any engine. */
  def hdrQuantiles(h: Array[Long], qs: Seq[Int]): Seq[Long] = {
    val w = h.sum
    qs.map { q =>
      val target = (q.toLong * w + 99L) / 100L // ceil rank
      var cum = 0L
      var i = 0
      var ans = 0L
      var found = false
      while (i < h.length && !found) {
        cum += h(i)
        if (cum >= target && target > 0) { ans = hdrLowerBound(i); found = true }
        i += 1
      }
      ans
    }
  }

  /** Per-group p50/p95/p99 via [[LogHist]], plus a merged '__all' row
    * built FROM the per-group sketches (never re-reading the data) —
    * the monoid proof, as in [[bottomKSketch]]. */
  def logHistQuantiles(spark: SparkSession, df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    import spark.implicits._
    val vals = df.select(col(groupCol).cast("string").as("g"),
      col(valueCol).cast("long").as("v")).as[(String, Long)]
    val sketches = vals.groupByKey(_._1).mapValues(_._2)
      .agg(new LogHist().toColumn.name("h")).toDF("g", "h")
    val merged = sketches.select(col("h")).as[Array[Long]]
      .groupByKey(_ => "__all").mapValues(identity)
      .agg(new LogHistMerge().toColumn.name("h")).toDF("g", "h")
    sketches.unionByName(merged).as[(String, Array[Long])]
      .map { case (g, h) =>
        val Seq(p50, p95, p99) = hdrQuantiles(h, Seq(50, 95, 99))
        (g, h.sum, p50, p95, p99)
      }
      .toDF(groupCol, "w", "p50_lb", "p95_lb", "p99_lb")
  }

  /** Per-group sketches plus a merged '__all' row proving the monoid:
    * (group, kth_hash, n_sketch, est_distinct). Estimate is the KMV
    * (k−1)·2³⁰ div (kth»30 + 1) — exact integer arithmetic,
    * overflow-safe (kth < 2⁶⁰); groups with fewer than k distinct
    * values report their exact size. */
  def bottomKSketch(spark: SparkSession, df: DataFrame, groupCol: String,
      valueCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val hashed = df.select(col(groupCol).cast("string").as("g"),
      hash60(col(valueCol)).as("h")).as[(String, Long)]
    val sketches = hashed.groupByKey(_._1).mapValues(_._2)
      .agg(new BottomKDistinct(k).toColumn.name("sk"))
      .toDF("g", "sk")
    val merged = sketches
      .select(explode(col("sk")).as("h"))
      .as[Long].groupByKey(_ => "__all").mapValues(identity)
      .agg(new BottomKDistinct(k).toColumn.name("sk"))
      .toDF("g", "sk")
    sketches.unionByName(merged)
      .withColumn("kth_hash",
        element_at(col("sk"), least(lit(k), size(col("sk")))))
      .withColumn("n_sketch", size(col("sk")).cast("long"))
      .withColumn("est_distinct",
        when(col("n_sketch") < k, col("n_sketch"))
          .otherwise(expr(
            s"(${k - 1}L * 1073741824L) div ((kth_hash div 1073741824L) + 1L)")))
      .select(col("g").as(groupCol), col("kth_hash"), col("n_sketch"),
        col("est_distinct"))
  }

  /** KMV set-operation estimates from two bottom-k sketches — union
    * size, intersection size, and Jaccard similarity of two key sets
    * WITHOUT ever joining them: each side is scanned once into a
    * k-value sketch, and every estimate is pure arithmetic on the two
    * k-sized arrays (Beyer et al., "On Synopses for Distinct-Value
    * Estimation Under Multiset Operations", SIGMOD'07):
    *
    *  - sketch(A ∪ B) = bottom-k of merged sketches (the KMV monoid),
    *  - ρ = |sketch(A∪B) ∩ sketch(A) ∩ sketch(B)| / |sketch(A∪B)|
    *    estimates Jaccard, and ρ · est(A∪B) the intersection size.
    *
    * At 100 TB this is two scans emitting k longs each; the exact
    * alternative is a full distinct + join of both key sets. All
    * outputs are deterministic integers (60-bit md5 hashes, integer
    * division), so the result hash-matches an oracle that replays the
    * same arithmetic — no tolerance band needed. Jaccard is emitted in
    * permille. Empty inputs yield an empty union sketch; callers feed
    * non-empty sets (the div-by-zero guard is the caller's contract,
    * as the oracle's `//` would abort rather than null). */
  def setOpSketch(spark: SparkSession, a: DataFrame, b: DataFrame,
      valueCol: String, k: Int): DataFrame = {
    import spark.implicits._
    def sketch(df: DataFrame, out: String): DataFrame =
      df.select(hash60(col(valueCol)).as("h")).as[Long]
        .groupByKey(_ => true).mapValues(identity)
        .agg(new BottomKDistinct(k).toColumn.name(out))
        .toDF("g", out).drop("g")
    sketch(a, "ska").crossJoin(sketch(b, "skb"))
      .selectExpr("ska", "skb",
        s"slice(array_sort(array_distinct(concat(ska, skb))), 1, $k) AS usk")
      .selectExpr(
        "cast(size(ska) as bigint) AS n_a",
        "element_at(ska, size(ska)) AS kth_a",
        "cast(size(skb) as bigint) AS n_b",
        "element_at(skb, size(skb)) AS kth_b",
        "cast(size(usk) as bigint) AS n_union_sketch",
        "element_at(usk, size(usk)) AS kth_u",
        "cast(size(array_intersect(array_intersect(usk, ska), skb)) as bigint)"
          + " AS inter_in_sketch")
      .selectExpr(
        estExpr("n_a", "kth_a", k) + " AS est_a",
        estExpr("n_b", "kth_b", k) + " AS est_b",
        estExpr("n_union_sketch", "kth_u", k) + " AS est_union",
        "n_union_sketch", "inter_in_sketch",
        "(inter_in_sketch * 1000) div n_union_sketch AS jacc_permille",
        s"(inter_in_sketch * ${estExpr("n_union_sketch", "kth_u", k)})"
          + " div n_union_sketch AS est_intersection")
  }

  /** The KMV estimator as an integer SQL fragment: exact size below k,
    * (k−1)·2³⁰ div (kth»30 + 1) at capacity. */
  private def estExpr(nCol: String, kthCol: String, k: Int): String =
    s"cast(CASE WHEN $nCol < $k THEN $nCol ELSE " +
      s"(${k - 1}L * 1073741824L) div (($kthCol div 1073741824L) + 1L) " +
      s"END as bigint)"
}
