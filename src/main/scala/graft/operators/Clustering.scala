package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd's algorithm) over an embedding column,
  * in fixed-point integer arithmetic so results are bit-exact across
  * engines: components quantize to `round(x·1e7)` longs, distances are
  * integer squared-L2, centroid updates are `floor(sum / n)` (the sum
  * stays ≤ ~1e10 per dimension, exactly representable in a double, so
  * the floor is deterministic).
  *
  * Scale shape: centroids are k·dim longs — always broadcast; each
  * Lloyd iteration is one broadcast-join assignment pass over the
  * vectors plus one dim-exploded aggregation (two shuffles of k·dim
  * rows, independent of corpus size). No driver-side math.
  *
  * The reference has no ML surface; this extends the engine for
  * training-data curation (cluster-balanced sampling, IVF coarse
  * quantizers — see [[Similarity]]).
  */
object Clustering {

  private val Scale = 1e7

  /** Fixed-point quantization shared with the operators that compose
    * over k-means output ([[Corpus.semanticDedup]]): same scale, same
    * rounding, so distances computed downstream agree bit-for-bit with
    * the distances the assignment used. */
  def quantize(c: Column): Column =
    transform(c, x => round(x.cast("double") * Scale).cast("long"))

  private def sqDist(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0L), _ + _)

  /** Assign each vector to its nearest centroid (ties → lowest id).
    * argmin as `min(struct(dist, cid))` — lexicographic struct min is
    * a partial-aggregable agg (map-side combine, no sort), unlike a
    * row_number window which would shuffle-sort every (vector ×
    * centroid) row. */
  private def assign(vecs: DataFrame, centroids: DataFrame): DataFrame =
    vecs.crossJoin(broadcast(centroids))
      .select(col("vid"),
        struct(sqDist(col("qv"), col("cv")).as("d"), col("cid")).as("dc"))
      .groupBy(col("vid"))
      .agg(min(col("dc")).getField("cid").as("cid"))

  /** Run `iters` Lloyd iterations seeded with the vectors whose id is
    * `< k`; returns (id, cluster) for every vector. */
  def kmeans(df: DataFrame, idCol: String, vecCol: String,
      k: Int, iters: Int): DataFrame = {
    val vecs = df.select(col(idCol).as("vid"), quantize(col(vecCol)).as("qv"))
      .cache()
    try {
      var centroids = vecs.filter(col("vid") < k)
        .select(col("vid").as("cid"), col("qv").as("cv"))
      var assigned = assign(vecs, centroids)
      for (_ <- 2 to iters) {
        // new centroid = per-dimension floor-mean over members
        val perDim = assigned.join(vecs, "vid")
          .select(col("cid"), posexplode(col("qv")).as(Seq("pos", "v")))
          .groupBy(col("cid"), col("pos"))
          .agg(floor(sum(col("v")).cast("double") / count(lit(1)))
            .cast("long").as("cval"))
        centroids = perDim.groupBy(col("cid"))
          .agg(array_sort(collect_list(struct(col("pos"), col("cval")))).as("ps"))
          .select(col("cid"), transform(col("ps"), s => s.getField("cval")).as("cv"))
        assigned = assign(vecs, centroids)
      }
      assigned
    } finally vecs.unpersist()
  }
}
