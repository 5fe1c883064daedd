package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank in fixed-point integer arithmetic.
  *
  * Ranks are held as long "nano-ranks" (×10⁹) and every per-iteration
  * step — contribution split `rank div outdeg`, damping
  * `85·sum div 100` — is truncating integer division, so the result is
  * bit-identical at any parallelism and reproducible in any engine
  * (the oracle unrolls the same iterations in SQL).
  *
  * Plan shape per iteration: one join of ranks onto edges (ranks are
  * |V| rows — broadcast when small, hash-join on src otherwise) and one
  * groupBy(dst) sum with map-side combine. Edge set is never
  * materialized to the driver; total cost is O(iters · |E|) shuffle
  * bytes, the textbook Pregel-style cost. Dangling-node mass decays
  * (standard simplification; consistent on both sides of the oracle).
  */
object Graph {

  val Scale = 1000000000L // 1e9 fixed-point

  /** @param edges (src: long, dst: long) directed edges, duplicates
    *              allowed (parallel edges add contribution)
    * @param ckpt  lineage-cut policy — [[CheckpointStrategy.Local]]
    *              for local mode, [[CheckpointStrategy.Dfs]] on a
    *              cluster (survives executor loss)
    * @return (node, rank_nano) after `iters` damped iterations from a
    *         uniform start. d = 85/100. */
  def pageRank(edges: DataFrame, iters: Int,
      ckpt: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    // edges are read `iters` times and the node/outdeg tables once per
    // iteration — materialize them ONCE up front. Without this every
    // iteration re-runs the distinct over the raw input.
    val e = ckpt.cut(
      edges.select(col("src").cast("long"), col("dst").cast("long")))
    val nodes = ckpt.cut(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    // pre-join out-degree onto the edge list once: the per-iteration
    // work drops to one join (ranks onto edges) + one combine shuffle
    val eDeg = ckpt.cut(e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src")))
    // |V| is one scalar — computed once, folded into the base term
    val n = nodes.count()
    val base = (15L * Scale) / (100L * n)
    var ranks = nodes.withColumn("rank_nano", lit(Scale / n))
    for (_ <- 1 to iters) {
      val contrib = eDeg
        .join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"),
          expr("rank_nano div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr("(85 * coalesce(in_sum, 0L)) div 100"))
            .cast("long").as("rank_nano"))
      // cut lineage growth across iterations
      ranks = ckpt.cut(ranks, eager = false)
    }
    ranks
  }

  /** Personalized PageRank: teleport mass returns ONLY to the seed
    * set, so ranks measure proximity to the seeds rather than global
    * importance — the standard relatedness/recommendation primitive
    * ("parts supplied near these suppliers"). Same fixed-point integer
    * arithmetic and per-iteration plan shape as [[pageRank]] (one
    * ranks-onto-edges join + one combine shuffle); non-seed nodes
    * start at 0 and receive no teleport term, so mass stays
    * seed-centered and the result is bit-identical at any parallelism.
    *
    * @param seeds (node) teleport targets, uniform restart mass */
  def personalizedPageRank(edges: DataFrame, seeds: DataFrame, iters: Int,
      ckpt: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val e = ckpt.cut(
      edges.select(col("src").cast("long"), col("dst").cast("long")))
    val nodes = ckpt.cut(e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct())
    val eDeg = ckpt.cut(e.join(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), Seq("src")))
    val sds = ckpt.cut(seeds.select(col("node").cast("long")).distinct())
    val nS = sds.count()
    val seedBase = (15L * Scale) / (100L * nS)
    // nodes tagged with seed membership once; the flag rides every
    // iteration's projection instead of re-joining the seed set
    val tagged = ckpt.cut(nodes
      .join(sds.withColumn("__seed", lit(1)), Seq("node"), "left")
      .select(col("node"), coalesce(col("__seed"), lit(0)).as("__seed")))
    var ranks = tagged.select(col("node"), col("__seed"),
      when(col("__seed") === 1, lit(Scale / nS)).otherwise(lit(0L))
        .as("rank_nano"))
    for (_ <- 1 to iters) {
      val contrib = eDeg
        .join(ranks.select(col("node").as("src"), col("rank_nano")),
          Seq("src"))
        .select(col("dst").as("node"),
          expr("rank_nano div outdeg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("in_sum"))
      ranks = tagged.join(contrib, Seq("node"), "left")
        .select(col("node"), col("__seed"),
          (when(col("__seed") === 1, lit(seedBase)).otherwise(lit(0L)) +
            expr("(85 * coalesce(in_sum, 0L)) div 100"))
            .cast("long").as("rank_nano"))
      ranks = ckpt.cut(ranks, eager = false)
    }
    ranks.select(col("node"), col("rank_nano"))
  }

  /** Bounded-depth BFS: exact shortest-path hop count (≤ `maxHops`)
    * from a seed set over the undirected view of `edges` — the
    * "blast radius" primitive (k-hop neighborhoods, contamination
    * spread, referral reach).
    *
    * Frontier-expansion formulation: each hop is one equi join of the
    * current frontier onto the adjacency list plus an anti join
    * against the visited set — O(Σ frontier-adjacent edges) shuffle
    * per hop, never a |V|² closure. A node joins `visited` at the
    * first hop that reaches it, so its recorded depth is minimal by
    * construction. Lineage is cut per hop via `ckpt` (frontiers
    * eagerly — each is read twice; the visited accumulator lazily).
    *
    * @param edges   (src, dst) edges, treated as undirected
    * @param seeds   (node) start set, distance 0
    * @param maxHops expansion bound
    * @return (node, dist) — every node within `maxHops`, minimal hops */
  def bfsHops(edges: DataFrame, seeds: DataFrame, maxHops: Int,
      ckpt: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val fwd = edges.select(col("src").cast("long"), col("dst").cast("long"))
    val ue = ckpt.cut(fwd.union(
      fwd.select(col("dst").as("src"), col("src").as("dst"))).distinct())
    var visited = ckpt.cut(
      seeds.select(col("node").cast("long"), lit(0L).as("dist")))
    var frontier = visited
    for (h <- 1 to maxHops) {
      val next = ue
        .join(frontier.select(col("node").as("src")), Seq("src"))
        .select(col("dst").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(h.toLong))
      frontier = ckpt.cut(next)
      visited = ckpt.cut(visited.union(frontier), eager = false)
    }
    visited
  }

  /** Bounded min-plus (Bellman–Ford) shortest-path cost: cheapest total
    * edge weight from the seed set within `rounds` hops —
    *
    *   cost₀(seed) = 0;  costₖ(v) = min(costₖ₋₁(v),
    *     min { costₖ₋₁(u) + w : (u,v,w) ∈ E })
    *
    * — completing the graph family's third axis (BFS = fewest hops,
    * temporal reachability = earliest time, this = least cost).
    * Integer weights, so the fixed unrolling is exact and
    * engine-portable; per round one equi join + one min-combine,
    * O(rounds·|E|) shuffle like the siblings.
    *
    * @param edges (src, dst, w: long cost ≥ 0)
    * @return (node, cost) for every node reachable in ≤ rounds */
  def minPlusPaths(edges: DataFrame, seeds: DataFrame, rounds: Int,
      ckpt: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val e = ckpt.cut(edges.select(col("src").cast("long"),
      col("dst").cast("long"), col("w").cast("long")))
    var cost = ckpt.cut(
      seeds.select(col("node").cast("long"), lit(0L).as("cost")))
    for (_ <- 1 to rounds) {
      val hop = e.join(cost.select(col("node").as("src"),
          col("cost").as("c_src")), Seq("src"))
        .select(col("dst").as("node"), (col("c_src") + col("w")).as("cost"))
      cost = ckpt.cut(cost.union(hop)
        .groupBy(col("node")).agg(min(col("cost")).as("cost")))
    }
    cost
  }

  /** Earliest-arrival temporal reachability: over edges (src, dst, t)
    * active at time t, a path is admissible only if edge times are
    * non-decreasing along it (information/contamination can't ride an
    * edge that fired before it arrived). Computes, for every node, the
    * earliest time it can be reached from the seed set within
    * `rounds` hops:
    *
    *   arr₀(seed) = t₀;  arrₖ(v) = min(arrₖ₋₁(v),
    *     min { t : (u,v,t) ∈ E, t ≥ arrₖ₋₁(u) })
    *
    * Each round is one equi join of current arrivals onto the edge
    * list (time condition rides the join) plus a min-combine — the
    * same O(rounds·|E|) shuffle shape as [[pageRank]], monotone and
    * deterministic, so the fixed unrolling is engine-portable.
    *
    * @param edges (src, dst, t: timestamp-comparable) directed edges
    * @param seeds (node) start set, arrival `t0`
    * @param t0    seed arrival, "yyyy-MM-dd[ HH:mm:ss]" (cast in the
    *              session timezone — string form keeps it portable)
    * @return (node, arrival) for every node reachable in ≤ rounds */
  def temporalReachability(edges: DataFrame, seeds: DataFrame,
      t0: String, rounds: Int,
      ckpt: CheckpointStrategy = CheckpointStrategy.Local): DataFrame = {
    val e = ckpt.cut(edges.select(col("src").cast("long"),
      col("dst").cast("long"), col("t").cast("timestamp")))
    var arr = ckpt.cut(
      seeds.select(col("node").cast("long"),
        lit(t0).cast("timestamp").as("arrival")))
    for (_ <- 1 to rounds) {
      val hop = e.join(arr.withColumnRenamed("node", "src")
          .withColumnRenamed("arrival", "a_src"), Seq("src"))
        .filter(col("t") >= col("a_src"))
        .select(col("dst").as("node"), col("t").as("arrival"))
      arr = ckpt.cut(arr.union(hop)
        .groupBy(col("node")).agg(min(col("arrival")).as("arrival")))
    }
    arr
  }
}
