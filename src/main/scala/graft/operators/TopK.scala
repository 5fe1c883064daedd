package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, SparkSession}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded top-k per group via a typed [[Aggregator]].
  *
  * The window-function formulation (`row_number` + filter, q64) shuffles
  * EVERY row to its group's reducer before any can be discarded. This
  * aggregator keeps at most k entries in its buffer, and because typed
  * aggregators participate in partial aggregation, each map task sends
  * at most k rows per group into the shuffle — at 100 TB with k=5 the
  * shuffle carries ~k·groups·partitions rows instead of the corpus.
  * This is the same partial/final split Spark gives `max()`, applied to
  * "k largest with payload".
  */
object TopK {

  /** One ranked entry: `ord` is the (descending) sort value, `id` the
    * deterministic tie-break + payload key. */
  final case class Entry(ord: Long, id: Long)

  /** Buffer is kept sorted best-first and never exceeds k elements.
    * Ordering: larger `ord` first, then smaller `id` (total order, so
    * results are identical at any parallelism / merge order). */
  final class BoundedTopK(k: Int)
      extends Aggregator[Entry, Seq[Entry], Seq[Entry]] {
    private val best: Ordering[Entry] = Ordering.by(e => (-e.ord, e.id))

    def zero: Seq[Entry] = Vector.empty

    def reduce(b: Seq[Entry], a: Entry): Seq[Entry] =
      // fast path: buffer is full and a is no better than the current
      // worst — O(1) per non-improving row, the common case at scale
      if (b.size >= k && best.compare(a, b.last) >= 0) b
      else ((b :+ a).sorted(best)).take(k)

    def merge(x: Seq[Entry], y: Seq[Entry]): Seq[Entry] =
      (x ++ y).sorted(best).take(k)

    def finish(r: Seq[Entry]): Seq[Entry] = r

    def bufferEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
    def outputEncoder: Encoder[Seq[Entry]] = ExpressionEncoder[Seq[Entry]]()
  }

  /** Payload-carrying ranked entry for similarity search: `ordL` ranks
    * exact integer scores and `ordD` double scores (set the unused one
    * to 0 — ordering is (ordL desc, ordD desc, id asc)), `id`
    * tie-breaks, and `vec` optionally carries the candidate's vector so
    * a rerank stage needs no second corpus scan (null when unused). */
  final case class VecEntry(ordL: Long, ordD: Double, id: Long,
      vec: Seq[Float])

  /** [[BoundedTopK]] generalized to carry a payload — same bounded
    * buffer, same partial/final split, so the shuffle after an all-pairs
    * scoring join carries at most k rows per query instead of the full
    * scored corpus (the `row_number() OVER (PARTITION BY query_id)`
    * formulation ships |corpus|·|queries| rows to one reducer per
    * query before discarding down to k). */
  final class BoundedTopKVec(k: Int)
      extends Aggregator[VecEntry, Seq[VecEntry], Seq[VecEntry]] {
    private val best: Ordering[VecEntry] =
      Ordering.by(e => (-e.ordL, -e.ordD, e.id))

    def zero: Seq[VecEntry] = Vector.empty

    def reduce(b: Seq[VecEntry], a: VecEntry): Seq[VecEntry] =
      if (b.size >= k && best.compare(a, b.last) >= 0) b
      else ((b :+ a).sorted(best)).take(k)

    def merge(x: Seq[VecEntry], y: Seq[VecEntry]): Seq[VecEntry] =
      (x ++ y).sorted(best).take(k)

    def finish(r: Seq[VecEntry]): Seq[VecEntry] = r

    def bufferEncoder: Encoder[Seq[VecEntry]] =
      ExpressionEncoder[Seq[VecEntry]]()
    def outputEncoder: Encoder[Seq[VecEntry]] =
      ExpressionEncoder[Seq[VecEntry]]()
  }

  /** Top-k per `query_id` (integral) with optional payload. Input `df`
    * must contain a `query_id` column; `ordL`/`ordD` rank (descending,
    * unused one = 0), `id` identifies + tie-breaks, `vec` is carried
    * verbatim (pass a null array literal when unused). Output:
    * (query_id long, rank int 1..k, neighbor_id long, ordL, ordD, vec). */
  def topKPerQuery(df: DataFrame, ordL: Column, ordD: Column, id: Column,
      vec: Column, k: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val ds = df.select(col("query_id").cast("long"),
        ordL.cast("long").as("ordL"), ordD.cast("double").as("ordD"),
        id.cast("long").as("id"), vec.cast("array<float>").as("vec"))
      .as[(Long, Long, Double, Long, Seq[Float])]
    ds.groupByKey(_._1)
      .mapValues(t => VecEntry(t._2, t._3, t._4, t._5))
      .agg(new BoundedTopKVec(k).toColumn.name("top"))
      .toDF("query_id", "top")
      .select(col("query_id"), posexplode(col("top")).as(Seq("pos", "e")))
      .select(col("query_id"), (col("pos") + 1).cast("int").as("rank"),
        col("e.id").as("neighbor_id"), col("e.ordL").as("ordL"),
        col("e.ordD").as("ordD"), col("e.vec").as("vec"))
  }

  /** Top-k rows per group of `df`. `ordCol` (long, descending) ranks,
    * `idCol` (long) tie-breaks and identifies the row. Output columns:
    * (groupCol, rank 1..k, id, ord). */
  def topKPerGroup(spark: SparkSession, df: DataFrame, groupCol: String,
      ordCol: String, idCol: String, k: Int): DataFrame = {
    import spark.implicits._
    val ds = df.select(col(groupCol).cast("string").as("g"),
        col(ordCol).cast("long").as("ord"), col(idCol).cast("long").as("id"))
      .as[(String, Long, Long)]
    ds.groupByKey(_._1)
      .mapValues(t => Entry(t._2, t._3))
      .agg(new BoundedTopK(k).toColumn.name("top"))
      .toDF("g", "top")
      .select(col("g").as(groupCol),
        posexplode(col("top")).as(Seq("pos", "e")))
      .select(col(groupCol), (col("pos") + 1).cast("long").as("rank"),
        col("e.id").as(idCol), col("e.ord").as(ordCol))
  }
}
