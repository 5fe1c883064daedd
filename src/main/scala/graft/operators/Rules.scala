package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Association-rule mining over (basket, item) pairs — the classic
  * market-basket support/confidence/lift table, in exact integer ppm.
  *
  * Pair generation is a within-basket self-join: quadratic only in
  * basket size (baskets are small — order lines, session items), never
  * in the corpus; `minSupport` prunes the rule table before the
  * support joins. One distinct collapse, one per-basket pair shuffle,
  * two broadcastable support joins. N (basket count) is a single
  * driver scalar. */
object Rules {

  /** @return both rule directions per qualifying pair:
    * (antecedent, consequent, supp_pair, supp_ante, supp_cons,
    *  confidence_ppm, lift_ppm) */
  def associationRules(df: DataFrame, basketCol: String, itemCol: String,
      minSupport: Long): DataFrame = {
    val bi = df.select(col(basketCol).as("b"), col(itemCol).as("i")).distinct()
    val n = bi.select(col("b")).distinct().count()
    val itemSupp = bi.groupBy(col("i")).agg(count(lit(1)).as("supp"))
    val pairs = bi.as("x")
      .join(bi.as("y"), col("x.b") === col("y.b") && col("x.i") < col("y.i"))
      .groupBy(col("x.i").as("pa"), col("y.i").as("pb"))
      .agg(count(lit(1)).as("supp_pair"))
      .filter(col("supp_pair") >= minSupport)
    val directed = pairs
      .select(col("pa").as("antecedent"), col("pb").as("consequent"),
        col("supp_pair"))
      .unionByName(pairs.select(col("pb").as("antecedent"),
        col("pa").as("consequent"), col("supp_pair")))
    directed
      .join(broadcast(itemSupp.select(col("i").as("antecedent"),
        col("supp").as("supp_ante"))), Seq("antecedent"))
      .join(broadcast(itemSupp.select(col("i").as("consequent"),
        col("supp").as("supp_cons"))), Seq("consequent"))
      .withColumn("confidence_ppm",
        expr("supp_pair * 1000000L div supp_ante"))
      .withColumn("lift_ppm",
        expr(s"supp_pair * ${n}L * 1000000L div (supp_ante * supp_cons)"))
      .select("antecedent", "consequent", "supp_pair", "supp_ante",
        "supp_cons", "confidence_ppm", "lift_ppm")
  }
}
