package graft
import org.apache.spark.sql.{SparkSession, DataFrame}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  * Queries live in [[Queries]]; DuckDB oracles in [[Oracles]]. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Queries.all("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Queries.all ++ QueriesText.all ++ QueriesMore.all ++ QueriesScale.all ++
      QueriesPipeline.all ++ QueriesData.all ++ QueriesExtra.all ++
      QueriesMining.all ++ QueriesRound4.all ++ QueriesRound5.all ++
      QueriesRound6.all ++ QueriesConnector.all ++ QueriesRound7.all ++
      QueriesRound8.all ++ QueriesRound9.all ++ QueriesRound11.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get a rows-only check. */
  def oracleSql: Map[String, String] =
    Oracles.all ++ OraclesText.all ++ OraclesMore.all ++ OraclesScale.all ++
      QueriesPipeline.oracles ++ OraclesData.all ++ OraclesExtra.all ++
      OraclesMining.all ++ OraclesRound4.all ++ OraclesRound5.all ++
      OraclesRound6.all ++ QueriesConnector.oracles ++ QueriesRound7.oracles ++
      QueriesRound8.oracles ++ QueriesRound9.oracles ++ QueriesRound11.oracles
}
