package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, StringType, StructField, StructType}

import Queries.table

/** Round-9 queries: column mapping (RENAME/DROP COLUMN without data
  * rewrites). Same contract as [[Queries]]: every entry is
  * oracle-gated via [[QueriesRound9.oracles]]. */
object QueriesRound9 {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- COLUMN MAPPING: RENAME + DROP + re-ADD are METADATA commits
    //      (Delta column-mapping name mode) — at 100 TB a rename must
    //      not rewrite a byte. Old files read back under the new
    //      logical name; a dropped-then-re-added name maps to a FRESH
    //      physical column, so old bytes never resurrect. Evidence
    //      hashed into the oracle result: zero files rewritten across
    //      the three ALTERs, zero resurrected values, file skipping
    //      still engages through the rename (pushed filters translate
    //      logical→physical before the `_STATS` sidecars). ----
    "q262_column_mapping" -> ((s, dir) => {
      import s.implicits._
      val work = graft.Scratch.dir("graft_colmap")
      val cat = new graft.catalog.TableCatalog(s, work)
      val t = "D.S.CMAP"
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
      // range-clustered files so the skipping evidence is real: each
      // file covers a tight o_totalprice interval
      cat.overwrite(t, o.repartitionByRange(4, col("o_totalprice")))
      val filesBefore = cat.dataFilePaths(t)
      cat.alterRenameColumn(t, "o_totalprice", "price")
      cat.alterDropColumns(t, Seq("o_orderstatus"))
      cat.alterAddColumns(t,
        StructType(Seq(StructField("o_orderstatus", StringType))))
      val zeroRewrites = cat.dataFilePaths(t) == filesBefore
      val df = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val r = df.agg(
        count(col("o_orderkey")).as("n"),
        sum(col("price").cast(DecimalType(18, 2))).cast("double")
          .as("price_sum"),
        count(col("o_orderstatus")).as("resurrected")).collect()(0)
      // skipping through the rename: a tight range on the renamed
      // column schedules fewer slices than the file count
      val pruned = df.filter(col("price") >= 900.0 && col("price") <= 1000.0)
      pruned.collect()
      val skips = graft.connector.GraftPlanInspect.scanPartitionsOf(pruned) <
        cat.dataFilePaths(t).length
      Seq((r.getLong(0), r.getDouble(1), r.getLong(2), zeroRewrites, skips))
        .toDF("n", "price_sum", "resurrected", "zero_rewrites", "skips")
    }))

  val oracles: Map[String, String] = Map(

    "q262_column_mapping" ->
      """SELECT count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS price_sum,
           CAST(0 AS BIGINT) AS resurrected,
           TRUE AS zero_rewrites,
           TRUE AS skips
         FROM orders""")
}
