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
    }),

    // ---- CDC FILES: the change feed survives REWRITE commits. COW
    //      update/delete record their pre/post images into a `_CDCLOG/`
    //      sidecar at commit time (O(touched rows) — the rows are in
    //      hand anyway); compaction drops `_CDC_EMPTY` (zero change
    //      rows). The feed then reconstructs the live table across
    //      append → COW update → COW delete → compact WITHOUT
    //      skipChangeCommits — previously one compaction (which
    //      maintain() itself schedules) severed every downstream CDF
    //      consumer. Evidence hashed: reconstruction == live read,
    //      and the compact commit contributed zero feed rows. ----
    "q263_cdc_rewrites" -> ((s, dir) => {
      import s.implicits._
      val work = graft.Scratch.dir("graft_cdcq")
      val cat = new graft.catalog.TableCatalog(s, work)
      val t = "D.S.CDCRW"
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      cat.overwrite(t, o.repartition(3))                            // v0
      cat.updateWhere(t, Map("o_totalprice" -> lit(-1.0)),
        col("o_custkey") % 13 === 0)                                // v1
      cat.deleteWhere(t, col("o_orderkey") % 10 === 3)              // v2
      cat.compact(t, targetFileBytes = 64L << 20)                   // v3
      val vEnd = cat.version(t).get
      // changes SINCE the creation snapshot: every commit after v0 is
      // CDC-recorded, so the feed needs no retired version dirs (the
      // feed horizon is the vacuum retention clock, Delta's model)
      val cdf = s.read.format("graft")
        .option("root", work).option("table", t)
        .option("readChangeFeed", "true")
        .option("startingVersion", "1").load()
      val cols = Seq("o_orderkey", "o_custkey", "o_totalprice")
      val ins = cdf.filter(col("_change_type") === "insert")
        .select(cols.map(col): _*)
      val dels = cdf.filter(col("_change_type") === "delete")
        .select(cols.map(col): _*)
      // the creation snapshot + the feed reconstructs the live table
      val state = o.unionByName(ins).exceptAll(dels)
      val live = cat.read(t)
      val matches = state.exceptAll(live).count() == 0 &&
        live.exceptAll(state).count() == 0
      val compactZero = cdf
        .filter(col("_commit_version") === vEnd).count() == 0
      val updPairs = cdf.filter(col("_commit_version") === 1 &&
        col("_change_type") === "delete").count()
      val r = live.agg(count(col("o_orderkey")).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("price_sum")).collect()(0)
      Seq((r.getLong(0), r.getDouble(1), updPairs, matches, compactZero))
        .toDF("n", "price_sum", "upd_pairs", "reconstructs", "compact_zero")
    }))

  val oracles: Map[String, String] = Map(

    "q262_column_mapping" ->
      """SELECT count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS price_sum,
           CAST(0 AS BIGINT) AS resurrected,
           TRUE AS zero_rewrites,
           TRUE AS skips
         FROM orders""",

    "q263_cdc_rewrites" ->
      """SELECT count(*) AS n,
           CAST(sum(CAST(CASE WHEN o_custkey % 13 = 0 THEN -1.0
                              ELSE o_totalprice END AS DECIMAL(18,2)))
             AS DOUBLE) AS price_sum,
           (SELECT count(*) FROM orders WHERE o_custkey % 13 = 0)
             AS upd_pairs,
           TRUE AS reconstructs,
           TRUE AS compact_zero
         FROM orders
         WHERE o_orderkey % 10 <> 3""")
}
