package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.streaming.Trigger

import Queries.table

/** DataSource V2 connector queries: the catalog's 100 TB read path as
  * a first-class Spark source (`spark.read.format("graft")`) —
  * planning-time file skipping from pushed filters, metadata-answered
  * aggregates, in-reader deletion-vector masking, and manifest-version
  * micro-batch streaming. Each carries its skipping/pushdown EVIDENCE
  * as hashed boolean columns, so the oracle gates the scale mechanism,
  * not just the row values. */
object QueriesConnector {

  /** InputPartitions of the graft scan inside `df`'s executed plan
    * (finalizing any adaptive plan first) — the files-scheduled
    * evidence. */
  private def scanPartitions(df: DataFrame): Int =
    graft.connector.GraftPlanInspect.scanPartitions(df)

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- filter pushdown → planning-time file skipping: three
    //      key-disjoint commits give tight per-file `_STATS`; the
    //      pushed `l_orderkey <= c1` range then schedules ONE of the
    //      three files (files_skipped), and a conjunctive mid-range
    //      predicate also isolates one file. The skipped files are
    //      never opened — at 100 TB the scan cost follows the
    //      predicate's selectivity, not the table size. Results stay
    //      exact because every pushed filter is also residual. ----
    "q227_dsv2_scan_pushdown" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_dsv2scan")
      val cat = new graft.catalog.TableCatalog(s, work)
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag"))
      val maxK = li.agg(max("l_orderkey")).head().getLong(0)
      val c1 = maxK / 3; val c2 = 2 * maxK / 3
      val t = "D.S.V2SCAN"
      cat.append(t, li.filter(col("l_orderkey") <= c1).coalesce(1))
      cat.append(t, li.filter(col("l_orderkey") > c1 &&
        col("l_orderkey") <= c2).coalesce(1))
      cat.append(t, li.filter(col("l_orderkey") > c2).coalesce(1))
      def rd = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val totalFiles = scanPartitions(rd.select("l_orderkey").limit(1))
      val lo = rd.filter(col("l_orderkey") <= c1)
      val loParts = scanPartitions(lo.select("l_orderkey").limit(1))
      val skipped = loParts == 1 && totalFiles == 3
      lo.groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
            .as("sum_price"))
        .withColumn("files_skipped", lit(skipped))
    }),

    // ---- aggregate pushdown: COUNT(*)/MIN/MAX with no GROUP BY over
    //      a stats-covered DV-free table is answered from the commit
    //      metadata — the scan plans ONE synthetic partition and opens
    //      ZERO data files (metadata_only). Adding a deletion vector
    //      deactivates the pushdown (a masked row could be the
    //      extremum) and the same query falls back to an exact scan
    //      (fallback legs n_after_dv/min_after_dv). ----
    "q228_dsv2_agg_pushdown" -> ((s, dir) => {
      import s.implicits._
      val work = graft.Scratch.dir("graft_dsv2agg")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val t = "D.S.V2AGG"
      cat.overwrite(t, o.repartition(4))
      def rd = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val agg = rd.agg(count(lit(1)).as("n"), min("o_orderkey").as("min_key"),
        max("o_orderkey").as("max_key"))
      val r1 = agg.collect()(0) // one execution; evidence reads the plan
      val metadataOnly =
        graft.connector.GraftPlanInspect.scanPartitionsOf(agg) == 1
      val (n, mn, mx) = (r1.getLong(0), r1.getLong(1), r1.getLong(2))
      cat.deleteWhereDV(t, col("o_custkey") % 113 === 0)
      val agg2 = rd.agg(count(lit(1)).as("n"), min("o_orderkey").as("mn"))
      val r2 = agg2.collect()(0)
      val fellBack = // pushdown deactivated by the outstanding DVs
        graft.connector.GraftPlanInspect.scanPartitionsOf(agg2) > 1
      val (n2, mn2) = (r2.getLong(0), r2.getLong(1))
      Seq((n, mn, mx, metadataOnly, n2, mn2, fellBack))
        .toDF("n", "min_key", "max_key", "metadata_only",
          "n_after_dv", "min_after_dv", "dv_fallback")
    }),

    // ---- merge-on-read inside the reader: a DV delete masks rows by
    //      (file, row_index) and the connector's PartitionReader skips
    //      them with a sorted pointer walk as the file streams — the
    //      executed plan contains NO join (no_join), versus the
    //      catalog read path's broadcast anti join. Zero shuffle, O(dv)
    //      memory per file. ----
    "q230_dsv2_dv_read" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_dsv2dv")
      val cat = new graft.catalog.TableCatalog(s, work)
      val d = table(s, dir, "documents")
        .select(col("doc_id"), col("lang"), col("n_chars"))
      val t = "D.S.V2DV"
      cat.overwrite(t, d.repartition(4))
      cat.deleteWhereDV(t, col("doc_id") % 13 === 0)
      val rd = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val noJoin = !rd.queryExecution.executedPlan.toString.contains("Join")
      rd.groupBy(col("lang"))
        .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sum_chars"))
        .withColumn("no_join", lit(noJoin))
    }),

    // ---- RUNTIME file skipping (the connector's DPP analog): the
    //      fact table is three key-disjoint files; the broadcast dim's
    //      selective predicate confines its keys to the first third.
    //      Spark injects the dim's key set into the scan as a runtime
    //      In-filter (SupportsRuntimeFiltering), and the same
    //      stats-interval elimination then schedules ONE of the three
    //      fact files — a dimension predicate prunes a fact scan that
    //      is NOT hive-partitioned, at runtime, before any task
    //      launches. Evidence read from the executed plan, never
    //      re-executing the join (q196 lesson). ----
    "q231_dsv2_runtime_prune" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_dsv2rtf")
      val cat = new graft.catalog.TableCatalog(s, work)
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_extendedprice"), col("l_returnflag"))
      val maxK = li.agg(max("l_orderkey")).head().getLong(0)
      val c1 = maxK / 3; val c2 = 2 * maxK / 3
      val t = "D.S.V2RTF"
      cat.append(t, li.filter(col("l_orderkey") <= c1).coalesce(1))
      cat.append(t, li.filter(col("l_orderkey") > c1 &&
        col("l_orderkey") <= c2).coalesce(1))
      cat.append(t, li.filter(col("l_orderkey") > c2).coalesce(1))
      val dim = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderkey") <= c1)
      val fact = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val agg = fact.join(broadcast(dim),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
            .as("sum_price"))
      val rows = agg.collect()
      val pruned =
        graft.connector.GraftPlanInspect.scanPartitionsOf(agg) == 1 &&
        graft.connector.GraftPlanInspect.hasRuntimeFiltersOf(agg)
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1),
          agg.schema)
        .withColumn("runtime_pruned", lit(pruned))
    }),

    // ---- DSv2 WRITE path: `df.write.format("graft").mode(...)` —
    //      executors stage parquet part files, the driver adopts them
    //      into a catalog version by RENAME under the
    //      optimistic-concurrency claim. The second append carries the
    //      first commit's files by manifest reference (zero_copy: old
    //      file set is a strict subset of the new), and the staged
    //      commit harvests `_STATS` like any other writer, so the
    //      metadata COUNT/MIN/MAX pushdown works immediately on a
    //      connector-written table (stats_live). ----
    "q232_dsv2_write_roundtrip" -> ((s, dir) => {
      import s.implicits._
      val work = graft.Scratch.dir("graft_dsv2write")
      val cat = new graft.catalog.TableCatalog(s, work)
      val p = table(s, dir, "part")
        .select(col("p_partkey"), col("p_brand"), col("p_size"),
          col("p_retailprice"))
      val src = p.agg(max("p_partkey"), min("p_partkey"), count(lit(1)))
        .head()
      val (maxK, minK, nTrue) =
        (src.getLong(0), src.getLong(1), src.getLong(2))
      val half = maxK / 2
      val t = "D.S.V2WRITE"
      def writeG(df: org.apache.spark.sql.DataFrame): Unit =
        df.write.format("graft").option("root", work).option("table", t)
          .mode("append").save()
      writeG(p.filter(col("p_partkey") <= half).repartition(2))
      val before = cat.dataFilePaths(t).toSet
      writeG(p.filter(col("p_partkey") > half).repartition(2))
      val after = cat.dataFilePaths(t).toSet
      val zeroCopy = cat.version(t).contains(1) && before.subsetOf(after)
      def rd = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val agg = rd.agg(count(lit(1)).as("n_meta"),
        min("p_partkey").as("mn"), max("p_partkey").as("mx"))
      val r = agg.collect()(0)
      val statsLive =
        graft.connector.GraftPlanInspect.scanPartitionsOf(agg) == 1
      rd.groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          sum(col("p_retailprice").cast(DecimalType(18, 2))).cast("double")
            .as("sum_price"))
        .withColumn("zero_copy", lit(zeroCopy))
        .withColumn("stats_live", lit(statsLive && r.getLong(0) == nTrue &&
          r.getLong(1) == minK && r.getLong(2) == maxK))
    }),

    // ---- Z-order × connector skipping: after a random layout every
    //      file spans the full key range of BOTH dimensions, so a 2-D
    //      box predicate prunes nothing (before == all files).
    //      compactZOrder re-clusters on the interleaved-bit curve; the
    //      SAME `_STATS` elimination then schedules strictly fewer
    //      files (zorder_pruned) — layout maintenance and the scan
    //      path composing, which is exactly why Delta/Iceberg OPTIMIZE
    //      exists at 100 TB. ----
    "q235_dsv2_zorder_skip" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_dsv2z")
      val cat = new graft.catalog.TableCatalog(s, work)
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_suppkey"), col("l_quantity"))
      val mx = li.agg(max("l_orderkey"), max("l_suppkey")).head()
      val (maxK, maxS) = (mx.getLong(0), mx.getLong(1))
      val (loK, hiK) = (maxK * 2 / 10, maxK * 3 / 10)
      val (loS, hiS) = (maxS * 2 / 10, maxS * 3 / 10)
      val t = "D.S.V2Z"
      cat.overwrite(t, li.repartition(8)) // random: every file spans all
      def probe = s.read.format("graft")
        .option("root", work).option("table", t).load()
        .filter(col("l_orderkey") >= loK && col("l_orderkey") <= hiK &&
          col("l_suppkey") >= loS && col("l_suppkey") <= hiS)
      val before = graft.connector.GraftPlanInspect.scanPartitions(
        probe.select("l_orderkey").limit(1))
      val bytes = math.max(cat.fileStats(t)._2 / 8, 1L << 16)
      cat.compactZOrder(t, Seq("l_orderkey", "l_suppkey"),
        targetFileBytes = bytes)
      val agg = probe.groupBy(col("l_suppkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
            .as("sum_qty"))
      val rows = agg.collect()
      val after = graft.connector.GraftPlanInspect.scanPartitionsOf(agg)
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1),
          agg.schema)
        .withColumn("zorder_pruned", lit(after < before && after >= 1))
    }),

    // ---- streaming SINK into the catalog: writeStream.format("graft")
    //      commits each epoch's staged files as one catalog version
    //      with an atomically-written `_EPOCH` tag — a replayed epoch
    //      finds its tag and skips, so rows land EXACTLY ONCE however
    //      often the batch retries (exactly_once: table count equals
    //      the batch source's). The foreachBatch+MERGE pattern (q116)
    //      as a first-class sink. ----
    "q236_dsv2_stream_sink" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_dsv2sink")
      val cat = new graft.catalog.TableCatalog(s, work)
      val t = "D.S.V2SINK"
      val q = graft.streaming.EventStream.readStream(s, dir)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
        .writeStream.format("graft")
        .option("root", work).option("table", t)
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(300000)
      val expected = table(s, dir, "events").count()
      val exactlyOnce = cat.count(t) == expected
      cat.read(t)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 3))).cast("double")
            .as("sum_value"))
        .withColumn("exactly_once", lit(exactlyOnce))
    }),

    // ---- TIMESTAMP-range file skipping: the catalog writes
    //      TIMESTAMP_MICROS int64 (never stat-less INT96), so a
    //      time-range predicate — THE canonical 100 TB scan filter —
    //      gets the same `_STATS` elimination as numeric keys. Three
    //      time-disjoint commits; the pushed `ts <= t1` opens ONE of
    //      three files (time_skipped hashed); thresholds are integer
    //      micros so both engines cut identically. ----
    "q238_dsv2_timestamp_skip" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_dsv2ts")
      val cat = new graft.catalog.TableCatalog(s, work)
      val ev = Queries.normalizeEventTs(table(s, dir, "events"))
        .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      val b = ev.agg(min(unix_micros(col("ts"))),
        max(unix_micros(col("ts")))).head()
      val (mn, mx) = (b.getLong(0), b.getLong(1))
      val t1 = (2 * mn + mx) / 3; val t2 = (mn + 2 * mx) / 3
      def tsLit(us: Long) = {
        val t = new java.sql.Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
        t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt); t
      }
      val t = "D.S.V2TS"
      cat.append(t, ev.filter(unix_micros(col("ts")) <= t1).coalesce(1))
      cat.append(t, ev.filter(unix_micros(col("ts")) > t1 &&
        unix_micros(col("ts")) <= t2).coalesce(1))
      cat.append(t, ev.filter(unix_micros(col("ts")) > t2).coalesce(1))
      val probe = s.read.format("graft")
        .option("root", work).option("table", t).load()
        .filter(col("ts") <= lit(tsLit(t1)))
      val agg = probe.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 3))).cast("double")
            .as("sum_value"))
      val rows = agg.collect()
      val skipped =
        graft.connector.GraftPlanInspect.scanPartitionsOf(agg) == 1
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1),
          agg.schema)
        .withColumn("time_skipped", lit(skipped))
    }),

    // ---- statistics reporting → automatic broadcast: the scan's
    //      estimateStatistics answers from commit metadata (file bytes
    //      + `_STATS` row counts of the files surviving elimination),
    //      so the planner sees the dim table's REAL size and picks a
    //      broadcast hash join with NO hint (auto_broadcast hashed).
    //      Without it a DSv2 scan reports unknown ⇒ huge, and every
    //      graft join would sort-merge — the planning half of the
    //      100 TB story. ----
    "q240_dsv2_auto_broadcast" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_dsv2stats")
      val cat = new graft.catalog.TableCatalog(s, work)
      cat.overwrite("D.S.FACT", table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
        .repartition(4))
      cat.overwrite("D.S.DIM", table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")).coalesce(1))
      def rd(t: String) = s.read.format("graft")
        .option("root", work).option("table", t).load()
      // NO broadcast() hint: the planner must decide from reported stats
      val agg = rd("D.S.FACT")
        .join(rd("D.S.DIM"), col("o_custkey") === col("c_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
            .as("sum_price"))
      val rows = agg.collect()
      val bhj = agg.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin")
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1),
          agg.schema)
        .withColumn("auto_broadcast", lit(bhj))
    }),

    // ---- policy-driven OPTIMIZE (the post-ingest auto-compaction
    //      loop): 10 tiny commits + a MoR delete accumulate small-file
    //      and DV debt; describeHealth reads it from metadata alone,
    //      maintain() compacts + vacuums, and a second run is a NO-OP
    //      (idempotent: no data touched when healthy). Content is
    //      byte-identical through maintenance — the oracle gates the
    //      data while `maintained`/`noop_when_healthy` gate the
    //      policy. ----
    "q241_auto_optimize" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_opt")
      val cat = new graft.catalog.TableCatalog(s, work)
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val t = "D.S.OPT"
      (0 until 10).foreach(i =>
        cat.append(t, c.filter(col("c_custkey") % 10 === i).coalesce(1)))
      cat.deleteWhereDV(t, col("c_custkey") % 7 === 0)
      val h0 = cat.describeHealth(t)
      val actions = cat.maintain(t)
      val h1 = cat.describeHealth(t)
      val maintained = actions.contains("compact") &&
        h1.files < h0.files && h1.dvRows == 0L && h0.dvRows > 0L
      val filesAfter = cat.dataFilePaths(t)
      val noop = !cat.maintain(t).contains("compact") &&
        cat.dataFilePaths(t) == filesAfter
      cat.read(t)
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("n"),
          sum(col("c_acctbal").cast(DecimalType(18, 2))).cast("double")
            .as("sum_bal"))
        .withColumn("maintained", lit(maintained))
        .withColumn("noop_when_healthy", lit(noop))
    }),

    // ---- SQL surface: the V2 catalog plugin makes graft tables
    //      first-class SQL objects — CTAS creates v0, INSERT INTO
    //      appends v1 (same staged-commit machinery as the write
    //      path), `VERSION AS OF 0` time-travels to the CTAS snapshot
    //      (time_travel_ok hashes that evidence), and the final
    //      aggregate runs through loadTable → the same pushdown-capable
    //      GraftTable the DataFrame API gets. ----
    "q233_sql_catalog" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_gcat")
      val catName = "g6c" + math.abs(work.hashCode).toString // fresh per run
      s.conf.set(s"spark.sql.catalog.$catName",
        "graft.connector.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$catName.root", work)
      val o = table(s, dir, "orders")
      o.createOrReplaceTempView("g6_orders_src")
      s.sql(s"""CREATE TABLE $catName.d.s.ord AS
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM g6_orders_src WHERE o_orderkey % 2 = 0""")
      s.sql(s"""INSERT INTO $catName.d.s.ord
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM g6_orders_src WHERE o_orderkey % 2 = 1""")
      val v0 = s.sql(s"SELECT count(*) FROM $catName.d.s.ord VERSION AS OF 0")
        .head().getLong(0)
      val evens = o.filter(col("o_orderkey") % 2 === 0).count()
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM $catName.d.s.ord GROUP BY o_orderstatus""")
        .withColumn("time_travel_ok", lit(v0 == evens))
    }),

    // ---- SQL DELETE → merge-on-read DVs: the V2 catalog's
    //      SupportsDelete routes `DELETE FROM ... WHERE` into
    //      deletion-vector sidecars — ZERO data files rewritten
    //      (no_rewrite is hashed), the CTAS snapshot still
    //      time-travels complete (v0_intact), O(matched) bytes
    //      written. The point-delete cost model a 100 TB table
    //      needs, now reachable from plain SQL. ----
    "q237_sql_delete" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_sqldel")
      val catName = "g6d" + math.abs(work.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$catName",
        "graft.connector.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$catName.root", work)
      table(s, dir, "orders").createOrReplaceTempView("g6_del_src")
      s.sql(s"""CREATE TABLE $catName.d.s.orddel AS
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM g6_del_src""")
      val cat = new graft.catalog.TableCatalog(s, work)
      val before = cat.dataFilePaths("d.s.orddel")
      val total = cat.count("d.s.orddel")
      s.sql(s"""DELETE FROM $catName.d.s.orddel
        WHERE o_orderstatus = 'F' AND o_custkey <= 400""")
      val noRewrite = cat.dataFilePaths("d.s.orddel") == before
      val v0Intact = cat.readVersion("d.s.orddel", 0).count() == total
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM $catName.d.s.orddel GROUP BY o_orderstatus""")
        .withColumn("no_rewrite", lit(noRewrite))
        .withColumn("v0_intact", lit(v0Intact))
    }),

    // ---- atomic REPLACE WHERE (Delta's replaceWhere): one commit
    //      masks the matching slice via a DV sidecar AND adopts the
    //      replacement files — readers see delete+insert together or
    //      neither (one_commit: exactly one version bump), and not one
    //      pre-existing data file is rewritten (no_rewrite). The
    //      backfill primitive at 100 TB: re-deriving one slice costs
    //      O(slice), never a table rewrite, and a concurrent reader
    //      can never observe the slice half-replaced. ----
    "q239_replace_where" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_rw")
      val catName = "g6r" + math.abs(work.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$catName",
        "graft.connector.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$catName.root", work)
      table(s, dir, "orders").createOrReplaceTempView("g6_rw_src")
      s.sql(s"""CREATE TABLE $catName.d.s.ordrw AS
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM g6_rw_src""")
      val cat = new graft.catalog.TableCatalog(s, work)
      val before = cat.dataFilePaths("d.s.ordrw").toSet
      val vBefore = cat.version("d.s.ordrw").get
      // re-derive the 'O' slice with doubled prices, atomically
      s.sql(s"""INSERT INTO $catName.d.s.ordrw REPLACE WHERE
          o_orderstatus = 'O'
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 2
        FROM g6_rw_src WHERE o_orderstatus = 'O'""")
      val oneCommit = cat.version("d.s.ordrw").contains(vBefore + 1)
      val noRewrite = before.subsetOf(cat.dataFilePaths("d.s.ordrw").toSet)
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM $catName.d.s.ordrw GROUP BY o_orderstatus""")
        .withColumn("one_commit", lit(oneCommit))
        .withColumn("no_rewrite", lit(noRewrite))
    }),

    // ---- SQL UPDATE through delta-based row-level operations: the
    //      rewrite scans candidate rows WITH `_gfile`/`_gpos` row ids
    //      (condition pushdown bounds the scan), updates become
    //      delete+reinsert, and ONE commit adopts the DV side and the
    //      replacement rows together (one_commit, no_rewrite hashed,
    //      v0 time-travel intact) — Iceberg's merge-on-read UPDATE
    //      shape, O(touched rows) at any table size. ----
    "q242_sql_update" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_sqlupd")
      val catName = "g6u" + math.abs(work.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$catName",
        "graft.connector.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$catName.root", work)
      table(s, dir, "orders").createOrReplaceTempView("g6_upd_src")
      s.sql(s"""CREATE TABLE $catName.d.s.ordupd AS
        SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice
        FROM g6_upd_src""")
      val cat = new graft.catalog.TableCatalog(s, work)
      val before = cat.dataFilePaths("d.s.ordupd").toSet
      val vBefore = cat.version("d.s.ordupd").get
      val total = cat.count("d.s.ordupd")
      s.sql(s"""UPDATE $catName.d.s.ordupd
        SET o_totalprice = o_totalprice * 2
        WHERE o_orderstatus = 'F' AND o_custkey % 3 = 0""")
      val oneCommit = cat.version("d.s.ordupd").contains(vBefore + 1)
      val noRewrite = before.subsetOf(cat.dataFilePaths("d.s.ordupd").toSet)
      val v0Intact = cat.readVersion("d.s.ordupd", vBefore).count() == total
      s.sql(s"""SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
            AS sum_price
        FROM $catName.d.s.ordupd GROUP BY o_orderstatus""")
        .withColumn("one_commit", lit(oneCommit))
        .withColumn("no_rewrite", lit(noRewrite))
        .withColumn("v0_intact", lit(v0Intact))
    }),

    // ---- SQL MERGE INTO through the same delta writer: matched rows
    //      delete+reinsert (DV + new file), not-matched source rows
    //      insert — the warehouse upsert (W5/q18's MERGE) now a ONE-
    //      COMMIT merge-on-read operation addressable from SQL. ----
    "q243_sql_merge" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_sqlmrg")
      val catName = "g6m" + math.abs(work.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$catName",
        "graft.connector.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$catName.root", work)
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      c.createOrReplaceTempView("g6_mrg_all")
      val cat = new graft.catalog.TableCatalog(s, work)
      cat.overwrite("d.s.cmrg",
        c.filter(col("c_custkey") % 2 === 0).repartition(2))
      val vBefore = cat.version("d.s.cmrg").get
      s.sql(s"""MERGE INTO $catName.d.s.cmrg t
        USING (SELECT c_custkey, c_nationkey, c_acctbal + 1000 AS new_bal
               FROM g6_mrg_all WHERE c_custkey % 3 = 0) s
        ON t.c_custkey = s.c_custkey
        WHEN MATCHED THEN UPDATE SET c_acctbal = s.new_bal
        WHEN NOT MATCHED THEN
          INSERT (c_custkey, c_nationkey, c_acctbal)
          VALUES (s.c_custkey, s.c_nationkey, s.new_bal)""")
      val oneCommit = cat.version("d.s.cmrg").contains(vBefore + 1)
      s.sql(s"""SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM $catName.d.s.cmrg GROUP BY c_nationkey""")
        .withColumn("one_commit", lit(oneCommit))
    }),

    // ---- PARTITION EVOLUTION: the table's first era is unpartitioned;
    //      the second era appends under a NEW hive layout
    //      (o_orderstatus) with every old file carried BY REFERENCE
    //      (no_rewrite hashed — zero bytes rewritten). A status
    //      predicate then partition-prunes the evolved slice while old
    //      files are filtered row-level (pruned: executed scans read
    //      fewer files than a full read) — Iceberg's evolution trade,
    //      which is what makes "we should have partitioned by day"
    //      fixable on a 100 TB table without a rewrite. ----
    "q245_partition_evolution" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_evolve")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
          col("o_totalprice"))
      val maxK = o.agg(max("o_orderkey")).head().getLong(0)
      val half = maxK / 2
      val t = "D.S.EV"
      cat.overwrite(t, o.filter(col("o_orderkey") <= half).repartition(3))
      val oldFiles = cat.dataFilePaths(t).toSet
      cat.appendEvolvePartitioning(t, o.filter(col("o_orderkey") > half),
        Seq("o_orderstatus"))
      val noRewrite = oldFiles.subsetOf(cat.dataFilePaths(t).toSet)
      val probe = cat.read(t).limit(1)
      probe.collect()
      // catalog partitioned reads are connector scans (round 8): the
      // pruning evidence counts scheduled slices, not parquet metrics
      val total = graft.connector.GraftPlanInspect.scanPartitionsOf(probe)
      val agg = cat.read(t).filter(col("o_orderstatus") === "F")
        .groupBy((col("o_custkey") % 10).as("bucket"))
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
            .as("sum_price"))
      val rows = agg.collect()
      val pruned =
        graft.connector.GraftPlanInspect.scanPartitionsOf(agg) < total
      s.createDataFrame(s.sparkContext.parallelize(rows.toIndexedSeq, 1),
          agg.schema)
        .withColumn("no_rewrite", lit(noRewrite))
        .withColumn("pruned", lit(pruned))
    }),

    // ---- stored procedures: the maintenance loop as SQL verbs
    //      (CALL c.system.health / optimize / build_bloom) — the
    //      operational surface a SQL-only client needs. 10 tiny
    //      commits + a MoR delete accrue debt; health reports it from
    //      metadata, optimize settles it (debt_settled), build_bloom
    //      indexes the compacted files (bloom_built) — and the data
    //      rides through it all byte-identical (the oracle). ----
    "q244_sql_procedures" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_proc")
      val catName = "g6p" + math.abs(work.hashCode).toString
      s.conf.set(s"spark.sql.catalog.$catName",
        "graft.connector.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$catName.root", work)
      val cat = new graft.catalog.TableCatalog(s, work)
      val c = table(s, dir, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_nationkey"),
          col("c_acctbal"))
      (0 until 10).foreach(i =>
        cat.append("d.s.pr", c.filter(col("c_custkey") % 10 === i)
          .coalesce(1)))
      cat.deleteWhereDV("d.s.pr", col("c_custkey") % 11 === 0)
      val h = s.sql(s"CALL $catName.system.health('d.s.pr')").collect()(0)
      val hadDebt = h.getInt(0) >= 10 && h.getLong(3) > 0
      val acts = s.sql(s"CALL $catName.system.optimize('d.s.pr')")
        .collect().map(_.getString(0))
      val h2 = s.sql(s"CALL $catName.system.health('d.s.pr')").collect()(0)
      val settled = acts.contains("compact") &&
        h2.getInt(0) < h.getInt(0) && h2.getLong(3) == 0
      val indexed = s.sql(
        s"CALL $catName.system.build_bloom('d.s.pr', 'c_name')")
        .collect()(0).getInt(0)
      s.sql(s"""SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
          CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal
        FROM $catName.d.s.pr GROUP BY c_nationkey""")
        .withColumn("debt_settled", lit(hadDebt && settled))
        .withColumn("bloom_built", lit(indexed >= 1))
    }),

    // ---- the table as a streaming source: manifest versions are the
    //      offsets, each micro-batch reads exactly the files its
    //      commits appended (the O(delta) manifest diff), and the
    //      parquet-sink checkpoint carries offsets across restarts —
    //      the second drain delivers ONLY the two new commits, never
    //      re-reading the initial snapshot (exactly_once: sink total
    //      equals table total after three separate drains). ----
    "q229_dsv2_stream_table" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_dsv2stream")
      val cat = new graft.catalog.TableCatalog(s, work)
      val ev = table(s, dir, "events")
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("value"))
      val maxId = ev.agg(max("event_id")).head().getLong(0)
      val c1 = maxId / 2; val c2 = 3 * maxId / 4
      val t = "D.S.V2STREAM"
      cat.overwrite(t, ev.filter(col("event_id") <= c1).coalesce(2))
      val ckpt = s"$work/ckpt"; val sink = s"$work/sink"
      def drain(): Unit = {
        val q = s.readStream.format("graft")
          .option("root", work).option("table", t).load()
          .writeStream.format("parquet")
          .option("path", sink).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000); ()
      }
      drain()
      cat.append(t, ev.filter(col("event_id") > c1 &&
        col("event_id") <= c2).coalesce(1))
      drain()
      cat.append(t, ev.filter(col("event_id") > c2).coalesce(1))
      drain()
      val sunk = s.read.parquet(sink)
      val exactlyOnce = sunk.count() == cat.count(t)
      sunk.groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast(DecimalType(18, 3))).cast("double")
            .as("sum_value"))
        .withColumn("exactly_once", lit(exactlyOnce))
    }))

  val oracles: Map[String, String] = Map(

    "q227_dsv2_scan_pushdown" ->
      """WITH mx AS (SELECT max(l_orderkey) // 3 AS c1 FROM lineitem)
         SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS files_skipped
         FROM lineitem, mx WHERE l_orderkey <= c1
         GROUP BY l_returnflag""",

    "q228_dsv2_agg_pushdown" ->
      """SELECT CAST(count(*) AS BIGINT) AS n,
           min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
           TRUE AS metadata_only,
           CAST(count(*) FILTER (WHERE o_custkey % 113 <> 0) AS BIGINT)
             AS n_after_dv,
           min(o_orderkey) FILTER (WHERE o_custkey % 113 <> 0)
             AS min_after_dv,
           TRUE AS dv_fallback
         FROM orders""",

    "q231_dsv2_runtime_prune" ->
      """WITH mx AS (SELECT max(l_orderkey) // 3 AS c1 FROM lineitem),
         dim AS (SELECT o_orderkey FROM orders, mx
                 WHERE o_orderpriority = '1-URGENT' AND o_orderkey <= c1)
         SELECT l_returnflag, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS runtime_pruned
         FROM lineitem JOIN dim ON l_orderkey = o_orderkey
         GROUP BY l_returnflag""",

    "q233_sql_catalog" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS time_travel_ok
         FROM orders GROUP BY o_orderstatus""",

    "q237_sql_delete" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS no_rewrite, TRUE AS v0_intact
         FROM orders
         WHERE NOT (o_orderstatus = 'F' AND o_custkey <= 400)
         GROUP BY o_orderstatus""",

    "q235_dsv2_zorder_skip" ->
      """WITH mx AS (SELECT max(l_orderkey) AS mk, max(l_suppkey) AS ms
                     FROM lineitem)
         SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           TRUE AS zorder_pruned
         FROM lineitem, mx
         WHERE l_orderkey >= mk * 2 // 10 AND l_orderkey <= mk * 3 // 10
           AND l_suppkey >= ms * 2 // 10 AND l_suppkey <= ms * 3 // 10
         GROUP BY l_suppkey""",

    "q245_partition_evolution" ->
      """SELECT o_custkey % 10 AS bucket, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS no_rewrite, TRUE AS pruned
         FROM orders WHERE o_orderstatus = 'F'
         GROUP BY o_custkey % 10""",

    "q244_sql_procedures" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           TRUE AS debt_settled, TRUE AS bloom_built
         FROM customer WHERE c_custkey % 11 <> 0
         GROUP BY c_nationkey""",

    "q242_sql_update" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(CASE WHEN o_orderstatus = 'F' AND o_custkey % 3 = 0
                              THEN o_totalprice * 2 ELSE o_totalprice END
                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           TRUE AS one_commit, TRUE AS no_rewrite, TRUE AS v0_intact
         FROM orders GROUP BY o_orderstatus""",

    "q243_sql_merge" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(CASE WHEN c_custkey % 3 = 0
                              THEN c_acctbal + 1000 ELSE c_acctbal END
                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           TRUE AS one_commit
         FROM customer
         WHERE c_custkey % 2 = 0 OR c_custkey % 3 = 0
         GROUP BY c_nationkey""",

    "q241_auto_optimize" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_bal,
           TRUE AS maintained, TRUE AS noop_when_healthy
         FROM customer WHERE c_custkey % 7 <> 0
         GROUP BY c_nationkey""",

    "q240_dsv2_auto_broadcast" ->
      """SELECT c_nationkey, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS auto_broadcast
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey""",

    "q239_replace_where" ->
      """SELECT o_orderstatus, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(CASE WHEN o_orderstatus = 'O'
                              THEN o_totalprice * 2 ELSE o_totalprice END
                     AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
           TRUE AS one_commit, TRUE AS no_rewrite
         FROM orders GROUP BY o_orderstatus""",

    "q238_dsv2_timestamp_skip" ->
      """WITH b AS (SELECT min(epoch_us(ts)) AS mn, max(epoch_us(ts)) AS mx
                    FROM events)
         SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value,
           TRUE AS time_skipped
         FROM events, b
         WHERE epoch_us(ts) <= (2 * mn + mx) // 3
         GROUP BY event_type""",

    "q236_dsv2_stream_sink" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value,
           TRUE AS exactly_once
         FROM events GROUP BY event_type""",

    "q232_dsv2_write_roundtrip" ->
      """SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(p_retailprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS zero_copy, TRUE AS stats_live
         FROM part GROUP BY p_brand""",

    "q230_dsv2_dv_read" ->
      """SELECT lang, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars, TRUE AS no_join
         FROM documents WHERE doc_id % 13 <> 0
         GROUP BY lang""",

    "q229_dsv2_stream_table" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST(value AS DECIMAL(18,3))) AS DOUBLE) AS sum_value,
           TRUE AS exactly_once
         FROM events
         GROUP BY event_type""")
}
