package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Queries.table

/** Round-7 queries: merge-on-read on hive-partitioned tables, the
  * vectorized connector read path, nested types through the connector,
  * string min/max file skipping, and change-tolerant streaming. Same
  * contract as [[Queries]]: every entry is oracle-gated via
  * [[QueriesRound7.oracles]]. */
object QueriesRound7 {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- deletion vectors on a HIVE-PARTITIONED table: the DV
    //      sidecar addresses (file, row_index) across the partition
    //      layout, so a point-delete in a huge partition writes
    //      O(matched rows) bytes and rewrites NOTHING (no_rewrite is
    //      part of the hashed answer) — previously partitioned tables
    //      fell back to partition-granular copy-on-write. The MoR
    //      update then masks+reinserts with the replacements written
    //      PARTITIONED (they keep riding partition pruning), growing
    //      the file set without retiring a file (grew_only). ----
    "q246_partitioned_dv" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_pdv")
      val cat = new graft.catalog.TableCatalog(s, work)
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"),
          col("l_returnflag"))
      val t = "D.S.PDV"
      // cluster by the partition col first: ~2 files per partition dir
      // instead of one per shuffle task
      cat.overwritePartitioned(t, li.repartition(6, col("l_returnflag")),
        Seq("l_returnflag"))
      val filesBefore = cat.dataFilePaths(t)
      cat.deleteWhereDV(t, col("l_orderkey") % 7 === 0)
      val noRewrite = cat.dataFilePaths(t) == filesBefore
      cat.updateWhereDV(t,
        Map("l_quantity" -> (col("l_quantity") + lit(100))),
        col("l_orderkey") % 11 === 0)
      val grewOnly = filesBefore.toSet.subsetOf(cat.dataFilePaths(t).toSet)
      cat.read(t)
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
            .as("sum_qty"),
          sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
            .as("sum_price"))
        .withColumn("no_rewrite", lit(noRewrite))
        .withColumn("grew_only", lit(grewOnly))
    }),

    // ---- vectorized connector scan: a DV-free graft read decodes via
    //      Spark's VectorizedParquetRecordReader into ColumnarBatches
    //      (the plan's ColumnarToRow transition is the evidence — the
    //      same columnar WSCG path as the built-in parquet source,
    //      replacing the boxed record-at-a-time Group decode on the
    //      100 TB read path's hot loop). A DV delete then KEEPS the
    //      SAME query columnar (round 8): masked batches wrap their
    //      vectors with a zero-copy survivor map instead of dropping
    //      the scan to the row reader — and the masked count is exact.
    //      Both plan facts hash into the oracle result. ----
    "q247_columnar_scan" -> ((s, dir) => {
      import s.implicits._
      val work = graft.Scratch.dir("graft_colscan")
      val cat = new graft.catalog.TableCatalog(s, work)
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
      val t = "D.S.COLSCAN"
      cat.overwrite(t, li.repartition(4))
      def rd = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val agg = rd.agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
          .as("sum_qty"),
        sum(col("l_extendedprice").cast(DecimalType(18, 2))).cast("double")
          .as("sum_price"))
      val r1 = agg.collect()(0) // evidence reads the ALREADY-executed plan
      val columnar =
        agg.queryExecution.executedPlan.toString.contains("ColumnarToRow")
      cat.deleteWhereDV(t, col("l_orderkey") % 13 === 0)
      val a2 = rd.agg(count(lit(1)).as("n2"))
      val r2 = a2.collect()(0)
      val dvColumnar =
        a2.queryExecution.executedPlan.toString.contains("ColumnarToRow")
      Seq((r1.getLong(0), r1.getDouble(1), r1.getDouble(2), columnar,
        r2.getLong(0), dvColumnar))
        .toDF("n", "sum_qty", "sum_price", "columnar",
          "n_after_dv", "dv_columnar")
    }),

    // ---- nested (struct) columns through the connector: the
    //      multimodal column shape — a binary payload beside typed
    //      metadata as ONE struct — round-trips through
    //      format("graft") write AND read. The aggregate touches
    //      subfields and payload bytes; nested schema pruning clips
    //      the requested struct down to the referenced leaves before
    //      the parquet read (physical prune-into-struct, asserted in
    //      ProjectSchemaFor specs), and the vectorized reader decodes
    //      the nested batch (columnar evidence hashed). ----
    "q248_nested_connector" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_nested")
      val t = "D.S.NESTED"
      val d = table(s, dir, "documents").select(col("doc_id"),
        struct(col("lang").as("lang"), col("n_chars").as("n_chars"),
          encode(col("text"), "UTF-8").as("payload")).as("meta"))
      d.write.format("graft").option("root", work).option("table", t)
        .mode("overwrite").save()
      val rd = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val agg = rd.groupBy(col("meta.lang").as("lang"))
        .agg(count(lit(1)).as("n"),
          sum(col("meta.n_chars")).as("sum_chars"),
          sum(length(col("meta.payload")).cast("long")).as("payload_bytes"))
      val rows = agg.collect() // evidence reads the executed plan
      val columnar =
        agg.queryExecution.executedPlan.toString.contains("ColumnarToRow")
      import s.implicits._
      rows.toSeq.map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), columnar))
        .toDF("lang", "n", "sum_chars", "payload_bytes", "nested_columnar")
    }),

    // ---- STRING min/max file skipping with truncation-safe bounds
    //      (Iceberg's lower/upper-bound trick): `_STATS` records the
    //      16-byte prefix of each file's string min and the SUCCESSOR
    //      of its max's prefix, so a range or prefix predicate over an
    //      ID-prefixed key schedules only the files whose bounds can
    //      match — previously every string predicate scanned every
    //      file. Three key-disjoint commits; the prefix filter plans
    //      ONE of three partitions (files_skipped hashed), and the
    //      catalog readBetween path opens one file (rb_skipped). ----
    "q249_string_skipping" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_strskip")
      val cat = new graft.catalog.TableCatalog(s, work)
      val li = table(s, dir, "lineitem")
        .select(concat(col("l_returnflag"), lit("_"),
            lpad(col("l_orderkey").cast("string"), 12, "0"), lit("_"),
            lpad(col("l_linenumber").cast("string"), 8, "0")).as("skey"),
          col("l_quantity"), col("l_returnflag"))
      val t = "D.S.STRSKIP"
      Seq("A", "N", "R").foreach { f =>
        cat.append(t, li.filter(col("l_returnflag") === f)
          .drop("l_returnflag").coalesce(1))
      }
      def rd = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val totalFiles = graft.connector.GraftPlanInspect.scanPartitions(
        rd.select("skey").limit(1))
      val pref = rd.filter(col("skey").startsWith("N_"))
      val prefParts = graft.connector.GraftPlanInspect.scanPartitions(
        pref.select("skey").limit(1))
      val skipped = prefParts == 1 && totalFiles == 3
      val rb = cat.readBetween(t, "skey", "N", "O")
      val rbSkipped = rb.inputFiles.length == 1
      pref.agg(count(lit(1)).as("n"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
            .as("sum_qty"))
        .withColumn("files_skipped", lit(skipped))
        .withColumn("rb_skipped", lit(rbSkipped))
        .withColumn("rb_n", lit(rb.count()))
    }),

    // ---- change-tolerant streaming (skipChangeCommits): a
    //      continuously MAINTAINED table — deletion vectors landing
    //      between micro-batches — still feeds a stream; the DV commit
    //      is silently skipped (appends only, Delta's skipChangeCommits
    //      contract: already-delivered rows are neither retracted nor
    //      re-delivered), where the strict default fails loudly. The
    //      sink therefore holds snapshot + appended rows = the full
    //      orders relation, and dv_outstanding proves a change commit
    //      really sat between the drains. ----
    "q250_skip_change_commits" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val work = graft.Scratch.dir("graft_skipcc")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
      val t = "D.S.SKIPCC"
      cat.overwrite(t, o.filter(col("o_orderkey") % 2 === 0).coalesce(2))
      val ckpt = s"$work/ckpt"
      def drain(): Unit = {
        val q = s.readStream.format("graft")
          .option("root", work).option("table", t)
          .option("skipChangeCommits", "true").load()
          .writeStream.format("parquet")
          .option("path", s"$work/sink")
          .option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination(120000); ()
      }
      drain() // initial snapshot: even keys
      cat.deleteWhereDV(t, col("o_custkey") % 97 === 0) // change commit
      cat.append(t, o.filter(col("o_orderkey") % 2 === 1).coalesce(2))
      drain() // append delivered, DV commit skipped
      val dvOutstanding = cat.deletionVectorRows(t) > 0
      s.read.parquet(s"$work/sink")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
            .as("sum_price"))
        .withColumn("dv_outstanding", lit(dvOutstanding))
    }),

    // ---- hive-partitioned tables as first-class SQL objects: the
    //      connector reads the partition layout natively (path-encoded
    //      columns synthesized typed — constant vectors on the
    //      columnar path), pushed partition predicates prune whole
    //      FILES by exact value at planning time (partition_pruned is
    //      hashed), and SQL row-level DELETE works merge-on-read
    //      against the partitioned chain (untranslatable predicate →
    //      _gfile/_gpos scan → DV sidecar commit, zero rewrite). The
    //      'we partitioned by day' 100 TB layout no longer needs the
    //      TableCatalog API for SQL access. ----
    "q251_partitioned_sql" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_ptsql")
      val cat = new graft.catalog.TableCatalog(s, work)
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_quantity"), col("l_returnflag"))
      cat.overwritePartitioned("db.s.ptsql",
        li.repartition(6, col("l_returnflag")), Seq("l_returnflag"))
      // catalog NAME must be unique per invocation: Spark caches
      // catalog INSTANCES by name, so a re-run's conf root change
      // would not re-initialize an already-used name (bench runs
      // every query twice)
      val gptsql = "gptsql_" + work.replaceAll("[^A-Za-z0-9]", "").takeRight(12)
      s.conf.set(s"spark.sql.catalog.$gptsql", "graft.connector.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$gptsql.root", work)
      val filesBefore = cat.dataFilePaths("db.s.ptsql")
      // row-level MoR delete through SQL (modulo: untranslatable →
      // delta path), zero files rewritten
      s.sql(s"DELETE FROM $gptsql.db.s.ptsql WHERE l_orderkey % 5 = 0")
      val noRewrite = cat.dataFilePaths("db.s.ptsql") == filesBefore
      def rd = s.read.format("graft")
        .option("root", work).option("table", "db.s.ptsql").load()
      val total = graft.connector.GraftPlanInspect.scanPartitions(
        rd.select("l_orderkey").limit(1))
      val one = rd.filter(col("l_returnflag") === "N")
      val oneParts = graft.connector.GraftPlanInspect.scanPartitions(
        one.select("l_orderkey", "l_returnflag").limit(1))
      val prunedOk = oneParts < total
      s.sql(s"""SELECT l_returnflag, count(*) AS n,
             CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_qty
           FROM $gptsql.db.s.ptsql GROUP BY l_returnflag""")
        .withColumn("partition_pruned", lit(prunedOk))
        .withColumn("no_rewrite", lit(noRewrite))
    }),

    // ---- partitioned CTAS through SQL: CREATE TABLE … PARTITIONED
    //      BY (c) AS SELECT writes the hive layout via the DSv2
    //      staged-commit path — executors route rows to per-value
    //      staged files (partition column path-encoded, stripped from
    //      the payload; the required clustered distribution keeps it
    //      to ~one file per value), the driver adopts them by rename.
    //      hive_layout + payload_stripped are hashed evidence; INSERT
    //      INTO then appends into the same layout carrying the prior
    //      chain by manifest. ----
    "q252_partitioned_ctas" -> ((s, dir) => {
      val work = graft.Scratch.dir("graft_ptctas")
      // unique per invocation — Spark caches catalog instances by name
      val gctas = "gctas_" + work.replaceAll("[^A-Za-z0-9]", "").takeRight(12)
      s.conf.set(s"spark.sql.catalog.$gctas", "graft.connector.GraftCatalog")
      s.conf.set(s"spark.sql.catalog.$gctas.root", work)
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
        .createOrReplaceTempView("q252_src")
      s.sql(s"""CREATE TABLE $gctas.d.s.ctas PARTITIONED BY (o_orderstatus)
               AS SELECT * FROM q252_src""")
      val cat = new graft.catalog.TableCatalog(s, work)
      val files = cat.dataFilePaths("d.s.ctas")
      val hiveLayout = files.nonEmpty &&
        files.forall(_.contains("/o_orderstatus="))
      val payloadStripped = s.read.parquet(files.head)
        .schema.fieldNames.sorted.toSeq == Seq("o_orderkey", "o_totalprice")
      val before = files.toSet
      s.sql(s"""INSERT INTO $gctas.d.s.ctas
               SELECT o_orderkey + 10000000, o_totalprice, o_orderstatus
               FROM q252_src WHERE o_orderkey % 100 = 0""")
      val carried = before.subsetOf(cat.dataFilePaths("d.s.ctas").toSet)
      s.sql(s"""SELECT o_orderstatus, count(*) AS n,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS sum_price
           FROM $gctas.d.s.ctas GROUP BY o_orderstatus""")
        .withColumn("hive_layout", lit(hiveLayout))
        .withColumn("payload_stripped", lit(payloadStripped))
        .withColumn("append_carried", lit(carried))
    }))

  val oracles: Map[String, String] = Map(

    "q246_partitioned_dv" ->
      """SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(CASE WHEN l_orderkey % 11 = 0
                              THEN l_quantity + 100 ELSE l_quantity END
                         AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS no_rewrite,
           TRUE AS grew_only
         FROM lineitem
         WHERE l_orderkey % 7 <> 0
         GROUP BY 1""",

    "q247_columnar_scan" ->
      """SELECT count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS columnar,
           (SELECT count(*) FROM lineitem WHERE l_orderkey % 13 <> 0)
             AS n_after_dv,
           TRUE AS dv_columnar
         FROM lineitem""",

    "q248_nested_connector" ->
      """SELECT lang,
           count(*) AS n,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars,
           CAST(sum(octet_length(encode(text))) AS BIGINT) AS payload_bytes,
           TRUE AS nested_columnar
         FROM documents
         GROUP BY 1""",

    "q249_string_skipping" ->
      """SELECT count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           TRUE AS files_skipped,
           TRUE AS rb_skipped,
           count(*) AS rb_n
         FROM lineitem
         WHERE l_returnflag = 'N'""",

    "q250_skip_change_commits" ->
      """SELECT count(*) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           TRUE AS dv_outstanding
         FROM orders""",

    "q251_partitioned_sql" ->
      """SELECT l_returnflag,
           count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
           TRUE AS partition_pruned,
           TRUE AS no_rewrite
         FROM lineitem
         WHERE l_orderkey % 5 <> 0
         GROUP BY 1""",

    "q252_partitioned_ctas" ->
      """SELECT o_orderstatus,
           count(*) + count(*) FILTER (WHERE o_orderkey % 100 = 0) AS n,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) +
                coalesce(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                  FILTER (WHERE o_orderkey % 100 = 0), 0) AS DOUBLE)
             AS sum_price,
           TRUE AS hive_layout,
           TRUE AS payload_stripped,
           TRUE AS append_carried
         FROM orders
         GROUP BY 1""")
}
