package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Queries.table

/** Round-11 queries: ROW-GROUP-granular stats skipping, proven with
  * hashed plan evidence. Same contract as [[Queries]]: every entry is
  * oracle-gated via [[QueriesRound11.oracles]]. */
object QueriesRound11 {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- ROW-GROUP SKIPPING: a range predicate over a SORTED
    //      multi-group file schedules only the byte windows of the
    //      surviving groups — at 100 TB the difference between "one
    //      row group" and "80 blind splits of a 10 GB file". Data is
    //      lineitem rows ranked and key-remapped so a value gap lands
    //      EXACTLY on a group boundary (~720 B rows + 64 KB block
    //      size ⇒ parquet-mr flushes every 100 records — its minimum
    //      mem-check cadence — so row 5000 starts a fresh group):
    //      - prefix predicate (k2 <= 500): scheduled slice bytes are
    //        a strict nonzero subset of the blind scan's (hashed as
    //        `prunes`), sums exact against the oracle;
    //      - gap predicate (k2 in the seam gap): EVERY group is
    //        eliminated while the file's union bounds still overlap —
    //        the file plans zero slices, zero bytes, zero rows
    //        (hashed as `gap_zero`). ----
    "q264_rowgroup_skip" -> ((s, dir) => {
      import s.implicits._
      val work = graft.Scratch.dir("graft_rgskip")
      val cat = new graft.catalog.TableCatalog(s, work)
      val t = "D.S.RGSKIP"
      val w = Window.orderBy(col("l_orderkey"), col("l_linenumber"))
      val src = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 10000)
        .withColumn("k2", when(col("rn") <= 5000, col("rn"))
          .otherwise(col("rn") + 10000000L))
        // unique ~720 B payload per row: defeats dictionary shrinkage
        // so the writer's size check trips at every 100-record cadence
        .withColumn("pad", rpad(concat(lit("p"), col("rn")), 700, "x"))
        .select(col("k2"), col("l_quantity"), col("pad"))
      val hc = s.sparkContext.hadoopConfiguration
      val oldBlock = Option(hc.get("parquet.block.size"))
      hc.setInt("parquet.block.size", 64 * 1024) // 100-row groups
      try cat.overwrite(t, src.repartition(1).sortWithinPartitions("k2"))
      finally oldBlock match {
        case Some(v) => hc.set("parquet.block.size", v)
        case None    => hc.unset("parquet.block.size")
      }
      def rd = s.read.format("graft")
        .option("root", work).option("table", t).load()
      // count(col), not count(*): a bare COUNT(*) is answered from
      // metadata and would prove nothing about scheduled bytes
      val full = rd.agg(count(col("k2")).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
          .as("qty_sum"))
      val rF = full.collect()(0)
      val fullBytes = graft.connector.GraftPlanInspect.scanSliceBytesOf(full)
      val pruned = rd.filter(col("k2") <= 500)
        .agg(count(col("k2")).as("n_pruned"),
          sum(col("l_quantity").cast(DecimalType(18, 2))).cast("double")
            .as("qty_pruned"))
      val rP = pruned.collect()(0)
      val prunedBytes =
        graft.connector.GraftPlanInspect.scanSliceBytesOf(pruned)
      val prunes = fullBytes > 0 && prunedBytes > 0 && prunedBytes < fullBytes
      // the gap [100000, 9000000] holds no value, but sits inside the
      // file's union bounds: file-level skipping keeps the file, group
      // elimination drops every group (the Some(Nil) zero-work path)
      val gap = rd.filter(col("k2") >= 100000L && col("k2") <= 9000000L)
        .agg(count(col("k2")).as("gn"))
      val gapRows = gap.collect()(0).getLong(0)
      val gapZero = gapRows == 0 &&
        graft.connector.GraftPlanInspect.scanPartitionsOf(gap) == 0 &&
        graft.connector.GraftPlanInspect.scanSliceBytesOf(gap) == 0
      Seq((rF.getLong(0), rF.getDouble(1), rP.getLong(0), rP.getDouble(1),
        prunes, gapZero))
        .toDF("n", "qty_sum", "n_pruned", "qty_pruned", "prunes", "gap_zero")
    }),

    // ---- TABLE CONSTRAINTS: NOT NULL / CHECK declared as metadata
    //      (version-scoped `_SCHEMAS` actions — rename-stable, reset
    //      by overwrite) and enforced PER ROW inside the write pass
    //      itself (a raise_error branch on a written column for
    //      catalog writes; a bound codegen'd predicate in the DSv2
    //      row loop) — no second validation scan, Delta's invariant
    //      shape. Evidence hashed: a valid append lands, a NULL-key
    //      and a negative-price append are REJECTED without
    //      committing, and dropping the constraint re-admits the
    //      write. ----
    "q265_constraints" -> ((s, dir) => {
      import s.implicits._
      val work = graft.Scratch.dir("graft_cstr")
      val cat = new graft.catalog.TableCatalog(s, work)
      val t = "D.S.CSTRQ"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_totalprice"))
      cat.overwrite(t, o)
      cat.alterAddNotNull(t, "o_orderkey")
      cat.alterAddCheck(t, "ck_price", "o_totalprice >= 0")
      cat.append(t, o) // valid: doubles the rows
      def rejected(body: => Unit): Boolean =
        try { body; false } catch { case _: Throwable => true }
      val vBefore = cat.version(t).get
      val nullRejected = rejected { cat.append(t,
        Seq((null.asInstanceOf[java.lang.Long], 1.0))
          .toDF("o_orderkey", "o_totalprice")) }
      val checkRejected = rejected { cat.append(t,
        Seq((999999999L, -5.0)).toDF("o_orderkey", "o_totalprice")) }
      val noCommit = cat.version(t).get == vBefore
      cat.alterDropConstraint(t, "ck_price")
      cat.append(t, Seq((999999999L, -5.0)).toDF("o_orderkey", "o_totalprice"))
      val r = cat.read(t).agg(
        count(col("o_orderkey")).as("n"),
        sum(col("o_totalprice").cast(DecimalType(18, 2))).cast("double")
          .as("price_sum")).collect()(0)
      Seq((r.getLong(0), r.getDouble(1),
        nullRejected && checkRejected && noCommit))
        .toDF("n", "price_sum", "enforced")
    }),

    // ---- TYPE WIDENING on append (Delta's type-widening shape): an
    //      int32 column widens to int64 when a wider append lands —
    //      ZERO bytes rewritten; the chain-union schema resolves to
    //      the widest type and the parquet readers promote the old
    //      narrow files' values at decode time. Narrower subsequent
    //      appends upcast at write; incompatible changes reject at
    //      write time. Evidence hashed: the widened read (catalog AND
    //      connector) sums exactly, schema reports int64, and a
    //      string-into-int append is rejected. ----
    "q266_type_widening" -> ((s, dir) => {
      import s.implicits._
      val work = graft.Scratch.dir("graft_widen")
      val cat = new graft.catalog.TableCatalog(s, work)
      val t = "D.S.WIDEQ"
      val o = table(s, dir, "orders").select(col("o_orderkey"),
        col("o_custkey"))
      // seed with int32 keys (sf<=0.1 keys fit comfortably)
      cat.overwrite(t, o.select(col("o_orderkey").cast("int")
        .as("o_orderkey"), col("o_custkey").cast("int").as("o_custkey")))
      // the widening append: same rows under int64 + one key above
      // the int32 range — the column MUST widen, not overflow
      cat.append(t, o.unionByName(
        Seq((9000000000L, 1L)).toDF("o_orderkey", "o_custkey")))
      val df = s.read.format("graft")
        .option("root", work).option("table", t).load()
      val widened =
        df.schema("o_orderkey").dataType ==
          org.apache.spark.sql.types.LongType
      val rejected =
        try {
          cat.append(t, Seq(("bad", 1L)).toDF("o_orderkey", "o_custkey"))
          false
        } catch { case _: Throwable => true }
      val r = df.agg(count(col("o_orderkey")).as("n"),
        sum(col("o_orderkey")).as("key_sum")).collect()(0)
      val viaCat = cat.read(t).agg(sum(col("o_orderkey"))).collect()(0)
      val agreeing = viaCat.getLong(0) == r.getLong(1)
      Seq((r.getLong(0), r.getLong(1), widened && rejected && agreeing))
        .toDF("n", "key_sum", "widened")
    }))

  val oracles: Map[String, String] = Map(

    "q264_rowgroup_skip" ->
      """WITH ranked AS (
           SELECT row_number() OVER (ORDER BY l_orderkey, l_linenumber)
                    AS rn,
                  l_quantity
           FROM lineitem
         ), capped AS (SELECT * FROM ranked WHERE rn <= 10000)
         SELECT count(*) AS n,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
             AS qty_sum,
           CAST((SELECT count(*) FROM capped WHERE rn <= 500) AS BIGINT)
             AS n_pruned,
           CAST((SELECT sum(CAST(l_quantity AS DECIMAL(18,2)))
                 FROM capped WHERE rn <= 500) AS DOUBLE) AS qty_pruned,
           TRUE AS prunes,
           TRUE AS gap_zero
         FROM capped""",

    "q265_constraints" ->
      """SELECT CAST(2 * count(*) + 1 AS BIGINT) AS n,
           CAST(2 * sum(CAST(o_totalprice AS DECIMAL(18,2)))
                + CAST(-5.0 AS DECIMAL(18,2)) AS DOUBLE) AS price_sum,
           TRUE AS enforced
         FROM orders""",

    "q266_type_widening" ->
      """SELECT CAST(2 * count(*) + 1 AS BIGINT) AS n,
           CAST(2 * sum(o_orderkey) + 9000000000 AS BIGINT) AS key_sum,
           TRUE AS widened
         FROM orders""")
}
