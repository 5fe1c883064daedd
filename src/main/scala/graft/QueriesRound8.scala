package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import Queries.table

/** Round-8 queries: streaming admission control, OCC conflict
  * resolution (rebase), DV-aware columnar decode, scan partition
  * sizing, O(1)-plan partitioned reads, target file size on write,
  * change-data-feed surfaces, and SQL schema evolution. Same contract
  * as [[Queries]]: every entry is oracle-gated via
  * [[QueriesRound8.oracles]]. */
object QueriesRound8 {

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ---- streaming ADMISSION CONTROL (SupportsAdmissionControl +
    //      maxFilesPerTrigger): a capped stream drains a 6-commit
    //      backlog in BOUNDED micro-batches — the week-old-checkpoint
    //      catch-up over a 100 TB table plans O(cap) files per
    //      trigger, not the whole backlog as one giant batch. The
    //      batch COUNT (>1, each ≤ cap) is hashed evidence; the sink
    //      still converges to exactly the full relation
    //      (exactly-once under bounded admission). ----
    "q253_admission_control" -> ((s, dir) => {
      import org.apache.spark.sql.streaming.Trigger
      val work = graft.Scratch.dir("graft_admit")
      val cat = new graft.catalog.TableCatalog(s, work)
      val o = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_totalprice"))
      val t = "D.S.ADMIT"
      // 6 single-file commits = a backlog of 6 files
      (0 until 6).foreach { i =>
        val slice = o.filter(col("o_orderkey") % 6 === i).coalesce(1)
        if (i == 0) cat.overwrite(t, slice) else cat.append(t, slice)
      }
      val sizes = new java.util.concurrent.ConcurrentLinkedQueue[java.lang.Long]()
      val q = s.readStream.format("graft")
        .option("root", work).option("table", t)
        .option("maxFilesPerTrigger", "2").load()
        .writeStream
        .foreachBatch { (df: DataFrame, _: Long) => sizes.add(df.count()); () }
        .option("checkpointLocation", s"$work/ckpt")
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(180000)
      val batches = {
        val b = Seq.newBuilder[Long]
        val it = sizes.iterator(); while (it.hasNext) b += it.next(); b.result()
      }.filter(_ > 0)
      val bounded = batches.size >= 3 // 6 files / cap 2
      import s.implicits._
      Seq((batches.sum, bounded)).toDF("n", "bounded_batches")
    }))

  val oracles: Map[String, String] = Map(

    "q253_admission_control" ->
      """SELECT count(*) AS n, TRUE AS bounded_batches FROM orders""")
}
