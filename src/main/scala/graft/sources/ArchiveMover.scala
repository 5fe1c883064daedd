package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession

/** File archive/error mover: SUCCESS files → archive dir; failed files
  * → error dir with `_PRI_{runId}` inserted before the extension; source
  * deleted after copy.
  * reference: ADF/pipeline/archive_inbound_files.json:10-263 (rename
  * expression :91).
  */
object ArchiveMover {

  /** `report_2024.csv` + run r1 → `report_2024_PRI_r1.csv` */
  def errorName(name: String, runId: String): String = {
    val dot = name.lastIndexOf('.')
    if (dot <= 0) s"${name}_PRI_$runId"
    else s"${name.substring(0, dot)}_PRI_$runId${name.substring(dot)}"
  }

  def moveToArchive(spark: SparkSession, file: String, archiveDir: String): String =
    move(spark, file, archiveDir, identity)

  /** Concurrent batch move — ADF's `batchCount: 10` copy fan-out
    * (ADF/pipeline/archive_inbound_files.json:15-16). Sequential moves
    * are fine for a handful of files; a thousands-of-files drop wants
    * bounded parallelism. Hadoop FileSystem instances are cached and
    * thread-safe for these metadata ops. */
  def moveAllToArchive(spark: SparkSession, files: Seq[String],
      archiveDir: String, batchCount: Int = 10): Seq[String] =
    graft.util.Concurrent.forEach(files, batchCount)(
      moveToArchive(spark, _, archiveDir))

  def moveToError(spark: SparkSession, file: String, errorDir: String,
      runId: String): String =
    move(spark, file, errorDir, errorName(_, runId))

  private def move(spark: SparkSession, file: String, destDir: String,
      rename: String => String): String = {
    val src = new Path(file)
    val fs: FileSystem = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dest = new Path(destDir, rename(src.getName))
    fs.mkdirs(dest.getParent)
    org.apache.hadoop.fs.FileUtil.copy(fs, src, fs, dest, false,
      spark.sparkContext.hadoopConfiguration)
    fs.delete(src, false)
    dest.toString
  }
}
