package graft

import org.apache.spark.sql.functions._
import graft.catalog.TableCatalog

class CatalogSpec extends SparkTestBase {
  import spark.implicits._

  test("append creates then accumulates; overwrite replaces") {
    val cat = new TableCatalog(spark, tempDir("cat"))
    val t = "db.sch.t1"
    cat.append(t, Seq((1, "a"), (2, "b")).toDF("id", "v"))
    assert(cat.count(t) == 2)
    cat.append(t, Seq((3, "c")).toDF("id", "v"))
    assert(cat.count(t) == 3)
    cat.overwrite(t, Seq((9, "z")).toDF("id", "v"))
    assert(cat.read(t).as[(Int, String)].collect().toSet == Set((9, "z")))
  }

  test("truncate keeps schema, zero rows") {
    val cat = new TableCatalog(spark, tempDir("cat"))
    cat.append("d.s.t", Seq((1, "a")).toDF("id", "v"))
    cat.truncate("d.s.t")
    assert(cat.count("d.s.t") == 0)
    assert(cat.read("d.s.t").columns.toSeq == Seq("id", "v"))
  }

  test("updateWhere performs copy-on-write flag clear") {
    val cat = new TableCatalog(spark, tempDir("cat"))
    val t = "d.s.flags"
    cat.append(t, Seq((1, 1), (2, 1), (3, 0)).toDF("id", "IS_NEW"))
    cat.updateWhere(t, Map("IS_NEW" -> lit(0)), col("IS_NEW") === 1 && col("id") =!= 2)
    val rows = cat.read(t).as[(Int, Int)].collect().toMap
    assert(rows == Map(1 -> 0, 2 -> 1, 3 -> 0))
  }

  test("merge upserts on keys, source wins") {
    val cat = new TableCatalog(spark, tempDir("cat"))
    val t = "d.s.m"
    cat.append(t, Seq((1, "old"), (2, "old")).toDF("k", "v"))
    cat.merge(t, Seq((2, "new"), (3, "new")).toDF("k", "v"), Seq("k"))
    val rows = cat.read(t).as[(Int, String)].collect().toMap
    assert(rows == Map(1 -> "old", 2 -> "new", 3 -> "new"))
  }

  test("append is O(delta): prior data files referenced, not copied") {
    val root = tempDir("cat")
    val cat = new TableCatalog(spark, root)
    val t = "d.s.grow"
    cat.append(t, Seq.tabulate(100)(i => (i, s"v$i")).toDF("id", "v"))
    def partFiles(dir: java.io.File): Seq[java.io.File] =
      Option(dir.listFiles).map(_.toSeq).getOrElse(Nil)
        .filter(f => f.isFile && f.getName.startsWith("part-"))
    val v0Files = partFiles(new java.io.File(s"$root/d/s/grow/v_000000")).map(_.getName).toSet
    cat.append(t, Seq((1000, "new")).toDF("id", "v"))
    // v1 holds only the delta + a manifest; v0's files untouched in place
    val v1 = new java.io.File(s"$root/d/s/grow/v_000001")
    assert(partFiles(v1).nonEmpty)
    assert(new java.io.File(v1, "_MANIFEST").exists)
    assert(partFiles(new java.io.File(s"$root/d/s/grow/v_000000"))
      .map(_.getName).toSet == v0Files)
    assert(cat.count(t) == 101)
    // long append chains stay correct and prune nothing still referenced
    (0 until 5).foreach(i => cat.append(t, Seq((2000 + i, "x")).toDF("id", "v")))
    assert(cat.count(t) == 106)
    assert(cat.read(t).filter(col("id") < 100).count() == 100)
  }

  test("readers of the old version survive an overwrite (COW)") {
    val cat = new TableCatalog(spark, tempDir("cat"))
    val t = "d.s.cow"
    cat.append(t, Seq((1, "a")).toDF("id", "v"))
    val before = cat.read(t) // plan pinned to v0 files
    cat.overwrite(t, Seq((2, "b")).toDF("id", "v"))
    assert(before.count() == 1) // old version still readable
    assert(cat.read(t).as[(Int, String)].head() == ((2, "b")))
  }
}
