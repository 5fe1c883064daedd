package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources._

class RestAuthSpec extends AnyFunSuite {
  private val noSleep = RestSource.RetryPolicy(sleeper = _ => ())

  test("oauth client-credentials token fetch") {
    val http = new HttpClient {
      def request(method: String, url: String, headers: Map[String, String],
          body: Option[String]): (Int, String) = {
        assert(method == "POST" && url == "token")
        assert(body.exists(_.contains("grant_type=client_credentials")))
        assert(headers("Content-Type") == "application/x-www-form-urlencoded")
        (200, """{"access_token":"tok123","expires_in":3600}""")
      }
    }
    assert(RestSource.fetchToken(http, "token", "id", "secret", noSleep) == "tok123")
    val h = RestSource.authHeaders("tok123", Some("svc-key"))
    assert(h == Map("Authorization" -> "Bearer tok123", "SiteServiceKey" -> "svc-key"))
  }

  test("token fetch fails when access_token missing") {
    val http = new HttpClient {
      def request(m: String, u: String, h: Map[String, String],
          b: Option[String]): (Int, String) = (200, """{"error":"nope"}""")
    }
    intercept[RestError](RestSource.fetchToken(http, "token", "a", "b", noSleep))
  }

  test("error message cleaner strips engine code prefixes") {
    assert(RestSource.cleanErrorMessage("100038 (22018): Numeric value 'x' is not recognized")
      == "Numeric value 'x' is not recognized")
    assert(RestSource.cleanErrorMessage("plain message") == "plain message")
    assert(RestSource.cleanErrorMessage(null) == "")
  }
}

class CatalogPartitionSpec extends SparkTestBase {
  import spark.implicits._
  import org.apache.spark.sql.functions._

  test("partitioned overwrite prunes partitions on read") {
    val cat = new graft.catalog.TableCatalog(spark, tempDir("part"))
    val df = Seq(("p1", "2024-01-01", 1), ("p1", "2024-01-02", 2),
      ("p2", "2024-01-01", 3)).toDF("practice", "load_date", "v")
    cat.overwritePartitioned("d.s.t", df, Seq("practice", "load_date"))
    val read = cat.read("d.s.t")
    assert(read.count() == 3)
    val pruned = read.filter(org.apache.spark.sql.functions.col("practice") === "p1")
    assert(pruned.count() == 2)
    // partition filter reaches the scan
    val plan = pruned.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") || plan.contains("practice"))
  }

  test("partitioned table survives append, update, merge, compact") {
    val cat = new graft.catalog.TableCatalog(spark, tempDir("part"))
    val t = "d.s.plife"
    cat.overwritePartitioned(t,
      Seq(("p1", 1, 1), ("p2", 2, 1)).toDF("practice", "id", "IS_NEW"),
      Seq("practice"))

    // append keeps prior partitions' data (dir-granularity manifest)
    cat.append(t, Seq(("p1", 3, 1), ("p3", 4, 1)).toDF("practice", "id", "IS_NEW"))
    assert(cat.read(t).count() == 4)
    assert(cat.read(t).filter($"practice" === "p1").count() == 2)

    // updateWhere rewrites partitioned and keeps all rows
    cat.updateWhere(t, Map("IS_NEW" -> lit(0)), col("IS_NEW") === 1 && col("id") < 4)
    val flags = cat.read(t).select("id", "IS_NEW").as[(Int, Int)].collect().toMap
    assert(flags == Map(1 -> 0, 2 -> 0, 3 -> 0, 4 -> 1))

    // merge upserts by key across partitions
    cat.merge(t, Seq(("p2", 2, 9), ("p4", 9, 9)).toDF("practice", "id", "IS_NEW"),
      Seq("id"))
    val merged = cat.read(t).select("id", "IS_NEW").as[(Int, Int)].collect().toMap
    assert(merged == Map(1 -> 0, 2 -> 9, 3 -> 0, 4 -> 1, 9 -> 9))
    assert(cat.read(t).filter($"practice" === "p4").count() == 1)

    // compaction keeps content and layout; pruning stays partition-aware
    cat.append(t, Seq(("p1", 10, 1)).toDF("practice", "id", "IS_NEW"))
    cat.compact(t)
    assert(cat.read(t).count() == 6)
    val pruned = cat.read(t).filter($"practice" === "p1")
    assert(pruned.collect().length == 3)
    // connector-backed partitioned read (round 8): pruning evidence is
    // fewer scheduled slices than the table's file count
    assert(graft.connector.GraftPlanInspect.scanPartitionsOf(pruned) <
      cat.dataFilePaths(t).size)
  }

  test("partitioned updateWhere rewrites only touched partition dirs") {
    val root = tempDir("part")
    val cat = new graft.catalog.TableCatalog(spark, root)
    val t = "d.s.pprune"
    cat.overwritePartitioned(t,
      Seq(("p1", 1, 1), ("p2", 2, 1), ("p3", 3, 1))
        .toDF("practice", "id", "IS_NEW"),
      Seq("practice"))
    def leafFiles(v: String, part: String): Set[String] =
      Option(new java.io.File(s"$root/d/s/pprune/$v/practice=$part").listFiles)
        .map(_.toSeq).getOrElse(Nil)
        .filter(f => f.isFile && f.getName.startsWith("part-"))
        .map(_.getName).toSet
    val p1Before = leafFiles("v_000000", "p1")
    val p3Before = leafFiles("v_000000", "p3")
    assert(p1Before.nonEmpty && p3Before.nonEmpty)

    // predicate matches rows only in practice=p2
    cat.updateWhere(t, Map("IS_NEW" -> org.apache.spark.sql.functions.lit(0)),
      col("practice") === "p2")
    val v1 = new java.io.File(s"$root/d/s/pprune/v_000001")
    assert(v1.isDirectory && new java.io.File(v1, "_MANIFEST").exists)
    // new version holds ONLY the rewritten p2 partition
    assert(leafFiles("v_000001", "p2").nonEmpty)
    assert(leafFiles("v_000001", "p1").isEmpty && leafFiles("v_000001", "p3").isEmpty)
    // untouched partitions carried by manifest, original files in place
    val manifest = scala.io.Source.fromFile(new java.io.File(v1, "_MANIFEST"))
      .getLines().mkString("\n")
    assert(manifest.contains("v_000000/practice=p1"))
    assert(manifest.contains("v_000000/practice=p3"))
    assert(!manifest.contains("practice=p2"))
    assert(leafFiles("v_000000", "p1") == p1Before)
    assert(leafFiles("v_000000", "p3") == p3Before)
    val rows = cat.read(t).select("id", "IS_NEW")
      .as[(Int, Int)].collect().toMap
    assert(rows == Map(1 -> 1, 2 -> 0, 3 -> 1))
    // partition pruning still reaches the scan after a pruned update
    // (connector-backed read: count scheduled slices)
    val prunedRead = cat.read(t).filter($"practice" === "p1")
    prunedRead.collect()
    assert(graft.connector.GraftPlanInspect.scanPartitionsOf(prunedRead) <
      cat.dataFilePaths(t).size)
    // no-match predicate is a no-op: no new version directory
    cat.updateWhere(t, Map("IS_NEW" -> org.apache.spark.sql.functions.lit(9)),
      col("id") === -1)
    assert(!new java.io.File(s"$root/d/s/pprune/v_000002").exists)
  }

  test("partitioned merge rewrites only partitions overlapping source keys") {
    val root = tempDir("part")
    val cat = new graft.catalog.TableCatalog(spark, root)
    val t = "d.s.pmerge"
    cat.overwritePartitioned(t,
      Seq(("p1", 1, "old"), ("p2", 2, "old"), ("p3", 3, "old"))
        .toDF("practice", "id", "v"),
      Seq("practice"))
    // source touches id=2 (practice=p2) and introduces p9
    cat.merge(t, Seq(("p2", 2, "new"), ("p9", 9, "new")).toDF("practice", "id", "v"),
      Seq("id"))
    val v1 = new java.io.File(s"$root/d/s/pmerge/v_000001")
    assert(new java.io.File(v1, "_MANIFEST").exists)
    val manifest = scala.io.Source.fromFile(new java.io.File(v1, "_MANIFEST"))
      .getLines().mkString("\n")
    assert(manifest.contains("v_000000/practice=p1"))
    assert(manifest.contains("v_000000/practice=p3"))
    assert(!manifest.contains("practice=p2"))
    // new partition value lands in the new version dir
    assert(new java.io.File(v1, "practice=p9").isDirectory)
    val rows = cat.read(t).select("id", "v").as[(Int, String)].collect().toMap
    assert(rows == Map(1 -> "old", 2 -> "new", 3 -> "old", 9 -> "new"))
    // zero-overlap merge appends without rewriting any partition
    cat.merge(t, Seq(("p1", 100, "new")).toDF("practice", "id", "v"), Seq("id"))
    val rows2 = cat.read(t).select("id", "v").as[(Int, String)].collect().toMap
    assert(rows2.size == 5 && rows2(100) == "new" && rows2(1) == "old")
  }
}
