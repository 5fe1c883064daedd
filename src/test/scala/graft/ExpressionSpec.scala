package graft

import org.apache.spark.sql.functions._
import graft.functions.expressions.{GraftFunctions, HammingDistance, RollingHash}

class ExpressionSpec extends SparkTestBase {
  import spark.implicits._

  test("hamming: scala reference semantics") {
    assert(HammingDistance.compute("10101", "10101") == 0)
    assert(HammingDistance.compute("10101", "10011") == 2)
    assert(HammingDistance.compute("111", "11100") == 2) // length diff counts
    assert(HammingDistance.compute("", "") == 0)
  }

  test("rolling hash matches BigInt reference implementation") {
    def reference(s: String): Long = {
      val M = BigInt(2).pow(61) - 1
      s.getBytes("UTF-8").foldLeft(BigInt(0))((h, b) =>
        (h * 257 + (b & 0xff)) mod M).toLong
    }
    for (s <- Seq("", "a", "hello world", "the quick brown fox", "ü β 漢字",
        "x" * 10000)) {
      assert(RollingHash.compute(s.getBytes("UTF-8")) == reference(s), s"input: $s")
    }
  }

  test("rolling property: equal content equal hash, any change changes it") {
    val base = RollingHash.compute("abcdef".getBytes)
    assert(RollingHash.compute("abcdef".getBytes) == base)
    assert(RollingHash.compute("abcdeg".getBytes) != base)
    assert(RollingHash.compute("abcde".getBytes) != base)
  }

  test("expressions run inside dataframes via registry (codegen path)") {
    GraftFunctions.register(spark)
    val df = Seq(("1010", "1001", "abc"), ("1111", "1111", "abc"))
      .toDF("a", "b", "s")
    val out = df.select(
      GraftFunctions.hamming(col("a"), col("b")).as("h"),
      GraftFunctions.rollingHash(col("s")).as("r"))
      .as[(Int, Long)].collect()
    assert(out(0)._1 == 2 && out(1)._1 == 0)
    assert(out(0)._2 == out(1)._2) // same string, same fingerprint
    assert(out(0)._2 == RollingHash.compute("abc".getBytes))
  }

  test("expressions usable from SQL after registration") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_hamming('abc', 'abd') AS h, graft_rolling_hash('abc') AS f")
      .as[(Int, Long)].head()
    assert(r._1 == 1)
    assert(r._2 == RollingHash.compute("abc".getBytes))
  }

  test("null inputs propagate null") {
    GraftFunctions.register(spark)
    val r = spark.sql("SELECT graft_hamming(NULL, 'a') AS h, graft_rolling_hash(NULL) AS f")
      .head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
