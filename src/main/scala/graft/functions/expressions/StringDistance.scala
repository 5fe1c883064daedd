package graft.functions.expressions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Edit-distance kernels for entity resolution / fuzzy matching, as
  * native Catalyst expressions so the pair-comparison hot path stays
  * inside whole-stage codegen (a Scala UDF would box every candidate
  * pair emitted by the blocking join).
  *
  * The reference resolves patient/provider identities with normalized
  * match keys plus fuzzy comparison of names
  * (REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1019 normName handling);
  * these kernels are the standard string comparators such linkage
  * needs beyond plain `levenshtein` (which Spark ships built-in):
  * full Damerau–Levenshtein (edits + transpositions, the common
  * typo model) and Jaro–Winkler (prefix-weighted, the classic name
  * comparator).
  */
private[graft] trait StringPairExpression extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) =
      t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (string, string), got " +
        s"(${left.dataType}, ${right.dataType})")
  }
}

/** Full (unrestricted) Damerau–Levenshtein distance: insertions,
  * deletions, substitutions, and transpositions of adjacent characters,
  * where a transposed pair may be edited again later (distinct from the
  * cheaper optimal-string-alignment variant: full DL("CA","ABC") = 2,
  * OSA = 3). Algorithm: Wagner–Fischer matrix with last-occurrence
  * lookback rows, O(|a|·|b|) time and space — match-key inputs are
  * short strings, and rows never cross the expression boundary.
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends StringPairExpression {

  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_damerau"

  override def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshtein.compute(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = DamerauLevenshtein.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = $cls.MODULE$$.compute($a.toString(), $b.toString());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object DamerauLevenshtein {
  def compute(a: String, b: String): Int = {
    val n = a.length
    val m = b.length
    if (n == 0) return m
    if (m == 0) return n
    val inf = n + m
    // d is (n+2) x (m+2) with a sentinel border of `inf`
    val w = m + 2
    val d = new Array[Int]((n + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= n) { d((i + 1) * w + 1) = i; d((i + 1) * w) = inf; i += 1 }
    var j = 0
    while (j <= m) { d(w + j + 1) = j; d(j + 1) = inf; j += 1 }
    // last row index in `a` at which each char was seen
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= n) {
      var db = 0
      val ai = a.charAt(i - 1)
      j = 1
      while (j <= m) {
        val bj = b.charAt(j - 1)
        val k = { val v = da.get(bj); if (v == null) 0 else v.intValue() }
        val l = db
        val cost = if (ai == bj) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val trans = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = if (sub < ins) sub else ins
        if (del < best) best = del
        if (trans < best) best = trans
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(ai, i)
      i += 1
    }
    d((n + 1) * w + m + 1)
  }
}

/** Jaro–Winkler similarity in [0, 1]: Jaro match/transposition score
  * with the Winkler common-prefix bonus (p = 0.1, prefix capped at 4,
  * applied only above the 0.7 boost threshold) — the standard
  * parameterization. Double result; queries that cross an exactness
  * boundary should bucket it (e.g. `round(jw * 10000)`).
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends StringPairExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_jaro_winkler"

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinkler.compute(
      l.asInstanceOf[UTF8String].toString, r.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = JaroWinkler.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = $cls.MODULE$$.compute($a.toString(), $b.toString());"
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object JaroWinkler {
  def compute(s1: String, s2: String): Double = {
    if (s1 == s2) return 1.0
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    val md = math.max(l1, l2) / 2 - 1
    val m1 = new Array[Boolean](l1)
    val m2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - md)
      val hi = math.min(l2, i + md + 1)
      var done = false
      while (j < hi && !done) {
        if (!m2(j) && s2.charAt(j) == c) {
          m1(i) = true; m2(j) = true; m += 1; done = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    var t = 0
    var k = 0
    i = 0
    while (i < l1) {
      if (m1(i)) {
        while (!m2(k)) k += 1
        if (s1.charAt(i) != s2.charAt(k)) t += 1
        k += 1
      }
      i += 1
    }
    t /= 2
    var j = (m.toDouble / l1 + m.toDouble / l2 + (m - t).toDouble / m) / 3.0
    if (j > 0.7) {
      var p = 0
      val pm = math.min(4, math.min(l1, l2))
      while (p < pm && s1.charAt(p) == s2.charAt(p)) p += 1
      j += p * 0.1 * (1.0 - j)
    }
    j
  }
}
