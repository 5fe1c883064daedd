package graft.functions.expressions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode text canonicalization for match keys and dedup
  * fingerprints. Web/EHR text mixes composed ("á" U+00E1) and
  * decomposed ("a" + U+0301) forms of the same grapheme; byte-level
  * dedup, shingling, and join keys all treat those as different
  * strings unless the corpus is normalized first. The reference
  * normalizes match keys by case/alnum-stripping
  * (REFINED_SNOWFLAKE_TO_CURATED_SNOWFLAKE.py:1019); these kernels are
  * the Unicode-correct generalization a multilingual corpus needs.
  *
  * Native expressions (not UDFs) so normalization fuses into the scan
  * projection under whole-stage codegen.
  */
private[graft] trait StringUnaryExpression extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType ||
        child.dataType == org.apache.spark.sql.types.NullType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")
}

/** Canonical composition (Unicode NFC): combining sequences collapse
  * to their composed code points, so equal-looking strings compare
  * equal byte-wise. */
case class NfcNormalize(child: Expression) extends StringUnaryExpression {
  override def prettyName: String = "graft_nfc"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      NfcNormalize.compute(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = NfcNormalize.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$cls.MODULE$$.compute($c.toString()));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NfcNormalize {
  def compute(s: String): String =
    // already-normalized fast path: isNormalized is a cheap scan and
    // the overwhelmingly common case on ASCII-heavy corpora
    if (Normalizer.isNormalized(s, Normalizer.Form.NFC)) s
    else Normalizer.normalize(s, Normalizer.Form.NFC)
}

/** Accent folding: canonical decomposition (NFD) then drop combining
  * marks — "á" → "a", leaving base characters intact. The standard
  * pre-step for accent-insensitive match keys. */
case class StripAccents(child: Expression) extends StringUnaryExpression {
  override def prettyName: String = "graft_strip_accents"

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(
      StripAccents.compute(v.asInstanceOf[UTF8String].toString))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = StripAccents.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"$cls.MODULE$$.compute($c.toString()));"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object StripAccents {
  def compute(s: String): String = {
    val d = Normalizer.normalize(s, Normalizer.Form.NFD)
    var i = 0
    var clean = true
    while (clean && i < d.length) {
      if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK)
        clean = false
      i += 1
    }
    if (clean) return d
    val sb = new java.lang.StringBuilder(d.length)
    i = 0
    while (i < d.length) {
      val c = d.charAt(i)
      if (Character.getType(c) != Character.NON_SPACING_MARK) sb.append(c)
      i += 1
    }
    sb.toString
  }
}
