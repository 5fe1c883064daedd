package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Hamming distance between two equal-length strings (e.g. 64-char
  * SimHash bit signatures): the number of positions whose characters
  * differ. Unequal lengths count the length difference as distance.
  *
  * Implemented as a native Catalyst expression with `doGenCode` so it
  * participates in whole-stage codegen on the near-dup pair join's hot
  * path — a Scala UDF here would break the WSCG span and box every row.
  */
case class HammingDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
      s"hamming requires (string, string), got (${left.dataType}, ${right.dataType})")
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[UTF8String].toString
    val b = r.asInstanceOf[UTF8String].toString
    HammingDistance.compute(a, b)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val cls = HammingDistance.getClass.getName.stripSuffix("$") + "$"
      s"""
         |${ev.value} = $cls.MODULE$$.compute($a.toString(), $b.toString());
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object HammingDistance {
  def compute(a: String, b: String): Int = {
    val n = math.min(a.length, b.length)
    var d = math.abs(a.length - b.length)
    var i = 0
    while (i < n) {
      if (a.charAt(i) != b.charAt(i)) d += 1
      i += 1
    }
    d
  }
}
