package graft.functions.expressions

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** MinHash signature of a shingle SET, computed per row: for each band
  * b ∈ [0, bands), the lexicographic minimum of md5("b:" + shingle)
  * over the row's shingles — identical values to the relational
  * explode → groupBy(min) formulation (and to the DuckDB oracle), but
  * with NO explode and NO shuffle: the signature is a map-side scalar.
  * At 100 TB that deletes the dominant shuffle of the LSH pipeline;
  * only the (doc, band, minhash) bucket join remains.
  */
case class MinHashSignature(child: Expression, bands: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = MinHashSignature.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = $cls.MODULE$$.compute($c, $bands);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSignature {

  private val hexDigits = "0123456789abcdef".toCharArray

  /** md5 hex of `prefix:shingle` — byte-identical to
    * md5(concat(prefix, ':', shingle)) in Spark/DuckDB SQL. */
  private def md5Hex(md: java.security.MessageDigest, prefix: Array[Byte],
      shingle: Array[Byte]): String = {
    md.reset()
    md.update(prefix)
    md.update(shingle)
    val d = md.digest()
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = hexDigits((d(i) >> 4) & 0xf)
      out(2 * i + 1) = hexDigits(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  /** Rows with no shingles yield no signature entries (empty array) —
    * matching the explode formulation where such docs vanish. */
  def compute(shingles: ArrayData, bands: Int): ArrayData = {
    val n = shingles.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Any])
    val md = java.security.MessageDigest.getInstance("MD5")
    val bytes = new Array[Array[Byte]](n)
    var i = 0
    while (i < n) {
      bytes(i) = shingles.getUTF8String(i).getBytes
      i += 1
    }
    val out = new Array[Any](bands)
    var b = 0
    while (b < bands) {
      val prefix = s"$b:".getBytes(StandardCharsets.UTF_8)
      var min: String = null
      i = 0
      while (i < n) {
        val h = md5Hex(md, prefix, bytes(i))
        if (min == null || h.compareTo(min) < 0) min = h
        i += 1
      }
      out(b) = UTF8String.fromString(min)
      b += 1
    }
    new GenericArrayData(out)
  }
}
