package graft.functions.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Karp–Rabin rolling polynomial hash of a string's UTF-8 bytes:
  * `h = Σ byte_i · B^(n-1-i)  mod M` with B=257, M=2^61−1 (a Mersenne
  * prime, so the modulo reduces with shifts). A content-defined
  * document fingerprint: cheap, incremental, and usable for
  * chunk-level dedup (the rolling property lets a scanner slide a
  * window in O(1) per byte).
  *
  * Native expression with `doGenCode` — the fingerprint runs over every
  * document byte, exactly where interpreted eval would hurt most.
  */
case class RollingHash(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any =
    RollingHash.compute(v.asInstanceOf[UTF8String].getBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = RollingHash.getClass.getName.stripSuffix("$") + "$"
      s"${ev.value} = $cls.MODULE$$.compute($c.getBytes());"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingHash {
  final val Base = 257L
  final val Mod = (1L << 61) - 1 // Mersenne prime 2^61-1

  /** x mod (2^61−1) for any non-negative x < 2^63: fold the high bits
    * down (2^61 ≡ 1), one conditional subtract finishes. */
  private def modM(x: Long): Long = {
    var r = (x & Mod) + (x >>> 61)
    if (r >= Mod) r -= Mod
    r
  }

  /** h·257 mod M for h < M, overflow-free: h·256 = (hi·2^53)·256 + lo·256
    * with hi < 2^8, lo < 2^53; hi·2^61 ≡ hi (mod M), lo<<8 < 2^61. */
  private def times257(h: Long): Long = {
    val hi = h >>> 53
    val lo = h & ((1L << 53) - 1)
    modM(modM((lo << 8) + hi) + h)
  }

  def compute(bytes: Array[Byte]): Long = {
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = modM(times257(h) + (bytes(i) & 0xff))
      i += 1
    }
    h
  }
}
