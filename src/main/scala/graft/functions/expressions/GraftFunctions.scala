package graft.functions.expressions

import org.apache.spark.sql.{Column, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions.call_function

/** Registration + Column-API façade for the engine's native Catalyst
  * expressions. Spark 4 removed the public Expression⇄Column bridge, so
  * the supported path is FunctionRegistry registration + call_function.
  *
  * Use either:
  *  - `GraftFunctions.register(spark)` once per session, or
  *  - `.withExtensions(new GraftExtensions)` at session build time.
  */
object GraftFunctions {

  val functions: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_hamming" -> (exprs => HammingDistance(exprs(0), exprs(1))),
    "graft_rolling_hash" -> (exprs => RollingHash(exprs.head)),
    "graft_minhash" -> (exprs => MinHashSignature(exprs(0),
      exprs(1).eval().asInstanceOf[Int])))

  /** Idempotent per-session registration (temp functions). */
  def register(spark: SparkSession): Unit = {
    import org.apache.spark.sql.classic.ClassicConversions.castToImpl
    val registry = castToImpl(spark).sessionState.functionRegistry
    functions.foreach { case (name, builder) =>
      registry.createOrReplaceTempFunction(name, builder, "built-in")
    }
  }

  /** Hamming distance between two strings (SimHash signatures).
    * Requires registration. */
  def hamming(a: Column, b: Column): Column =
    call_function("graft_hamming", a, b)

  /** Karp–Rabin rolling-hash fingerprint of a string. Requires
    * registration. */
  def rollingHash(c: Column): Column =
    call_function("graft_rolling_hash", c)

  /** Per-row MinHash signature (array of `bands` md5-min values) over a
    * shingle-set array — no explode, no shuffle. Requires registration. */
  def minhashSignature(shingles: Column, bands: Int): Column =
    call_function("graft_minhash", shingles,
      org.apache.spark.sql.functions.lit(bands))
}

/** Session-extension wiring: injects the native functions at session
  * build time (`SparkSession.builder().withExtensions(new
  * GraftExtensions)`), the deployment-grade alternative to per-session
  * temp registration. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach { case (name, builder) =>
      ext.injectFunction((
        FunctionIdentifier(name),
        new ExpressionInfo(classOf[GraftExtensions].getName, name),
        builder))
    }
}
