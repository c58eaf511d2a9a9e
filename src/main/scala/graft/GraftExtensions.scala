package graft

import graft.functions.{SimHash64, SrpCode, VecDot}
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for the engine's native Catalyst expressions — registered
  * through `SparkSessionExtensions` (the brief's (c) extension route), so a
  * SQL-only engine user can call them without touching the Column API:
  *
  * {{{
  *   spark.sql("SELECT simhash64(split(lower(text), '\\s+')) FROM docs")
  *   spark.sql("SELECT srp_code(vec, 6, 0), vec_dot(a, b) FROM embeddings")
  * }}}
  *
  * Activated by `spark.sql.extensions=graft.GraftExtensions` (GraftSession
  * sets it) or `SparkSession.builder.withExtensions(new GraftExtensions)`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intLit(e: Expression, arg: String, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn: $arg must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHash64(tokens)
        case _ => throw new IllegalArgumentException(
          "simhash64(tokens: array<string>)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("srp_code"),
      new ExpressionInfo(classOf[SrpCode].getName, "srp_code"),
      (args: Seq[Expression]) => args match {
        case Seq(vec, bits, seed) =>
          SrpCode(vec, intLit(bits, "bits", "srp_code"),
            intLit(seed, "seed", "srp_code"))
        case _ => throw new IllegalArgumentException(
          "srp_code(vec: array<double>, bits: int literal, seed: int literal)")
      }))
    ext.injectFunction((
      new FunctionIdentifier("vec_dot"),
      new ExpressionInfo(classOf[VecDot].getName, "vec_dot"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => VecDot(a, b)
        case _ => throw new IllegalArgumentException(
          "vec_dot(a: array<double>, b: array<double>)")
      }))
  }
}
