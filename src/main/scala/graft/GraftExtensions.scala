package graft

import graft.functions.{SimHash64, SrpCode, TextFunctions, VecDot}
import org.apache.spark.sql.{Column, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graftbridge.Bridge

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

  /** Register a 1-arg Column-composition (e.g. the TextFunctions curation
    * helpers) as a SQL function: the child expression crosses the Bridge
    * into Column space, the composition builds the same codegen'd
    * expression tree the Scala API builds, and the result crosses back —
    * SQL ≡ Column API by construction, no UDF serialization anywhere. */
  private def columnFn1(ext: SparkSessionExtensions, name: String)
      (f: Column => Column): Unit =
    ext.injectFunction((
      new FunctionIdentifier(name),
      new ExpressionInfo(TextFunctions.getClass.getName, name),
      (args: Seq[Expression]) => args match {
        case Seq(e) => Bridge.eagerExpression(f(Bridge.column(e)))
        case _ => throw new IllegalArgumentException(s"$name(text)")
      }))

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
    // Curation surface for SQL-only engine users (notebook cells):
    columnFn1(ext, "graft_tokens")(TextFunctions.tokens)
    columnFn1(ext, "graft_quality")(TextFunctions.qualityScore)
    columnFn1(ext, "graft_langid")(TextFunctions.langId)
    columnFn1(ext, "graft_fingerprint")(TextFunctions.fingerprint)
    // fingerprint of the blocklist-scrubbed token stream — the SAME
    // expression txt_scrub emits as scrubbed_fp (shared definition, so the
    // SQL surface can't drift from the driver query)
    columnFn1(ext, "graft_scrub_fp")(graft.operators.TextQueries.scrubFp)
  }
}
