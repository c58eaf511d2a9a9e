package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, LongType}

/** Native sign-random-projection bucket code: `bits` hyperplanes with ±1
  * coefficients derived from a splitmix64 stream seeded by (seed, plane,
  * dim). One pass over the vector computes every plane's projection — the
  * higher-order-function formulation re-walked the array once per plane
  * through interpreted lambdas (bits × dims lambda evals per row).
  *
  * JVM arithmetic wraps silently, so the mixing that ANSI mode rejects in
  * Column space (see DedupOps history) is fine here.
  */
case class SrpCode(child: Expression, bits: Int, seed: Int)
    extends UnaryExpression {

  require(bits > 0 && bits <= 30)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"srp_code requires array<double>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "srp_code"

  private def mix(z0: Long): Long = {
    var z = z0 + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  /** Shared by interpreted eval and generated code (kept inside the
    * surrounding WholeStageCodegen span via a reference-object call —
    * a CodegenFallback would split the span). */
  def codeOf(v: ArrayData): Long = {
    val n = v.numElements()
    val proj = new Array[Double](bits)
    var i = 0
    while (i < n) {
      val x = v.getDouble(i)
      var p = 0
      while (p < bits) {
        val h = mix(seed.toLong * 0x100000001L + p.toLong * 65537L + i)
        if ((h & 1L) == 0L) proj(p) += x else proj(p) -= x
        p += 1
      }
      i += 1
    }
    var code = 0L
    var p = 0
    while (p < bits) {
      if (proj(p) >= 0) code |= (1L << p)
      p += 1
    }
    code
  }

  override protected def nullSafeEval(input: Any): Any =
    codeOf(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("srp", this, classOf[SrpCode].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.codeOf($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): SrpCode =
    copy(child = newChild)
}

object SrpCode {
  def apply(v: Column, bits: Int, seed: Int): Column =
    Bridge.column(SrpCode(Bridge.expression(v), bits, seed))
}
