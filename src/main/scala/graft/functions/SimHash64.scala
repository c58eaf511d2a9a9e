package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: 64-bit SimHash of a token array.
  *
  * For each token, take xxhash64(token) (seed 42, same as Spark's SQL
  * `xxhash64`) and accumulate +1/-1 per bit position; the signature's bit b
  * is 1 iff the accumulated count is positive. Near-duplicate documents
  * differ in few token counts, so their signatures are close in Hamming
  * distance (Charikar's SimHash, STOC'02).
  *
  * A native `Expression` (not a Scala UDF): operates on `ArrayData`/
  * `UTF8String` directly, no serialization at the row boundary. `doGenCode`
  * emits a call into `hashArray` via a codegen reference object — one
  * virtual call per row (negligible against the token loop) while KEEPING
  * the expression inside the surrounding WholeStageCodegen span, which a
  * `CodegenFallback` would split.
  *
  * Reference capability: robalaban/flink-notebooks has no dedup operator
  * (the Flink SQL envelope stops at exact `ROW_NUMBER`-dedup); this is part
  * of the training-data-pipeline extension surface (SURVEY.md §7.1 item 8).
  */
case class SimHash64(child: Expression)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash64 requires array<string>, got ${other.catalogString}")
  }
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  /** Shared by interpreted eval and generated code. */
  def hashArray(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val h = XxHash64Function.hash(arr.getUTF8String(i), StringType, 42L)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  override protected def nullSafeEval(input: Any): Any =
    hashArray(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("simhash", this, classOf[SimHash64].getName)
    nullSafeCodeGen(ctx, ev, arr => s"${ev.value} = $ref.hashArray($arr);")
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHash64 {
  /** Column API: simhash64(tokensCol). */
  def apply(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))
}
