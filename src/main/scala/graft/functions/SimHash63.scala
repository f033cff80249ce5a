package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the 63-bit SimHash of a token array,
  * in ONE projection pass.
  *
  * Semantics are bit-identical to the SQL formulation it replaces
  * (ops/Text.scala simhashSigs63Sql, still the DuckDB oracle): per
  * token, sgn(p) = +1 if hex digit p of sha2(token, 256) is ≥ 8 else
  * −1 for p = 1..63; bit p of the signature is 1 iff Σ_tokens sgn(p)
  * > 0. Hex digit p (1-based) is the high/low nibble of SHA-256 byte
  * (p−1)/2 — pure integer math, so engine parity is exact.
  *
  * Why: the SQL path explodes tokens ×63 bit positions and hash-aggs
  * on (doc_id, p) — a 63× row blow-up plus two shuffles. This
  * expression walks the token array once per DOCUMENT, keeps 63
  * counters in a local array, and emits the signature — zero shuffle,
  * and the SHA-256 runs once per token instead of feeding 63 exploded
  * rows. The heavy work (MessageDigest) sits in a static helper; the
  * generated code is a single call, so the expression stays inside
  * whole-stage codegen.
  *
  * Registered as SQL function `graft_simhash63` via GraftExtensions.
  */
case class SimHash63(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash63 expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    SimHash63.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash63.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash63 =
    copy(child = newChild)

  override def prettyName: String = "graft_simhash63"
}

object SimHash63 {
  /** One-pass 63-bit SimHash over the token array (static so codegen
    * can call it). Null tokens are skipped (the SQL path's sha2(null)
    * row would be null and drop out of the sum the same way). */
  def compute(arr: ArrayData): Long = {
    val counters = new Array[Int](63)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val digest = md.digest(arr.getUTF8String(i).getBytes)
        var p = 0 // 0-based hex-digit index == SQL's (p+1)-th digit
        while (p < 63) {
          val b = digest(p >> 1) & 0xff
          val nibble = if ((p & 1) == 0) b >> 4 else b & 0x0f
          counters(p) += (if (nibble >= 8) 1 else -1)
          p += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var p = 0
    while (p < 63) {
      if (counters(p) > 0) sig |= 1L << p
      p += 1
    }
    sig
  }
}
