package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression: the 20 affine MinHashes of a token
  * array (4 band hashes + 16 estimator hashes) in ONE projection
  * pass.
  *
  * Semantics are bit-identical to the SQL formulation it replaces
  * (still the DuckDB oracle of q_minhash_est): per token,
  * x = first 7 hex digits of sha2(token, 256) as an integer (the
  * high 28 bits of the digest), then
  *   h_i = min over tokens of (2000003 + 104729·i)·x + (15485863·i + 17) mod 1e9+7, i = 0..3
  *   m_i = min over tokens of (1000003 + 7919·i)·x +  (7907·i + 13)  mod 1e9+7, i = 0..15
  * Output array = [h0..h3, m0..m15]. min over a multiset equals min
  * over the distinct set, so the SQL path's array_distinct is
  * irrelevant here and the expression skips it.
  *
  * Why: the SQL path explodes every token into a row and hash-aggs
  * 20 min() columns per document — the shuffle is small (map-side
  * combine ships 20 partials), but the explode + per-row agg
  * machinery dominates wall-clock. This expression walks the token
  * array once per DOCUMENT, runs SHA-256 once per token, folds the
  * 20 mins in registers, and emits the signature as a projection —
  * zero explode, zero agg, stays inside whole-stage codegen
  * (generated code is a single static call, like [[SimHash63]]).
  *
  * Registered as SQL function `graft_minhash20` via GraftExtensions.
  */
case class MinHash20(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** Nullable even for a non-null child: compute() returns null for
    * an empty/all-null token array (the SQL group would vanish).
    * With the default nullable = child.nullable, whole-stage codegen
    * would treat that null as a valid ArrayData and downstream
    * element_at/sha2 consumers would NPE — unreachable from in-repo
    * call sites (split() never yields an empty array) but live for
    * SQL users of graft_minhash20, e.g. SELECT
    * graft_minhash20(array()). */
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash20 expects array<string>, got ${other.simpleString}")
  }

  override protected def nullSafeEval(input: Any): Any =
    MinHash20.compute(input.asInstanceOf[ArrayData])

  /** nullSafeCodeGen, not defineCodeGen: the latter never writes
    * ev.isNull from the result, so compute()'s null would flow into
    * generated code as a non-null value. (SimHash63 can keep
    * defineCodeGen — it returns a primitive long.) */
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.MinHash20.compute($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): MinHash20 =
    copy(child = newChild)

  override def prettyName: String = "graft_minhash20"
}

object MinHash20 {
  private val P = 1000000007L
  // coefficient tables mirror the SQL formulation verbatim
  private val A: Array[Long] =
    (0 until 4).map(i => 2000003L + 104729L * i).toArray ++
      (0 until 16).map(i => 1000003L + 7919L * i)
  private val B: Array[Long] =
    (0 until 4).map(i => 15485863L * i + 17L).toArray ++
      (0 until 16).map(i => 7907L * i + 13L)

  /** One-pass 20-hash MinHash signature (static so codegen can call
    * it). Null tokens are skipped, matching the SQL path where a
    * null token's x is null and drops out of min(). Returns null for
    * an all-null/empty array — the SQL group would vanish, and a
    * null signature keeps that row visibly out of every band. */
  def compute(arr: ArrayData): GenericArrayData = {
    val mins = Array.fill(20)(Long.MaxValue)
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val n = arr.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        // first 7 hex digits == high 28 bits of the first 4 bytes
        val x = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)) >>> 4
        var k = 0
        while (k < 20) {
          val v = (A(k) * x + B(k)) % P
          if (v < mins(k)) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }
}
