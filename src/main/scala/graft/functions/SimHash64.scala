package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the 64-bit SimHash of a text column:
  * per bit, the sign of the ±1 sum over the 60-bit token hashes of the
  * whitespace tokens (`graft.ops.DedupOps.simHash` semantics, pinned
  * equal by `SimHash64Spec`).
  *
  * As an expression it participates in whole-stage codegen — the
  * signature computation fuses into the scan pipeline instead of
  * breaking it with a `mapPartitions` iterator boundary, and the hot
  * loop is one static call on the UTF8 bytes with zero per-row
  * allocation beyond the 64-slot counter array.
  */
final case class SimHash64(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"simhash64 needs a string child, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    SimHash64.hash(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.SimHash64.hash($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : SimHash64 = copy(child = newChild)
}

object SimHash64 {

  /** Shared by interpreted eval and generated code: split on single
    * spaces (empty tokens skipped — the engine's `tokens()` semantics),
    * fold each token with the double-base polynomial `tokenHash60`, and
    * accumulate bit votes.
    */
  def hash(s: UTF8String): Long = {
    val str = s.toString
    val sums = new Array[Int](64)
    var start = 0
    val n = str.length
    var i = 0
    while (i <= n) {
      if (i == n || str.charAt(i) == ' ') {
        if (i > start) {
          val th = tokenHash60(str, start, i)
          var b = 0
          while (b < 64) {
            if (((th >> b) & 1L) == 1L) sums(b) += 1 else sums(b) -= 1
            b += 1
          }
        }
        start = i + 1
      }
      i += 1
    }
    var h = 0L
    var b = 0
    while (b < 64) { if (sums(b) > 0) h |= (1L << b); b += 1 }
    h
  }

  /** `polyHash(tok,131) + polyHash(tok,257) << 30` over a char slice —
    * bit-identical to `DedupOps.tokenHash60Jvm` on the substring.
    */
  private def tokenHash60(s: String, from: Int, until: Int): Long = {
    var a = 0L
    var b = 0L
    var i = from
    while (i < until) {
      val c = s.charAt(i).toLong
      a = (a * 131L + c) % 1000000007L
      b = (b * 257L + c) % 1000000007L
      i += 1
    }
    a + b * 1073741824L
  }

  /** Column builder: `simHash64(col("text"))`. */
  def simHash64(c: Column): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c)))
}
