package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.GraftColumnBridge
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the engine's polynomial rolling hash
  * (`acc = (acc * base + codePoint) % 1000000007`, the deterministic
  * engine-portable hash used for fingerprints and shingles — see
  * `graft.ops.DedupOps.polyHash`).
  *
  * The `functions.aggregate(transform(split(...)))` formulation of the
  * same hash runs as an interpreted higher-order function allocating an
  * array of per-char longs per row; this expression participates in
  * whole-stage codegen and hashes the UTF8 bytes in one tight loop, no
  * allocation. Semantics pinned by `PolyHashSpec`: identical to the HOF
  * formulation, the JVM mirror, and the DuckDB oracle's `list_reduce`
  * (code-point folding; the corpus is ASCII so byte == code point, and
  * non-ASCII falls back to code-point iteration for exactness).
  */
final case class PolyHash(child: Expression, base: Long)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"polyhash needs a string child, got ${child.dataType}")
  }

  override def nullSafeEval(input: Any): Any =
    PolyHash.hash(input.asInstanceOf[UTF8String], base)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.PolyHash.hash($c, ${base}L)")

  override protected def withNewChildInternal(newChild: Expression): PolyHash =
    copy(child = newChild)
}

object PolyHash {

  /** The fold itself, shared by interpreted eval and generated code.
    * ASCII fast path walks bytes; any non-ASCII byte falls back to
    * code-point iteration so the result always folds Unicode code points
    * (what `ascii()`/DuckDB `ascii()` return for the leading char).
    */
  def hash(s: UTF8String, base: Long): Long = {
    val n = s.numBytes()
    var acc = 0L
    var i = 0
    var ascii = true
    while (ascii && i < n) {
      val b = s.getByte(i)
      if (b < 0) ascii = false
      else { acc = (acc * base + b) % 1000000007L; i += 1 }
    }
    if (ascii) acc
    else {
      // rare path: restart on code points
      acc = 0L
      val str = s.toString
      var j = 0
      while (j < str.length) {
        val cp = str.codePointAt(j)
        acc = (acc * base + cp) % 1000000007L
        j += Character.charCount(cp)
      }
      acc
    }
  }

  /** Column builder: `polyHash(col("text"), 31)`. */
  def polyHash(c: Column, base: Long): Column =
    GraftColumnBridge.column(
      PolyHash(GraftColumnBridge.expression(c), base))
}
