package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Adjacent token pairs of a pipe-wrapped BPE state (`|t1||t2||t3|` →
  * [(t1,t2), (t2,t3)]) as ONE native expression.
  *
  * Replaces the builtin pipeline
  * `transform(sequence(1, size(toks)-1),
  *            i -> struct(element_at(toks,i), element_at(toks,i+1)))`
  * over `split(substring(state, 2, length-2), '\\|\\|')` with a single
  * byte scan producing BIT-IDENTICAL pairs, so the BPE oracles are
  * untouched:
  *
  *  - one boundary pass over the state's bytes finds every `||`
  *    separator (left-to-right non-overlapping, the same cut points the
  *    regex split produces); token slices alias the original buffer —
  *    no regex machinery, no split array, no sequence array, no
  *    per-element HOF evaluation with struct construction;
  *  - BPE tokens are `[a-z_]+` (single-byte UTF-8), so the byte scan is
  *    exact; the contract is byte-level anyway — on arbitrary input the
  *    result equals the builtin chain's because UTF-8 multi-byte units
  *    never contain the ASCII `|` byte;
  *  - fewer than two tokens (or a state shorter than 2 chars) yields an
  *    empty array, which `explode` then drops — the builtin path's
  *    `size(toks) >= 2` filter, absorbed.
  *
  * `TokenPairsSpec` pins expression-vs-builtin equality on corpus states
  * (both tokenization variants) and the run/edge cases; the BPE queries
  * keep their re-learning DuckDB oracles.
  */
object TokenPairs {
  private val Pipe: Byte = '|'

  /** Core kernel; also called from generated code. */
  def tokenPairs(state: UTF8String): GenericArrayData = {
    val bytes = state.getBytes
    val len = bytes.length
    if (len < 2) return new GenericArrayData(Array.empty[Any])
    // token boundaries inside the outer pipes — primitive arrays, no
    // boxing in the per-row hot path. Capacity is the MALFORMED worst
    // case (a separator every 2 bytes yields empty tokens): grammar
    // states bound n by len/3, but the expression must not index out of
    // bounds on arbitrary input
    val cap = len / 2 + 2
    val starts = new Array[Int](cap)
    val ends = new Array[Int](cap)
    var n = 0
    var start = 1
    var i = 1
    val inner = len - 1
    while (i < inner - 1) {
      if (bytes(i) == Pipe && bytes(i + 1) == Pipe) {
        starts(n) = start; ends(n) = i; n += 1; start = i + 2; i += 2
      } else i += 1
    }
    starts(n) = start; ends(n) = inner; n += 1
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    i = 0
    while (i < n) {
      toks(i) = UTF8String.fromBytes(bytes, starts(i), ends(i) - starts(i))
      i += 1
    }
    val out = new Array[Any](n - 1)
    i = 0
    while (i < n - 1) {
      out(i) = new GenericInternalRow(Array[Any](toks(i), toks(i + 1)))
      i += 1
    }
    new GenericArrayData(out)
  }
}

case class TokenPairs(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("a", StringType, nullable = false),
      StructField("b", StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_token_pairs"

  override def nullSafeEval(s: Any): Any =
    TokenPairs.tokenPairs(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenPairs.tokenPairs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
