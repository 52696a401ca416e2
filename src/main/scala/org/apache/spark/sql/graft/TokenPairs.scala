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
  private val Space: Byte = ' '

  /** (tok_i, tok_i+1) structs from resolved token boundaries — shared
    * tail of both kernels. Token slices alias the input buffer.
    */
  private def pairsFrom(bytes: Array[Byte], starts: Array[Int],
                        ends: Array[Int], n: Int): GenericArrayData = {
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val toks = new Array[UTF8String](n)
    var i = 0
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

  /** Adjacent pairs straight off an ArrayData of strings — the array-level
    * kernel behind AdjacentWordPairsRule (the optimizer can't reach the
    * pre-split string through a Project boundary, but the split array is
    * right there): one pass, element references aliased into the structs,
    * no sequence array, no lambda interpretation, no element_at calls.
    * Null elements pass through into (nullable) struct fields, exactly as
    * the builtin element_at chain would surface them.
    */
  def arrayPairs(arr: org.apache.spark.sql.catalyst.util.ArrayData): GenericArrayData = {
    val n = arr.numElements()
    if (n < 2) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](n - 1)
    var prev: UTF8String = if (arr.isNullAt(0)) null else arr.getUTF8String(0)
    var i = 0
    while (i < n - 1) {
      val next: UTF8String = if (arr.isNullAt(i + 1)) null else arr.getUTF8String(i + 1)
      out(i) = new GenericInternalRow(Array[Any](prev, next))
      prev = next
      i += 1
    }
    new GenericArrayData(out)
  }

  /** Adjacent word pairs of a SPACE-separated text in one byte scan —
    * bit-identical to `explode(transform(sequence(1, size(w)-1),
    * i -> struct(element_at(w,i), element_at(w,i+1))))` over
    * `w = split(text, " ")`, including Java split's limit=-1 semantics
    * (empty tokens from doubled/leading/trailing spaces are KEPT; empty
    * input yields the single empty token). UTF-8 continuation bytes are
    * ≥ 0x80, so cutting on the ASCII space byte is exact on any input.
    * Fewer than two tokens yields an empty array — the builtin path's
    * `size(w) >= 2` filter, absorbed.
    */
  def wordPairs(text: UTF8String): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    val cap = len + 1 // all-spaces worst case: len+1 (empty) tokens
    val starts = new Array[Int](cap)
    val ends = new Array[Int](cap)
    var n = 0
    var start = 0
    var i = 0
    while (i < len) {
      if (bytes(i) == Space) { starts(n) = start; ends(n) = i; n += 1; start = i + 1 }
      i += 1
    }
    starts(n) = start; ends(n) = len; n += 1
    pairsFrom(bytes, starts, ends, n)
  }

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
    pairsFrom(bytes, starts, ends, n)
  }
}

/** Shared shape of the adjacent-pairs expressions: array<struct<a,b>> of
  * non-null strings, null iff the input string is null. Field names are
  * overridable so the optimizer rewrite (AdjacentWordPairsRule) can
  * preserve whatever names the user's struct(... AS x, ... AS y) chose.
  */
sealed trait AdjacentPairsExpression extends UnaryExpression with ImplicitCastInputTypes {
  def aName: String
  def bName: String
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField(aName, StringType, nullable = false),
      StructField(bName, StringType, nullable = false))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
}

case class TokenPairs(child: Expression) extends AdjacentPairsExpression {
  override def aName: String = "a"
  override def bName: String = "b"
  override def prettyName: String = "graft_token_pairs"

  override def nullSafeEval(s: Any): Any =
    TokenPairs.tokenPairs(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenPairs.tokenPairs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Adjacent space-separated word pairs of a raw text column — the
  * collocations/bigram hot path fused into one byte scan (see
  * TokenPairs.wordPairs for the exact-equivalence contract with the
  * split/transform/element_at builtin chain it replaces).
  */
/** Adjacent pairs of an array<string> column — the optimizer-rewrite
  * target (AdjacentWordPairsRule): where WordPairs needs the pre-split
  * STRING, this kernel takes the split ARRAY the plan already has. Struct
  * field nullability mirrors the input's element nullability (a null
  * element surfaces in its pairs exactly as the element_at chain would).
  */
case class ArrayAdjacentPairs(child: Expression,
    aName: String = "a", bName: String = "b") extends UnaryExpression
  with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  private def elementsNullable: Boolean = child.dataType match {
    case ArrayType(_, n) => n
    case _ => true
  }
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField(aName, StringType, nullable = elementsNullable),
      StructField(bName, StringType, nullable = elementsNullable))),
    containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_array_adjacent_pairs"

  override def nullSafeEval(a: Any): Any =
    TokenPairs.arrayPairs(a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenPairs.arrayPairs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordPairs(child: Expression, aName: String = "a", bName: String = "b")
  extends AdjacentPairsExpression {
  override def prettyName: String = "graft_word_pairs"

  override def nullSafeEval(s: Any): Any =
    TokenPairs.wordPairs(s.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenPairs.wordPairs($c);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
