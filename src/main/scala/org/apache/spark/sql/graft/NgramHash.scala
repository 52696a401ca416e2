package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Fused word-n-gram 60-bit hashing — the shingling front end of every
  * set-similarity operator (`graft.llm.Dedup`, decontamination,
  * fingerprints, shared-span mining), as ONE native expression.
  *
  * Replaces the builtin pipeline
  * `transform(sequence(1, greatest(size(w)-(n-1), 1)),
  *            i -> conv(substring(md5(concat_ws(' ', slice(w, i, n))), 1, 15), 16, 10))`
  * (optionally under `array_distinct`) with a single traversal that
  * produces BIT-IDENTICAL values, so every DuckDB oracle is untouched:
  *
  *  - Because the tokenizer splits on a single space and the builder
  *    rejoins with a single space, each n-gram's UTF-8 bytes are exactly a
  *    CONTIGUOUS RANGE of the original text — `md5(concat_ws(...))` ==
  *    md5 over `bytes[wordStart(i), wordEnd(min(i+n-1, nw-1)))`. The fused
  *    form therefore allocates NO per-gram strings, no slice arrays, no
  *    sequence array: one boundary scan, then one MD5 per gram over a byte
  *    range (hex encode + base-16 reparse also gone — the first 15 hex
  *    chars ARE the top 60 bits of the big-endian first 8 digest bytes).
  *  - `greatest(..., 1)` semantics kept: docs with < n words emit one gram
  *    covering the whole text (slice clamps); empty text hashes "".
  *  - `distinct = true` reproduces `array_distinct` exactly: first
  *    occurrence wins, insertion order preserved.
  *
  * `NgramHashSpec` pins expression-vs-builtin equality on the corpus;
  * the dedup pipelines A/B through the same oracles they always had.
  */
object NgramHash {
  private val mdLocal = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Core kernel; also called from generated code. */
  def wordNgramHashes60(text: UTF8String, n: Int, distinct: Boolean): GenericArrayData = {
    val bytes = text.getBytes
    val len = bytes.length
    var nw = 1
    var i = 0
    while (i < len) { if (bytes(i) == ' ') nw += 1; i += 1 }
    val starts = new Array[Int](nw)
    val ends = new Array[Int](nw)
    var wi = 0
    starts(0) = 0
    i = 0
    while (i < len) {
      if (bytes(i) == ' ') { ends(wi) = i; wi += 1; starts(wi) = i + 1 }
      i += 1
    }
    ends(wi) = len
    val m = math.max(nw - (n - 1), 1)
    val digest = mdLocal.get()
    val out = new Array[Long](m)
    var outN = 0
    val seen = if (distinct) new java.util.HashSet[java.lang.Long](m * 2) else null
    var g = 0
    while (g < m) {
      val start = starts(g)
      val lastW = math.min(g + n - 1, nw - 1)
      digest.reset()
      digest.update(bytes, start, ends(lastW) - start)
      val d = digest.digest()
      var v = 0L
      var k = 0
      while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
      v = v >>> 4 // top 60 bits == first 15 hex chars of the md5 string
      if (seen == null || seen.add(v)) { out(outN) = v; outN += 1 }
      g += 1
    }
    new GenericArrayData(
      if (outN == m) out else java.util.Arrays.copyOf(out, outN))
  }
}

/** 60-bit SimHash of an `array<long>` of (distinct) token hashes — one
  * fused pass replacing the explode → 60-conditional-sums → reassemble
  * aggregation (`graft.llm.Dedup.simhashOf`'s original shape): per bit j,
  * count +1/−1 votes across tokens, set bit j iff the sum is positive.
  * Integer vote sums are order-independent, so the value is exactly the
  * aggregation form's at any parallelism — the DuckDB oracle (which still
  * uses explode+SUM) is untouched. Eliminates the corpus-×-vocabulary
  * exploded intermediate entirely: the shuffle disappears, SimHash becomes
  * a pure map stage.
  */
case class Simhash60(child: Expression)
  extends UnaryExpression with ImplicitCastInputTypes {
  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_simhash60"

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
    val n = x.numElements()
    val counts = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (x.isNullAt(i)) return null
      val h = x.getLong(i)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var v = 0L
    var j = 0
    while (j < 60) {
      if (counts(j) > 0) v |= (1L << j)
      j += 1
    }
    v
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val n = ctx.freshName("n")
      val h = ctx.freshName("h")
      val counts = ctx.freshName("counts")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |int[] $counts = new int[60];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($c.isNullAt($i)) { ${ev.isNull} = true; break; }
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < 60; $j++) {
         |    if ((($h >>> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |if (!${ev.isNull}) {
         |  long $v = 0L;
         |  for (int $j = 0; $j < 60; $j++) if ($counts[$j] > 0) $v |= (1L << $j);
         |  ${ev.value} = $v;
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class WordNgramHashes(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression with ImplicitCastInputTypes {
  require(n >= 1)
  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_word_ngrams60"

  override def nullSafeEval(t: Any): Any =
    NgramHash.wordNgramHashes60(t.asInstanceOf[UTF8String], n, distinct)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.NgramHash.wordNgramHashes60($c, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
