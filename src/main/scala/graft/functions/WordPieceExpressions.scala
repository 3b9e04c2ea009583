package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** [[WordPieceEncode]]'s kernel: greedy longest-match ("maximum munch")
  * subword segmentation against a fixed vocabulary — the WordPiece
  * inference rule (Wu et al. 2016 §4.1; the BERT tokenizer's runtime
  * half). Per word, repeatedly take the LONGEST vocabulary piece that
  * prefixes the remaining suffix; pieces at word-start match the
  * word-initial table, pieces mid-word match the continuation table and
  * render with the `##` marker. A position no piece covers falls back to
  * consuming ONE character (rendered like any other piece), so encoding
  * is total — with a vocabulary whose character set covers the corpus
  * (as [[graft.ext.WordPiece.trainVocab]] guarantees by construction)
  * the fallback never fires, but parity with the oracle's
  * `coalesce(match_len, 1)` is exact either way.
  *
  * Cost per word: O(numChars × maxPieceLen) hash probes, zero
  * allocation beyond the emitted pieces; per document a single pass —
  * at 100 TB this is a map-only projection with the (bounded, ≤ a few
  * thousand entries) vocabulary riding the closure as codegen reference
  * objects, so encode scales embarrassingly with input splits.
  *
  * All positions are CODE POINTS (`UTF8String.substringSQL`), matching
  * SQL `substr` semantics in the DuckDB oracle byte-for-byte on any
  * UTF-8 input, not just ASCII.
  */
object WordPieceKernel {
  import org.apache.spark.unsafe.types.UTF8String

  private val ContMark = UTF8String.fromString("##")

  /** Encode a tokenized document: each non-empty word in `toks` expands
    * to its greedy piece sequence (continuations `##`-marked); empty and
    * null words are skipped. Returns the concatenated piece array. */
  def encode(toks: ArrayData,
             init: java.util.HashSet[UTF8String],
             cont: java.util.HashSet[UTF8String],
             maxInitLen: Int, maxContLen: Int): ArrayData = {
    val out = new java.util.ArrayList[AnyRef]()
    val n = toks.numElements()
    var i = 0
    while (i < n) {
      if (!toks.isNullAt(i)) {
        val w = toks.getUTF8String(i)
        val len = w.numChars()
        var pos = 0
        while (pos < len) {
          val atStart = pos == 0
          val table = if (atStart) init else cont
          val cap = math.min(len - pos, if (atStart) maxInitLen else maxContLen)
          var l = cap
          var hit = -1
          while (l >= 1 && hit < 0) {
            if (table.contains(w.substringSQL(pos + 1, l))) hit = l
            l -= 1
          }
          val take = if (hit > 0) hit else 1 // char fallback: always total
          val piece = w.substringSQL(pos + 1, take)
          out.add(if (atStart) piece else UTF8String.concat(ContMark, piece))
          pos += take
        }
      }
      i += 1
    }
    ArrayData.toArrayData(out.toArray)
  }
}

/** Greedy longest-match WordPiece encode of a tokenized document
  * against a broadcast vocabulary. Input `array<string>` (the
  * whitespace tokens), output `array<string>` (the pieces, in order,
  * continuations `##`-marked). The two vocabulary tables ride the
  * expression as codegen reference objects — no join, no shuffle; the
  * encode is a map-only projection however deep the vocabulary.
  * Derived per-document counts (`size`, `array_join`) stay in the same
  * whole-stage-codegen span. */
case class WordPieceEncode(child: Expression,
                           initPieces: Seq[String], contPieces: Seq[String])
  extends UnaryExpression {
  import org.apache.spark.unsafe.types.UTF8String

  @transient private lazy val initSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](initPieces.length * 2)
    initPieces.foreach(p => s.add(UTF8String.fromString(p)))
    s
  }
  @transient private lazy val contSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String](contPieces.length * 2)
    contPieces.foreach(p => s.add(UTF8String.fromString(p)))
    s
  }
  @transient private lazy val maxInitLen: Int =
    if (initPieces.isEmpty) 1 else initPieces.iterator.map(p => p.codePointCount(0, p.length)).max.max(1)
  @transient private lazy val maxContLen: Int =
    if (contPieces.isEmpty) 1 else contPieces.iterator.map(p => p.codePointCount(0, p.length)).max.max(1)

  override def prettyName: String = "word_piece_encode"
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects array<string>, got ${t.simpleString}")
  }

  override def nullSafeEval(v: Any): Any =
    WordPieceKernel.encode(v.asInstanceOf[ArrayData], initSet, contSet,
      maxInitLen, maxContLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setCls = "java.util.HashSet"
    val iRef = ctx.addReferenceObj("wpInit", initSet, setCls)
    val cRef = ctx.addReferenceObj("wpCont", contSet, setCls)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.WordPieceKernel.encode($v, " +
        s"($setCls) $iRef, ($setCls) $cRef, $maxInitLen, $maxContLen);")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object WordPieceFunctions {
  def word_piece_encode(toks: Column, init: Seq[String], cont: Seq[String]): Column =
    Bridge.column(WordPieceEncode(Bridge.expression(toks), init, cont))
}
