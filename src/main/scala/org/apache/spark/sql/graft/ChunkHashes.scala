package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, LongType, StringType}

/** Non-overlapping chunk hashes in one pass: token array → array of
  * ⌈n/c⌉ chunk keys, chunk i covering tokens [i·c, min((i+1)·c, n)),
  * each key the portable polynomial hash of the SPACE-JOINED chunk
  * string — fold of `h*31 + codePoint mod 1e9+7` over the chunk's
  * Unicode CODE POINTS, decoded from the UTF-8 bytes in place, so it
  * is identical to `PortableHash.asciiPolyHash(concat_ws(" ", slice))`
  * (whose per-character `ascii()` yields code points) for ANY string
  * input — ASCII from the `[A-Za-z]` tokenizer and the full-Unicode
  * output of `Text.unicodeTokens` alike (the round-9 ADVICE finding:
  * a raw byte fold agreed with the HOF spelling only on ASCII).
  *
  * Semantically identical to the HOF chain
  * `transform(sequence(0, nch-1), i -> asciiPolyHash(concat_ws(" ",
  * slice(toks, i*c+1, c))))`, but a single byte loop instead of a
  * per-chunk string materialization plus a per-character split/fold —
  * the [[WindowHashes]] lesson applied to the boilerplate operator's
  * hot path (the HOF spelling was q173's dominant cost at 8×).
  */
case class ChunkHashes(child: Expression, c: Int)
    extends UnaryExpression with ExpectsInputTypes {
  require(c >= 1, s"chunk size must be >= 1, got $c")

  override def inputTypes: Seq[AbstractDataType] = Seq(ArrayType(StringType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "chunk_hashes"

  override def nullSafeEval(input: Any): Any =
    ChunkHashes.chunkHashes(input.asInstanceOf[ArrayData], c)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, in =>
      s"${ev.value} = org.apache.spark.sql.graft.ChunkHashes.chunkHashes($in, $c);")

  override protected def withNewChildInternal(newChild: Expression): ChunkHashes =
    copy(child = newChild)
}

object ChunkHashes {
  private val Mod = 1000000007L

  /** One pass per chunk: fold the chunk's token CODE POINTS (decoded
    * from the UTF-8 bytes without materializing a String) with a single
    * 0x20 folded between tokens — exactly what hashing the concat_ws
    * string char-by-char yields. Static so generated Java calls it
    * directly.
    */
  def chunkHashes(toks: ArrayData, c: Int): ArrayData = {
    val n = toks.numElements()
    if (n == 0) return new GenericArrayData(Array.empty[Long])
    val nch = (n + c - 1) / c
    val out = new Array[Long](nch)
    var ci = 0
    while (ci < nch) {
      val end = math.min((ci + 1) * c, n)
      var h = 0L
      var i = ci * c
      while (i < end) {
        if (i > ci * c) h = (h * 31 + 0x20) % Mod // the joining space
        val bytes = toks.getUTF8String(i).getBytes
        var j = 0
        while (j < bytes.length) {
          // inline UTF-8 decode (parquet guarantees valid UTF-8): the
          // byte count is determined by the lead byte, the code point
          // assembled from the continuation payloads
          val b0 = bytes(j) & 0xff
          var cp = 0
          if (b0 < 0x80) { cp = b0; j += 1 }
          else if (b0 < 0xe0) {
            cp = ((b0 & 0x1f) << 6) | (bytes(j + 1) & 0x3f); j += 2
          } else if (b0 < 0xf0) {
            cp = ((b0 & 0x0f) << 12) | ((bytes(j + 1) & 0x3f) << 6) |
              (bytes(j + 2) & 0x3f); j += 3
          } else {
            cp = ((b0 & 0x07) << 18) | ((bytes(j + 1) & 0x3f) << 12) |
              ((bytes(j + 2) & 0x3f) << 6) | (bytes(j + 3) & 0x3f); j += 4
          }
          h = (h * 31 + cp) % Mod
        }
        i += 1
      }
      out(ci) = h
      ci += 1
    }
    new GenericArrayData(out)
  }

  def chunkHashes(toks: Column, c: Int): Column =
    ExpressionUtils.column(ChunkHashes(ExpressionUtils.expression(toks), c))
}
