package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The reference tokenizer (worker.rs:23-34: replace every non-[A-Za-z]
  * character with a space, split on whitespace, drop empties) as a single
  * byte-level scan over the UTF8String — no regex, no split array churn,
  * no interpreted lambda filter.
  *
  * Byte-level is exact here because the keep-class is pure ASCII: every
  * byte of a multi-byte UTF-8 character is >= 0x80 and therefore a
  * separator, which collapses with its neighbors exactly as the
  * per-character regex replacement does.
  *
  * Participates in whole-stage codegen: the generated code calls the
  * static scan (one static call per row — the loop itself is already a
  * tight JIT-friendly byte scan), so the surrounding stage keeps its
  * single WholeStageCodegen span instead of a CodegenFallback row
  * materialization per call.
  *
  * Declarative twin (regexp_replace + split + filter) kept as
  * graft.text.Text.tokensHof and equality-tested.
  */
case class TokenizeWords(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_words"

  override def nullSafeEval(input: Any): Any =
    TokenizeWords.tokenizeBytes(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenizeWords.tokenizeBytes($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenizeWords =
    copy(child = newChild)
}

object TokenizeWords {
  @inline private def isLetter(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')

  /** The scan itself — static so generated Java can call it directly. */
  def tokenizeBytes(input: UTF8String): ArrayData = {
    val bytes = input.getBytes
    val out = new java.util.ArrayList[Any]()
    var i = 0
    val n = bytes.length
    while (i < n) {
      if (isLetter(bytes(i))) {
        val start = i
        while (i < n && isLetter(bytes(i))) i += 1
        out.add(UTF8String.fromBytes(bytes, start, i - start))
      } else i += 1
    }
    new GenericArrayData(out.toArray)
  }

  def tokenize(text: Column): Column =
    ExpressionUtils.column(TokenizeWords(ExpressionUtils.expression(text)))
}
