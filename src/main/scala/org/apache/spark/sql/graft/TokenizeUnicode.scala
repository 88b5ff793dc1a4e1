package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode-aware tokenizer: NFC-normalize, then emit maximal runs of
  * Unicode LETTERS (general category L*) — the multilingual counterpart
  * of [[TokenizeWords]]'s reference-faithful ASCII `[A-Za-z]` class
  * (worker.rs:23-34), which silently drops every non-Latin script and
  * splits `café` at the accent when the input arrives decomposed. NFC
  * first matters: U+0065 U+0301 (e + combining acute) and U+00E9 (é)
  * are the same text; without normalization they tokenize differently
  * and downstream dedup/counting splits one word across two keys.
  *
  * Case is left untouched (like the reference tokenizer) — and
  * deliberately: Spark 4's ICU `lower()` has a minutes-long static
  * init, and cross-engine case folding of non-ASCII disagrees between
  * engines; callers that need folding apply it to the OUTPUT tokens.
  *
  * No regex: a code-point scan with `Character.isLetter` (the same L*
  * category test RE2's `\p{L}` uses, so DuckDB's
  * `regexp_extract_all(nfc_normalize(text), '\p{L}+')` replays it).
  * Normalizer.normalize is a fast no-op pass for already-NFC (incl.
  * pure-ASCII) input. Codegen-participating like TokenizeWords: one
  * static call per row inside the surrounding WholeStageCodegen span.
  */
case class TokenizeUnicode(child: Expression)
    extends UnaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "tokenize_unicode"

  override def nullSafeEval(input: Any): Any =
    TokenizeUnicode.tokenize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = org.apache.spark.sql.graft.TokenizeUnicode.tokenize($c);")

  override protected def withNewChildInternal(newChild: Expression): TokenizeUnicode =
    copy(child = newChild)
}

object TokenizeUnicode {
  /** The scan — static so generated Java can call it directly. */
  def tokenize(input: UTF8String): ArrayData = {
    val raw = input.toString
    val s =
      if (java.text.Normalizer.isNormalized(raw, java.text.Normalizer.Form.NFC)) raw
      else java.text.Normalizer.normalize(raw, java.text.Normalizer.Form.NFC)
    val out = new java.util.ArrayList[Any]()
    val n = s.length
    var i = 0
    while (i < n) {
      val cp = s.codePointAt(i)
      if (Character.isLetter(cp)) {
        val start = i
        var c = cp
        while (i < n && Character.isLetter(c)) {
          i += Character.charCount(c)
          if (i < n) c = s.codePointAt(i)
        }
        out.add(UTF8String.fromString(s.substring(start, i)))
      } else {
        i += Character.charCount(cp)
      }
    }
    new GenericArrayData(out.toArray)
  }

  def tokenizeUnicode(c: Column): Column =
    ExpressionUtils.column(TokenizeUnicode(ExpressionUtils.expression(c)))
}
