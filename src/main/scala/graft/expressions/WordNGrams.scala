package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column in ONE imperative pass:
  * whitespace-tokenize the trimmed text, join each n consecutive words
  * with single spaces, keep first-occurrence-distinct.
  *
  * Drop-in equivalent of the composable form
  * `array_distinct(transform(sequence(...), i -> concat_ws(" ",
  * element_at(w,i)...)))` — which evaluates an interpreted expression
  * tree per element (higher-order lambdas don't codegen) at ~1 ms per
  * document. This expression is a single JVM method call per row
  * (CodegenFallback for the call itself; the loop inside is plain Java),
  * ~100× cheaper, which matters when the shingle table feeds O(corpus)
  * dedup hashing.
  *
  * Matches the DuckDB oracle fragment exactly:
  * `list_distinct(list_transform(generate_series(1, len(ws)-2),
  * i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]))` over
  * `string_split_regex(trim(text), '\s+')`, including the empty result
  * for texts shorter than n words.
  */
case class WordNGrams(child: Expression, n: Int,
    distinct: Boolean = true)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    // match Spark's trim()/split() and the oracle exactly: trim strips
    // ASCII SPACES ONLY (Java String.trim would also strip \t/\n and
    // change the token list for control-char-edged text), and split
    // keeps leading/trailing empty tokens like split(..., -1). The
    // split class is the explicit RE2-\s set [ \t\n\f\r] — Java's \s
    // also matches U+000B vertical tab and would diverge from the
    // DuckDB oracle on VT-bearing text (the words() parity rule).
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val trimmed = text.substring(lo, hi)
    val words = trimmed.split("[ \\t\\n\\f\\r]+", -1)
    if (words.length < n || (words.length == 1 && words(0).isEmpty)) {
      new GenericArrayData(Array.empty[Any])
    } else {
      // LinkedHashSet dedups in first-occurrence order; the ALL variant
      // (distinct=false, repetition counting) keeps every occurrence
      val out =
        if (distinct) mutable.LinkedHashSet.empty[String]
        else mutable.ArrayBuffer.empty[String]
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        out += sb.toString
        i += 1
      }
      new GenericArrayData(
        out.iterator.map(s => UTF8String.fromString(s)).toArray[Any])
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordNGrams =
    copy(child = newChild)
}

object WordNGrams {
  def ngrams(text: Column, n: Int): Column =
    Bridge.column(WordNGrams(Bridge.expression(text), n))

  /** Every n-gram occurrence (no dedup) — the repetition-counting form
    * (Gopher top-n-gram mass); oracle fragment drops the
    * `list_distinct`. */
  def ngramsAll(text: Column, n: Int): Column =
    Bridge.column(WordNGrams(Bridge.expression(text), n, distinct = false))
}

/** POSITIONED word n-grams: every n-gram of the text in token order,
  * duplicates kept, so `posexplode` recovers the 0-based anchor
  * position of each gram. The positioned variant of [[WordNGrams]]
  * (same tokenization, same imperative single-pass cost rationale) —
  * what span-level dedup needs, where WHERE a gram sits is the data,
  * not just whether it occurs.
  *
  * Oracle fragment: `array_to_string(ws[pos:pos+n-1], ' ')` over
  * `unnest(generate_series(1, len(ws)-n+1))` — 1-based there, so the
  * Spark consumer adds 1 to the posexplode index. Empty for texts
  * shorter than n words, including the single-empty-token split of a
  * blank text.
  */
case class AllWordNGrams(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  require(n >= 1, s"n must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString
    var lo = 0
    var hi = text.length
    while (lo < hi && text.charAt(lo) == ' ') lo += 1
    while (hi > lo && text.charAt(hi - 1) == ' ') hi -= 1
    val trimmed = text.substring(lo, hi)
    // explicit RE2-\s class, not Java \s (VT parity — see WordNGrams)
    val words = trimmed.split("[ \\t\\n\\f\\r]+", -1)
    if (words.length < n || (words.length == 1 && words(0).isEmpty)) {
      new GenericArrayData(Array.empty[Any])
    } else {
      val out = new Array[Any](words.length - n + 1)
      val sb = new java.lang.StringBuilder(64)
      var i = 0
      while (i <= words.length - n) {
        sb.setLength(0)
        var k = 0
        while (k < n) {
          if (k > 0) sb.append(' ')
          sb.append(words(i + k))
          k += 1
        }
        out(i) = UTF8String.fromString(sb.toString)
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): AllWordNGrams =
    copy(child = newChild)
}

object AllWordNGrams {
  def ngrams(text: Column, n: Int): Column =
    Bridge.column(AllWordNGrams(Bridge.expression(text), n))
}
