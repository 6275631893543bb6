package graft.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Static MD5 helpers callable from whole-stage-codegen'd Java. A
  * thread-local digest instance avoids per-row getInstance() and keeps
  * the expressions thread-safe across codegen'd tasks. */
object Md5Util {
  private val tl = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def digest(bytes: Array[Byte]): Array[Byte] = {
    val d = tl.get(); d.reset(); d.digest(bytes)
  }

  def digestWithPrefix(prefix: Array[Byte], bytes: Array[Byte]): Array[Byte] = {
    val d = tl.get(); d.reset(); d.update(prefix); d.digest(bytes)
  }

  /** Big-endian 56-bit value of digest bytes [off, off+7) — identical to
    * parsing hex chars [2*off+1 .. 2*off+14] base-16, i.e. the value of
    * `conv(substring(md5(x), 2*off+1, 14), 16, 10)`. */
  def be56(d: Array[Byte], off: Int): Long = {
    var v = 0L
    var i = off
    while (i < off + 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v
  }

  /** 60-bit value of the first 15 hex chars: bytes 0..6 plus the high
    * nibble of byte 7 — `conv(substring(md5(x), 1, 15), 16, 10)`. */
  def first60(d: Array[Byte]): Long =
    (be56(d, 0) << 4) | ((d(7) >> 4) & 0xfL)
}

/** Two independent 56-bit hashes from ONE MD5 evaluation, as a
  * struct<h1,h2> — the fused form of
  * `(conv(substring(md5(x),1,14),16,10), conv(substring(md5(x),15,14),16,10))`.
  * The builtin chain materializes a 32-char hex string and re-parses two
  * substrings per row; this goes digest-bytes → longs with zero
  * intermediate strings, inside whole-stage codegen. Bit-identical to
  * the DuckDB oracle's `('0x' || substr(md5(u), 1, 14))::BIGINT` pair
  * (Md5Spec asserts equality against the builtin formulation). */
case class Md5Hash56Pair(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StructType(Seq(
    StructField("h1", LongType, nullable = false),
    StructField("h2", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash56_pair needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any = {
    val d = Md5Util.digest(input.asInstanceOf[UTF8String].getBytes)
    new GenericInternalRow(Array[Any](Md5Util.be56(d, 0), Md5Util.be56(d, 7)))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val d = ctx.freshName("d")
      s"""
         |byte[] $d = graft.expressions.Md5Util.digest($c.getBytes());
         |${ev.value} = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |  new Object[]{ graft.expressions.Md5Util.be56($d, 0),
         |                graft.expressions.Md5Util.be56($d, 7) });
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Md5Hash56Pair =
    copy(child = newChild)
}

/** Seeded 60-bit MD5 hash: the value of
  * `conv(substring(md5(concat(seed, ':', x)), 1, 15), 16, 10)`, fused
  * to one digest over precomputed prefix bytes + input bytes. Also the
  * fast path inside higher-order lambdas (transform), where the builtin
  * chain would evaluate interpreted per element. */
case class Md5Hash60(child: Expression, seed: Int) extends UnaryExpression {

  private lazy val prefix: Array[Byte] =
    (seed.toString + ":").getBytes("UTF-8")

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"md5_hash60 needs a string child, got ${child.dataType}")

  override def nullSafeEval(input: Any): Any =
    Md5Util.first60(
      Md5Util.digestWithPrefix(prefix, input.asInstanceOf[UTF8String].getBytes))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val prefixRef = ctx.addReferenceObj("md5prefix", prefix, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.Md5Util.first60(
         |  graft.expressions.Md5Util.digestWithPrefix($prefixRef, $c.getBytes()));
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Md5Hash60 =
    copy(child = newChild)
}

object Md5Hashes {
  /** (h1, h2) columns off one fused digest; projected as two fields of
    * the same struct expression so subexpression elimination evaluates
    * the digest once per row. */
  def hash56Pair(c: Column): (Column, Column) = {
    val pair = Bridge.column(Md5Hash56Pair(Bridge.expression(c)))
    (pair.getField("h1"), pair.getField("h2"))
  }

  def hash60(c: Column, seed: Int): Column =
    Bridge.column(Md5Hash60(Bridge.expression(c), seed))
}
