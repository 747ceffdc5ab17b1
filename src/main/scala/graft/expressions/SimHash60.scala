package graft.expressions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** Native Catalyst expression for the 60-bit token SimHash
  * ([[graft.dedup.Dedup.simhash60]] documents the md5-nibble vote
  * semantics; reference NewsDeduplication.scala:23-47 is the simhash
  * it re-expresses).
  *
  * Why an Expression over the UDF form: the UDF pays an
  * UnsafeArrayData → Seq[String] materialization per row — one java
  * String allocation + utf-8 decode per token — only to re-encode
  * each token back to utf-8 bytes for hashing. Here the kernel reads
  * token bytes straight out of the unsafe array (`getUTF8String`
  * views, no copies) and stays inside whole-stage codegen. One
  * thread-local MessageDigest replaces a fresh instance per row.
  *
  * Null semantics match the UDF exactly: null array → 0L (the UDF's
  * guard), null token elements are skipped.
  */
case class SimHash60(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType

  override def nullable: Boolean = false

  override def prettyName: String = "graft_simhash60"

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) 0L
    else SimHash60.hash(v.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val c = child.genCode(ctx)
    val kernel = "graft.expressions.SimHash60$.MODULE$"
    ev.copy(
      code = code"""
        |${c.code}
        |long ${ev.value} = ${c.isNull} ? 0L : $kernel.hash(${c.value});
        """.stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SimHash60 {

  private val localDigest = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest =
      MessageDigest.getInstance("MD5")
  }

  /** One md5 per token, ±1 vote per bit, bit i of a token = bit
    * (i%4) of hex nibble (i/4) — identical arithmetic to the UDF
    * kernel (DedupSpec asserts equality).
    */
  def hash(arr: ArrayData): Long = {
    val votes = new Array[Int](60)
    val digest = localDigest.get()
    val n = arr.numElements()
    var t = 0
    while (t < n) {
      val s = arr.getUTF8String(t)
      if (s != null) {
        digest.reset()
        val d = digest.digest(s.getBytes)
        var i = 0
        while (i < 60) {
          val p = i / 4
          val nib =
            if ((p & 1) == 0) (d(p >> 1) >> 4) & 0xF else d(p >> 1) & 0xF
          votes(i) += (if (((nib >> (i % 4)) & 1) == 1) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 60) {
      if (votes(i) > 0) out |= 1L << i
      i += 1
    }
    out
  }
}
