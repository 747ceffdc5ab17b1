package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator` producing per-document term
  * frequencies: one (term, tf) output row per distinct token of the
  * input array, terms in lexicographic order (SURVEY §2.10's
  * "UDTF-shaped: doc→(doc,word,tf) triples" — reference
  * PrepData.scala:149 computes the same triples with
  * explode + groupBy).
  *
  * Why a Generator instead of explode+groupBy: the aggregation is
  * per-row by definition (tf is within one document), so running it
  * inside the generator keeps it map-side — the token-level explode
  * never hits an exchange, and the shuffle that remains downstream
  * (vocabulary join, global sort) carries one row per distinct term
  * per doc instead of one per token occurrence. At 100 TB that is
  * the difference between shuffling the corpus and shuffling its
  * per-doc vocabulary.
  *
  * Null array → no rows (explode semantics); null tokens are
  * skipped.
  */
case class TermCounts(child: Expression) extends UnaryExpression
  with Generator with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }

  override def elementSchema: StructType = StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", IntegerType, nullable = false)))

  override def prettyName: String = "graft_term_counts"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val v = child.eval(input)
    if (v == null) Nil
    else {
      val arr = v.asInstanceOf[ArrayData]
      val counts = mutable.HashMap.empty[UTF8String, Int]
      var i = 0
      val n = arr.numElements()
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) counts.update(s, counts.getOrElse(s, 0) + 1)
        i += 1
      }
      counts.toSeq.sortWith((a, b) => a._1.compareTo(b._1) < 0)
        .map { case (term, tf) => InternalRow(term, tf) }
    }
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
