package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom table-valued surface (SURVEY §2.9 "Generator / explode-style"):
  * a native Catalyst `Generator` — the UDTF extension point — emitting
  * one (idx, shingle) row per word n-gram of a token array. The M3
  * tokenizer contract composed as tokens → UDTF, without materializing
  * the shingle array as a column first: rows stream out of `eval`, so a
  * 10k-token document never allocates its 10k-element shingle array the
  * way `explode(transform(sequence(...)))` does.
  *
  * Executes under `GenerateExec` like the built-in explode family
  * (interpreted eval — only the explode builtins get generator codegen;
  * the row stream itself is the win here, not per-call dispatch). */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("idx", IntegerType, nullable = false),
    StructField("shingle", StringType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case _ => TypeCheckResult.TypeCheckFailure(
      s"WordShingles expects array<string> and n >= 1, got ${child.dataType} / n=$n")
  }

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val arr = child.eval(input).asInstanceOf[ArrayData]
    if (arr == null || arr.numElements() < n) Iterator.empty
    else {
      val sep = UTF8String.fromString(" ")
      val toks = Array.tabulate(arr.numElements())(arr.getUTF8String)
      // a window containing a null token emits NO row — concatWs would
      // silently skip the null and mislabel an (n-1)-gram as an n-gram,
      // corrupting every dedup/simjoin built on the shingles (the same
      // poison-don't-truncate contract VectorExpressions documents;
      // null never occurs in split() output, so this is a guard, not a
      // hot path)
      Iterator.tabulate(toks.length - n + 1) { i =>
        if (toks.view.slice(i, i + n).exists(_ == null)) null
        else InternalRow(i, UTF8String.concatWs(sep, toks.slice(i, i + n): _*))
      }.filter(_ != null)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

object Generators {
  /** Column-API wrapper: `select($"doc_id", word_shingles(tokens, 3))`
    * yields columns (idx, shingle) via the analyzer's Generate planting. */
  def wordShingles(tokens: Column, n: Int = 3): Column =
    ColumnBridge.column(WordShingles(ColumnBridge.expr(tokens), n))
}
