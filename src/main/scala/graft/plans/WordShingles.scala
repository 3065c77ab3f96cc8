package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Conversion helper shared by interpreted and codegen paths: distinct word
  * n-gram shingles as Catalyst ArrayData, delegating the semantics to
  * [[graft.functions.Text.shingles]] (the same function the specs pin). */
object WordShinglesKernel {
  def eval(s: UTF8String, n: Int): ArrayData =
    toArrayData(graft.functions.Text.shingles(s.toString, n))

  /** Multiplicity-keeping variant: [[graft.functions.Text.ngrams]]. */
  def evalNgrams(s: UTF8String, n: Int): ArrayData =
    toArrayData(graft.functions.Text.ngrams(s.toString, n))

  private def toArrayData(sh: Array[String]): ArrayData = {
    val out = new Array[Any](sh.length)
    var i = 0
    while (i < sh.length) { out(i) = UTF8String.fromString(sh(i)); i += 1 }
    new GenericArrayData(out)
  }
}

/** Native Catalyst expression: distinct word n-gram shingles of a string as
  * array&lt;string&gt; — the first stage of every shingle-keyed dedup path
  * (n-gram Jaccard q26, MinHash q27, incremental ingest q134).
  *
  * Replaces a five-deep higher-order-function chain
  * (`array_distinct(transform(sequence(...), i => array_join(slice(
  * filter(split(text)) ...))))`): HOFs evaluate their lambda through the
  * interpreted expression machinery per element — per shingle, a slice
  * allocation, a join, and a growing distinct scan — and the chain is what
  * every shingle row of a 100 TB corpus pays before the first shuffle. The
  * expression makes one static call inside whole-stage codegen; the kernel
  * is a single pass over the token array.
  */
case class WordShingles(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType | NullType => TypeCheckResult.TypeCheckFailure(
      s"word_shingles n must be >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_shingles requires string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(v: Any): Any =
    WordShinglesKernel.eval(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShinglesKernel.eval($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Multiplicity-keeping sibling of [[WordShingles]] (`word_ngrams`): same
  * tokenization and single-pass kernel, NO distinct — count-based overlap
  * metrics (ROUGE-N clipped counts, q394) need each gram's term frequency,
  * which the dedup-oriented distinct shingle array deliberately drops. */
case class WordNgrams(child: Expression, n: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case StringType | NullType => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams n must be >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"word_ngrams requires string, got $t")
  }

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override protected def nullSafeEval(v: Any): Any =
    WordShinglesKernel.evalNgrams(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.plans.WordShinglesKernel.evalNgrams($c, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
