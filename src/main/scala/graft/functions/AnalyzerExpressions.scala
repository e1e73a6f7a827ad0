package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftShim.{column, expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Catalyst expressions for the ES-mapping analyzer chains (SURVEY §7.6;
  * reference `conf/mappings/{english,cjk,autocomplete}_mapping.json`).
  * Same design as [[UrlExpressions]]: generated code calls the static
  * [[TextAnalysis]] helpers, so both stay inside whole-stage codegen —
  * the analyzer runs at scan speed over 100 TB with no UDF boxing. */
object AnalyzerExpressions {

  /** `porter_stem(token)` — Snowball English (Porter2) stem; the ES
    * `stemmer: language=english` filter of the english mapping. */
  case class PorterStem(child: Expression) extends UnaryExpression {
    override def dataType: DataType = StringType
    override def nullSafeEval(v: Any): Any =
      UTF8String.fromString(
        TextAnalysis.porterStem(v.asInstanceOf[UTF8String].toString))
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
           |  graft.functions.TextAnalysis.porterStem($c.toString()));""".stripMargin)
    override protected def withNewChildInternal(c: Expression): PorterStem = copy(c)
  }

  /** `cjk_analyze(text)` — the cjk analyzer's tokenizer+width+bigram core
    * (cjk_width fold → lowercase → CJK bigrams / word tokens); the stop
    * filter composes on top as a plain column op. Returns array<string>. */
  case class CjkAnalyze(child: Expression) extends UnaryExpression {
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def nullSafeEval(v: Any): Any = {
      val toks = TextAnalysis.cjkAnalyze(v.asInstanceOf[UTF8String].toString)
      new GenericArrayData(toks.map(UTF8String.fromString(_)).asInstanceOf[Array[Any]])
    }
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => {
        val toks = ctx.freshName("toks")
        val arr = ctx.freshName("arr")
        s"""
           |String[] $toks = graft.functions.TextAnalysis.cjkAnalyze($c.toString());
           |Object[] $arr = new Object[$toks.length];
           |for (int _i = 0; _i < $toks.length; _i++) {
           |  $arr[_i] = org.apache.spark.unsafe.types.UTF8String.fromString($toks[_i]);
           |}
           |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
         """.stripMargin
      })
    override protected def withNewChildInternal(c: Expression): CjkAnalyze = copy(c)
  }

  def porter_stem(c: Column): Column = column(PorterStem(expression(c)))
  def cjk_analyze(c: Column): Column = column(CjkAnalyze(expression(c)))

  /** Register SQL-callable names on a session. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("porter_stem", es => PorterStem(es.head), "built-in")
    reg.createOrReplaceTempFunction("cjk_analyze", es => CjkAnalyze(es.head), "built-in")
  }
}
