package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native Catalyst expressions for the embedding-similarity hot path.
  *
  * The composable alternative (`aggregate(zip_with(a, b, _*_), 0.0, _+_)`)
  * is a higher-order function: Catalyst interprets the lambda per element
  * and allocates an intermediate array per row — it also breaks the
  * surrounding WholeStageCodegen span. These expressions generate a single
  * fused Java loop over the two `ArrayData` values (no allocation, stays
  * inside codegen), with an interpreted `nullSafeEval` fallback.
  *
  * Reference precedent: SURVEY.md §4 names the only custom-expression
  * candidates as profiled hot loops (the NH-kernel hash); the ANN dot
  * product is exactly that class of operator.
  */
object VectorExpressions {

  private def checkFloatArrays(es: Seq[Expression]): TypeCheckResult =
    if (es.forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"expected array<float> inputs, got ${es.map(_.dataType.simpleString).mkString(", ")}")

  /** Accept array<float>/array<double>/array<int> columns — normalize to
    * array<float> (no-op cast when already float). */
  private def asFloats(c: Column): Expression =
    Bridge.expression(c.cast("array<float>"))

  private def loopDot(a: String, b: String, wantNorms: Boolean): String = {
    val extra = if (wantNorms) "na += xa * xa; nb += xb * xb;" else ""
    s"""
       |int n = java.lang.Math.min($a.numElements(), $b.numElements());
       |double s = 0.0; double na = 0.0; double nb = 0.0;
       |for (int i = 0; i < n; i++) {
       |  if ($a.isNullAt(i) || $b.isNullAt(i)) continue;
       |  double xa = (double) $a.getFloat(i);
       |  double xb = (double) $b.getFloat(i);
       |  s += xa * xb; $extra
       |}
       |""".stripMargin
  }

  /** dot(a, b) over two float arrays → double. Null elements are skipped. */
  case class VecDot(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays(children)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_dot"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i))
          s += x.getFloat(i).toDouble * y.getFloat(i).toDouble
        i += 1
      }
      s
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => loopDot(a, b, wantNorms = false) +
        s"${ev.value} = s;")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecDot =
      copy(left = newLeft, right = newRight)
  }

  /** L2 norm of a float array → double. */
  case class VecNorm(child: Expression)
      extends UnaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays(Seq(child))
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_norm"

    override protected def nullSafeEval(a: Any): Any = {
      val x = a.asInstanceOf[ArrayData]
      var s = 0.0; var i = 0; val n = x.numElements()
      while (i < n) {
        if (!x.isNullAt(i)) { val v = x.getFloat(i).toDouble; s += v * v }
        i += 1
      }
      math.sqrt(s)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, a =>
        s"""
           |double s = 0.0;
           |for (int i = 0; i < $a.numElements(); i++) {
           |  if ($a.isNullAt(i)) continue;
           |  double v = (double) $a.getFloat(i);
           |  s += v * v;
           |}
           |${ev.value} = java.lang.Math.sqrt(s);
           |""".stripMargin)

    override protected def withNewChildInternal(newChild: Expression): VecNorm =
      copy(child = newChild)
  }

  /** cosine(a, b) in ONE traversal (dot + both norms fused); 0.0 when either
    * vector has zero norm. */
  case class VecCosine(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult = checkFloatArrays(children)
    override def dataType: DataType = DoubleType
    override def prettyName: String = "vec_cosine"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var s = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i)) {
          val xa = x.getFloat(i).toDouble; val xb = y.getFloat(i).toDouble
          s += xa * xb; na += xa * xa; nb += xb * xb
        }
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else s / math.sqrt(na * nb)
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => loopDot(a, b, wantNorms = true) +
        s"${ev.value} = (na == 0.0 || nb == 0.0) ? 0.0 : s / java.lang.Math.sqrt(na * nb);")

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecCosine =
      copy(left = newLeft, right = newRight)
  }

  // ------------- Column facade -------------

  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(asFloats(a), asFloats(b)))

  def vec_norm(a: Column): Column =
    Bridge.column(VecNorm(asFloats(a)))

  def vec_cosine(a: Column, b: Column): Column =
    Bridge.column(VecCosine(asFloats(a), asFloats(b)))

  /** Register `vec_dot` / `vec_norm` / `vec_cosine` for SQL use
    * (`SELECT vec_cosine(a.embedding, b.embedding) ...`). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot", es => VecDot(es(0), es(1)), "built-in")
    reg.createOrReplaceTempFunction("vec_norm", es => VecNorm(es.head), "built-in")
    reg.createOrReplaceTempFunction("vec_cosine", es => VecCosine(es(0), es(1)), "built-in")
  }
}
