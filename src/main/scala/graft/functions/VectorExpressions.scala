package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType, LongType}

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

  /** One fused loop; all locals come from ctx.freshName — fixed names would
    * collide when two vec_* expressions share a codegen scope (Janino
    * 'redefinition of local variable' → silent interpreted fallback). */
  private def loopDot(ctx: CodegenContext, a: String, b: String,
                      v: VecNames, wantNorms: Boolean): String = {
    val extra = if (wantNorms) s"${v.na} += xa * xa; ${v.nb} += xb * xb;" else ""
    s"""
       |int ${v.n} = java.lang.Math.min($a.numElements(), $b.numElements());
       |double ${v.s} = 0.0; double ${v.na} = 0.0; double ${v.nb} = 0.0;
       |for (int ${v.i} = 0; ${v.i} < ${v.n}; ${v.i}++) {
       |  if ($a.isNullAt(${v.i}) || $b.isNullAt(${v.i})) continue;
       |  double xa = (double) $a.getFloat(${v.i});
       |  double xb = (double) $b.getFloat(${v.i});
       |  ${v.s} += xa * xb; $extra
       |}
       |""".stripMargin
  }

  private case class VecNames(n: String, s: String, na: String, nb: String, i: String)
  private def freshNames(ctx: CodegenContext): VecNames =
    VecNames(ctx.freshName("vn"), ctx.freshName("vs"), ctx.freshName("vna"),
      ctx.freshName("vnb"), ctx.freshName("vi"))

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
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val v = freshNames(ctx)
        loopDot(ctx, a, b, v, wantNorms = false) + s"${ev.value} = ${v.s};"
      })

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
      nullSafeCodeGen(ctx, ev, a => {
        val v = freshNames(ctx)
        s"""
           |double ${v.s} = 0.0;
           |for (int ${v.i} = 0; ${v.i} < $a.numElements(); ${v.i}++) {
           |  if ($a.isNullAt(${v.i})) continue;
           |  double xv = (double) $a.getFloat(${v.i});
           |  ${v.s} += xv * xv;
           |}
           |${ev.value} = java.lang.Math.sqrt(${v.s});
           |""".stripMargin
      })

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
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val v = freshNames(ctx)
        loopDot(ctx, a, b, v, wantNorms = true) +
          s"${ev.value} = (${v.na} == 0.0 || ${v.nb} == 0.0) ? 0.0 : " +
          s"${v.s} / java.lang.Math.sqrt(${v.na} * ${v.nb});"
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecCosine =
      copy(left = newLeft, right = newRight)
  }

  /** agree(a, b) over two long arrays → count of positions (below the
    * shorter length) where both are non-null and equal. The MinHash
    * signature-agreement kernel: the HOF equivalent
    * (`size(filter(zip_with(a,b,_===_), v=>v))`) interprets two lambdas and
    * allocates two intermediate arrays per pair — per-pair cost that the
    * near-dup verify streams (d3/d4-adjacent, d19's ingest gate) pay
    * N·cap times. */
  case class VecAgree(left: Expression, right: Expression)
      extends BinaryExpression {
    override def checkInputDataTypes(): TypeCheckResult =
      if (children.forall(_.dataType match {
        case ArrayType(LongType, _) => true
        case _ => false
      })) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"expected array<bigint> inputs, got ${children.map(_.dataType.simpleString).mkString(", ")}")
    override def dataType: DataType = IntegerType
    override def prettyName: String = "vec_agree"

    override protected def nullSafeEval(a: Any, b: Any): Any = {
      val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
      val n = math.min(x.numElements(), y.numElements())
      var c = 0; var i = 0
      while (i < n) {
        if (!x.isNullAt(i) && !y.isNullAt(i) && x.getLong(i) == y.getLong(i)) c += 1
        i += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val v = freshNames(ctx)
        s"""
           |int ${v.n} = java.lang.Math.min($a.numElements(), $b.numElements());
           |int ${v.s} = 0;
           |for (int ${v.i} = 0; ${v.i} < ${v.n}; ${v.i}++) {
           |  if ($a.isNullAt(${v.i}) || $b.isNullAt(${v.i})) continue;
           |  if ($a.getLong(${v.i}) == $b.getLong(${v.i})) ${v.s}++;
           |}
           |${ev.value} = ${v.s};
           |""".stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): VecAgree =
      copy(left = newLeft, right = newRight)
  }

  // ------------- Column facade -------------

  def vec_dot(a: Column, b: Column): Column =
    Bridge.column(VecDot(asFloats(a), asFloats(b)))

  def vec_norm(a: Column): Column =
    Bridge.column(VecNorm(asFloats(a)))

  def vec_cosine(a: Column, b: Column): Column =
    Bridge.column(VecCosine(asFloats(a), asFloats(b)))

  def vec_agree(a: Column, b: Column): Column =
    Bridge.column(VecAgree(Bridge.expression(a), Bridge.expression(b)))

  /** Register `vec_dot` / `vec_norm` / `vec_cosine` for SQL use
    * (`SELECT vec_cosine(a.embedding, b.embedding) ...`). */
  private[functions] def arity(name: String, n: Int, es: Seq[Expression]): Unit =
    if (es.length != n) throw new org.apache.spark.sql.AnalysisException(
      errorClass = "WRONG_NUM_ARGS.WITHOUT_SUGGESTION",
      messageParameters = Map("functionName" -> name, "expectedNum" -> n.toString,
        "actualNum" -> es.length.toString, "docroot" -> ""))

  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("vec_dot",
      es => { arity("vec_dot", 2, es); VecDot(es(0), es(1)) }, "built-in")
    reg.createOrReplaceTempFunction("vec_norm",
      es => { arity("vec_norm", 1, es); VecNorm(es.head) }, "built-in")
    reg.createOrReplaceTempFunction("vec_cosine",
      es => { arity("vec_cosine", 2, es); VecCosine(es(0), es(1)) }, "built-in")
    reg.createOrReplaceTempFunction("vec_agree",
      es => { arity("vec_agree", 2, es); VecAgree(es(0), es(1)) }, "built-in")
  }
}
