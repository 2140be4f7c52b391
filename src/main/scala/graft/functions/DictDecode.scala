package graft.functions

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ByteType, DataType, IntegerType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Dictionary decode: small-int code → string via a BROADCAST dictionary.
  *
  * The flat extraction cache stores its bounded-vocabulary string columns
  * (rowKind / pred / norm / label) as small ints — the cache is the
  * pipeline's one big DRAM-resident frame and every downstream stage
  * re-scans it, so string bytes there are pure memory-bandwidth tax (the
  * de-confounded 2→8 scaling probe pinned the pipeline's plateau on DRAM
  * traffic, BASELINE.md). This expression decodes at the consumption site:
  * a codegen'd O(1) array lookup whose dictionary ships as a broadcast —
  * per-executor once, NOT serialized into every task closure, so the alias
  * dictionary (gazetteer-sized; millions of entries at 10^12-doc scale)
  * stays a torrent broadcast exactly like the extraction-side gazetteer.
  *
  * Codes < 0 or ≥ |dict| decode to NULL (-1 is the encoder's null).
  */
case class DictDecode(child: Expression, dict: Broadcast[Array[String]])
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ByteType | ShortType | IntegerType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"dict_decode expects a byte/short/int code column, got ${t.simpleString}")
  }

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "dict_decode"

  @transient private lazy val arr: Array[UTF8String] =
    dict.value.map(UTF8String.fromString)

  /** Shared by eval and the generated code (referenced via addReferenceObj). */
  def lookup(code: Int): UTF8String = {
    val a = arr
    if (code < 0 || code >= a.length) null else a(code)
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else lookup(v.asInstanceOf[Number].intValue())
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val childGen = child.genCode(ctx)
    val ref = ctx.addReferenceObj("dictDecode", this, classOf[DictDecode].getName)
    ev.copy(code =
      code"""
         |${childGen.code}
         |boolean ${ev.isNull} = true;
         |org.apache.spark.unsafe.types.UTF8String ${ev.value} = null;
         |if (!${childGen.isNull}) {
         |  ${ev.value} = $ref.lookup((int) ${childGen.value});
         |  ${ev.isNull} = (${ev.value} == null);
         |}
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): DictDecode =
    copy(child = newChild)
}

object DictDecode {
  def decode(c: Column, dict: Broadcast[Array[String]]): Column =
    Bridge.column(DictDecode(Bridge.expression(c), dict))
}
