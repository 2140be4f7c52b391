package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, ShortType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Optimizer rule: fold filter predicates over [[DictDecode]] columns back
  * onto the underlying int codes.
  *
  * The flat extraction cache stores its bounded-vocabulary string columns as
  * small ints under a decode VIEW ([[DictDecode]]), so every consumer-side
  * kind/pred filter arrives at the cache as `dict_decode(code) = 'literal'`.
  * That shape defeats the in-memory columnar scan twice: the decode runs
  * per row inside the filter, and — the expensive half — the predicate is
  * opaque to `InMemoryTableScanExec`'s per-batch stat pruning, so EVERY
  * cached batch is scanned for EVERY kind-restricted consumer. Reverse-
  * mapping the literal through the dictionary at plan time turns the
  * predicate into a plain `code = k` integer comparison: codegen-cheap, and
  * batch-stat prunable (the cache is written kind-sorted, so foreign-kind
  * batches are skipped wholesale — see TripleExtractor.extractFlatEnc).
  *
  * Scope and null discipline: only conjuncts at the TOP of a Filter
  * condition are rewritten — there `null` and `false` both drop the row, so
  * `decode(c) = 's'` (null when c = -1) and `c = k` (false at -1) are
  * interchangeable. Negation / null-test forms carry the vocabulary bounds
  * explicitly (`decode(c) != 's'` keeps only decodable rows, hence
  * `c != k AND 0 <= c < |dict|`). Inside NOT/OR trees or non-Filter
  * expressions the decode stays as-is (null semantics differ; those sites
  * are not scan-bound).
  */
object DictDecodeFilterRewrite extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, _) =>
      val rewritten = rewriteConjuncts(cond)
      if (rewritten eq cond) f else f.copy(condition = rewritten)
  }

  private def rewriteConjuncts(e: Expression): Expression = e match {
    case And(l, r) =>
      val l2 = rewriteConjuncts(l); val r2 = rewriteConjuncts(r)
      if ((l2 eq l) && (r2 eq r)) e else And(l2, r2)
    case other => rewriteOne(other)
  }

  private def rewriteOne(e: Expression): Expression = e match {
    // decode(c) = 's'  ⇔  c = code('s')   (both are false/null-drop at -1)
    case EqualTo(d: DictDecode, Literal(s: UTF8String, StringType)) =>
      eqCode(d, s)
    case EqualTo(Literal(s: UTF8String, StringType), d: DictDecode) =>
      eqCode(d, s)
    // decode(c) IN ('a','b',…)  ⇔  c IN (codes present in the dictionary)
    case In(d: DictDecode, vs) if vs.nonEmpty && vs.forall {
          case Literal(_: UTF8String, StringType) => true; case _ => false
        } =>
      val codes = vs.flatMap { case Literal(s: UTF8String, StringType) =>
        lookupCode(d, s).map(codeLit(d, _))
      }
      if (codes.isEmpty) Literal.FalseLiteral else In(d.child, codes)
    // decode(c) != 's'  ⇔  c != code AND c decodable
    case Not(EqualTo(d: DictDecode, Literal(s: UTF8String, StringType))) =>
      neqCode(d, s)
    case Not(EqualTo(Literal(s: UTF8String, StringType), d: DictDecode)) =>
      neqCode(d, s)
    case IsNull(d: DictDecode) =>
      Or(LessThan(d.child, codeLit(d, 0)), boundGE(d))
    case IsNotNull(d: DictDecode) => decodable(d)
    case _ => e
  }

  private def eqCode(d: DictDecode, s: UTF8String): Expression =
    lookupCode(d, s) match {
      case Some(k) => EqualTo(d.child, codeLit(d, k))
      case None => Literal.FalseLiteral // 's' not in vocabulary: never equal
    }

  private def neqCode(d: DictDecode, s: UTF8String): Expression =
    lookupCode(d, s) match {
      case Some(k) => And(Not(EqualTo(d.child, codeLit(d, k))), decodable(d))
      case None => decodable(d) // != an absent string ⇔ decodes at all
    }

  /** 0 <= c < |dict| — the decodable range ([[DictDecode.lookup]]). */
  private def decodable(d: DictDecode): Expression =
    And(GreaterThanOrEqual(d.child, codeLit(d, 0)), Not(boundGE(d)))

  private def boundGE(d: DictDecode): Expression =
    GreaterThanOrEqual(d.child, codeLit(d, d.dict.value.length))

  private def codeLit(d: DictDecode, code: Int): Literal = d.child.dataType match {
    case ByteType => Literal(code.toByte, ByteType)
    case ShortType => Literal(code.toShort, ShortType)
    case _ => Literal(code, IntegerType)
  }

  /** Reverse dictionary lookup, memoized per broadcast: the alias dictionary
    * is gazetteer-sized (millions of entries at 10^12 docs), and the rule
    * runs on every Filter of every plan — a linear probe per predicate
    * would put O(|dict|) on the analysis path of small queries. */
  private val reverseCache =
    new java.util.WeakHashMap[AnyRef, java.util.HashMap[String, Integer]]()

  private def lookupCode(d: DictDecode, s: UTF8String): Option[Int] = {
    val key: AnyRef = d.dict
    val m = reverseCache.synchronized {
      var m = reverseCache.get(key)
      if (m == null) {
        m = new java.util.HashMap[String, Integer](d.dict.value.length * 2)
        val arr = d.dict.value
        var i = 0
        while (i < arr.length) { // first occurrence wins, like decode
          if (arr(i) != null && !m.containsKey(arr(i))) m.put(arr(i), i)
          i += 1
        }
        reverseCache.put(key, m)
      }
      m
    }
    Option(m.get(s.toString)).map(_.intValue())
  }
}

/** Programmatic installer: `spark.sql.extensions` is only honored at session
  * construction, so library entry points (decodeFlat) install the rule into
  * live sessions via `experimental.extraOptimizations` — idempotent. */
object GraftOptimizations {
  def install(spark: SparkSession): Unit = synchronized {
    if (!spark.experimental.extraOptimizations.contains(DictDecodeFilterRewrite))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ DictDecodeFilterRewrite
  }
}
