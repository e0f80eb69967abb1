package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho-Corasick multi-pattern scan (Aho & Corasick, CACM'75) as a native
  * codegen'd Catalyst expression: ONE pass over the text matches every
  * pattern simultaneously — the blocklist/PII-term scan shape at corpus
  * scale, where the naive alternative is |patterns| separate `contains`
  * scans per row. The automaton is built once on the driver and rides to
  * executors as a referenced object (one copy per executor, not per row).
  *
  * Two modes: `distinctMode = false` counts ALL pattern occurrences
  * (overlapping included — each pattern's every end position); `true`
  * counts how many DISTINCT patterns occur at least once (≤ 64 patterns,
  * tracked as a bitmask along the suffix-link chain).
  */
case class MultiPatternCount(child: Expression, ac: AcAutomaton,
                             distinctMode: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"multi_pattern_count needs a string column, got $other")
    }

  override def nullSafeEval(input: Any): Any =
    ac.run(input.asInstanceOf[UTF8String], distinctMode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("acAutomaton", ac,
      classOf[AcAutomaton].getName)
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.run($c, $distinctMode);")
  }

  override protected def withNewChildInternal(newChild: Expression)
      : MultiPatternCount = copy(child = newChild)

  override def prettyName: String =
    if (distinctMode) "multi_pattern_distinct" else "multi_pattern_count"
}

/** The frozen goto/fail/output automaton. `outCount(s)` / `outMask(s)`
  * are PRE-AGGREGATED along the suffix-link chain at build time, so the
  * per-character work at scan time is one map lookup + one add/or —
  * no fail-chain walking in the hot loop. Serializable: it ships to
  * executors inside the expression. */
final class AcAutomaton(
    val trans: Array[Map[Char, Int]],
    val fail: Array[Int],
    val outCount: Array[Long],
    val outMask: Array[Long]) extends Serializable {

  /** Next state for (state, c), following fail links. */
  private def step(state: Int, c: Char): Int = {
    var s = state
    while (!trans(s).contains(c) && s != 0) s = fail(s)
    trans(s).getOrElse(c, 0)
  }

  /** Public because generated code calls it. */
  def run(text: UTF8String, distinct: Boolean): Long = {
    val s = text.toString
    var state = 0
    var total = 0L
    var mask = 0L
    var i = 0
    while (i < s.length) {
      state = step(state, s.charAt(i))
      total += outCount(state)
      mask |= outMask(state)
      i += 1
    }
    if (distinct) java.lang.Long.bitCount(mask).toLong else total
  }
}

object MultiPatternCount {
  import org.apache.spark.sql.graft.bridge
  import scala.collection.mutable

  /** Classic BFS construction with fail links; output counts/masks are
    * folded along the fail chain so scanning never walks it. */
  def build(patterns: Seq[String]): AcAutomaton = {
    require(patterns.nonEmpty && patterns.size <= 64,
      "multi_pattern supports 1..64 non-empty patterns")
    require(patterns.forall(_.nonEmpty), "patterns must be non-empty")
    val trans = mutable.ArrayBuffer(mutable.Map.empty[Char, Int])
    val endCount = mutable.ArrayBuffer(0L)
    val endMask = mutable.ArrayBuffer(0L)
    patterns.zipWithIndex.foreach { case (p, idx) =>
      var s = 0
      p.foreach { c =>
        s = trans(s).getOrElseUpdate(c, {
          trans += mutable.Map.empty[Char, Int]
          endCount += 0L
          endMask += 0L
          trans.size - 1
        })
      }
      endCount(s) += 1L
      endMask(s) |= (1L << idx)
    }
    val n = trans.size
    val fail = new Array[Int](n)
    val outCount = endCount.toArray
    val outMask = endMask.toArray
    val queue = mutable.Queue.empty[Int]
    trans(0).values.foreach { s => fail(s) = 0; queue.enqueue(s) }
    while (queue.nonEmpty) {
      val u = queue.dequeue()
      outCount(u) += outCount(fail(u))
      outMask(u) |= outMask(fail(u))
      trans(u).foreach { case (c, v) =>
        var f = fail(u)
        while (!trans(f).contains(c) && f != 0) f = fail(f)
        fail(v) = if (f == u) 0 else trans(f).getOrElse(c, 0)
        queue.enqueue(v)
      }
    }
    new AcAutomaton(trans.map(_.toMap).toArray, fail, outCount, outMask)
  }

  /** Total occurrences (overlapping included) of any pattern. */
  def totalMatches(text: Column, patterns: Seq[String]): Column = {
    val ac = build(patterns)
    bridge.column(MultiPatternCount(bridge.expression(text), ac,
      distinctMode = false))
  }

  /** Number of distinct patterns that occur at least once. */
  def distinctPatterns(text: Column, patterns: Seq[String]): Column = {
    val ac = build(patterns)
    bridge.column(MultiPatternCount(bridge.expression(text), ac,
      distinctMode = true))
  }
}
