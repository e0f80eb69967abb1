package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, DoubleType, StringType}

import graft.functions.JaccardSim

/** Optimizer rule: rewrite the declarative Jaccard idiom
  *
  *   size(array_intersect(a, b)) / size(array_union(a, b))
  *
  * (both sides cast to double, either argument order in the union) into the
  * compiled single-pass [[graft.functions.JaccardSim]] expression — users
  * write the composable built-in form and still get the fast path. This is
  * the one place the engine drops to a custom `Rule[LogicalPlan]`: the
  * rewrite genuinely can't be expressed by composing operators, and the
  * interpreted two-hash-set form costs ~50x per pair (see JaccardSim docs).
  *
  * Semantics note: the built-in form also deduplicates its inputs; the
  * rewrite therefore only fires when both arguments are themselves
  * duplicate-free producers (array_distinct / the graft n-gram expressions),
  * where the two forms are provably equal (ExpressionsSpec).
  */
object JaccardRewrite extends Rule[LogicalPlan] {

  private def isDistinctProducer(e: Expression): Boolean = e match {
    case _: ArrayDistinct                     => true
    case g: graft.functions.WordNgrams        => g != null
    case c: graft.functions.CharNgrams        => c != null
    case a: Alias                             => isDistinctProducer(a.child)
    case _                                    => false
  }

  /** The Jaccard operands are usually AttributeReferences whose producing
    * expressions live in the child Project (CollapseProject keeps non-cheap
    * exprs used twice in their own Project) — resolve through one level. */
  private def producerMap(plan: LogicalPlan): AttributeMap[Expression] =
    plan match {
      case org.apache.spark.sql.catalyst.plans.logical.Project(list, _) =>
        AttributeMap(list.collect { case a: Alias => a.toAttribute -> a.child })
      case _ => AttributeMap.empty[Expression]
    }

  private def stringArray(e: Expression): Boolean = e.dataType match {
    case ArrayType(StringType, _) => true
    case _                        => false
  }

  private object SizeOf {
    def unapply(e: Expression): Option[Expression] = e match {
      case Cast(Size(child, _), DoubleType, _, _) => Some(child)
      case Size(child, _)                         => Some(child)
      case Cast(inner, DoubleType, _, _)          => unapply(inner)
      case _                                      => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transform {
      case node =>
        val producers = node.children match {
          case Seq(only) => producerMap(only)
          case _         => AttributeMap.empty[Expression]
        }
        def distinctish(e: Expression): Boolean = e match {
          case attr: Attribute => producers.get(attr).exists(isDistinctProducer)
          case other           => isDistinctProducer(other)
        }
        node.transformExpressions {
          case Divide(SizeOf(ArrayIntersect(a1, b1)), SizeOf(ArrayUnion(a2, b2)), _)
              if stringArray(a1) && stringArray(b1) &&
                ((a1.semanticEquals(a2) && b1.semanticEquals(b2)) ||
                 (a1.semanticEquals(b2) && b1.semanticEquals(a2))) &&
                distinctish(a1) && distinctish(b1) =>
            JaccardSim(a1, b1)
        }
    }
}

/** Session-extension entry point:
  * `spark.sql.extensions=graft.plans.GraftExtensions` (or
  * `builder.withExtensions(new GraftExtensions)`). The same rule can be
  * attached to a live session via `spark.experimental.extraOptimizations`
  * — equivalent injection, used by the test suite against the shared
  * session. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => JaccardRewrite)
  }
}
