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
  * `builder.withExtensions(new GraftExtensions)`; GraftSession applies it
  * by default). Injects the optimizer rule above plus SQL registrations of
  * the graft expressions, so `spark.sql("SELECT jaccard_sim(a, b) ...")`
  * works anywhere the extension is installed. The same rule can also be
  * attached to a live session via `spark.experimental.extraOptimizations`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.analysis.FunctionRegistry.FunctionBuilder
  import org.apache.spark.sql.catalyst.expressions.ExpressionInfo

  private def intLit(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  private def fn(name: String, usage: String)(builder: FunctionBuilder)
      : (FunctionIdentifier, ExpressionInfo, FunctionBuilder) =
    (new FunctionIdentifier(name),
      new ExpressionInfo("graft", null, name, usage, ""), builder)

  private def stringArrayLit(e: Expression, what: String): Seq[String] =
    e match {
      case a if a.foldable && a.dataType.isInstanceOf[ArrayType] &&
          a.dataType.asInstanceOf[ArrayType].elementType == StringType =>
        val arr = a.eval()
          .asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
        Seq.tabulate(arr.numElements()) { i =>
          if (arr.isNullAt(i)) throw new IllegalArgumentException(
            s"$what must not contain NULL")
          arr.getUTF8String(i).toString
        }
      case other => throw new IllegalArgumentException(
        s"$what must be a foldable array<string> literal, got $other")
    }

  private val functions = Seq(
    fn("jaccard_sim", "jaccard_sim(a, b) - Jaccard similarity of distinct string arrays") {
      args => JaccardSim(args(0), args(1))
    },
    fn("dot_product", "dot_product(a, b) - strict float64 dot product") {
      args => graft.functions.DotProduct(args(0), args(1))
    },
    fn("simhash64", "simhash64(tokens) - 64-bit SimHash fingerprint") {
      args => graft.functions.SimHash64(args(0))
    },
    fn("rolling_hash", "rolling_hash(s) - Karp-Rabin fingerprint mod 2^31-1") {
      args => graft.functions.RollingHash(args(0))
    },
    fn("rolling_hash_grams", "rolling_hash_grams(s, k) - windowed k-gram rolling hashes") {
      args => graft.functions.RollingHashGrams(args(0), intLit(args(1), "k"))
    },
    fn("word_ngrams", "word_ngrams(tokens, n) - distinct word n-gram shingles") {
      args => graft.functions.WordNgrams(args(0), intLit(args(1), "n"))
    },
    fn("char_ngrams", "char_ngrams(s, n) - distinct character n-grams") {
      args => graft.functions.CharNgrams(args(0), intLit(args(1), "n"))
    },
    fn("minhash_sig", "minhash_sig(shingles, k) - k md5-derived minhash slots (Kirsch-Mitzenmacher)") {
      args => graft.functions.MinHashSig(args(0), intLit(args(1), "k"))
    },
    fn("minhash_bands", "minhash_bands(shingles, b, r) - LSH band keys over a b x r minhash signature") {
      args => graft.functions.MinHashBands(args(0), intLit(args(1), "b"), intLit(args(2), "r"))
    },
    fn("winnow", "winnow(gram_hashes, w) - distinct sliding-window minima (MOSS fingerprints)") {
      args => graft.functions.Winnow(args(0), intLit(args(1), "w"))
    },
    fn("decodable_media", "decodable_media(payload, media_type) - does the binary payload parse as its declared container (real JDK codec probe)") {
      args => graft.functions.DecodableMedia(args(0), args(1))
    },
    fn("search_sorted", "search_sorted(v, array(...)) - upper-bound index into sorted literal boundaries") {
      args =>
        val bounds = args(1) match {
          case e if e.foldable && e.dataType.isInstanceOf[ArrayType] =>
            val et = e.dataType.asInstanceOf[ArrayType].elementType
            val a = e.eval().asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
            et match {
              case _: org.apache.spark.sql.types.NumericType =>
                // One conversion path for every numeric element type: plain
                // SQL decimal literals (array(0.25, 0.5)) arrive as
                // ArrayType(DecimalType) whose elements are Spark Decimal —
                // NOT a java.lang.Number — and nulls would otherwise NPE.
                Array.tabulate(a.numElements()) { i =>
                  if (a.isNullAt(i)) throw new IllegalArgumentException(
                    "search_sorted boundaries must not contain NULL")
                  a.get(i, et) match {
                    case d: org.apache.spark.sql.types.Decimal => d.toDouble
                    case n: Number                             => n.doubleValue()
                    case other => throw new IllegalArgumentException(
                      s"search_sorted boundary element $other is not numeric")
                  }
                }
              case other => throw new IllegalArgumentException(
                s"search_sorted boundaries must be numeric, got $other")
            }
          case other => throw new IllegalArgumentException(
            s"search_sorted boundaries must be a foldable array literal, got $other")
        }
        graft.functions.SearchSortedDouble(args(0), bounds)
    },
    fn("stable_bucket", "stable_bucket(key, n) - deterministic engine-portable bucket in [0, n)") {
      args =>
        Pmod(ElementAt(
            graft.functions.MinHashSig(
              CreateArray(Seq(Cast(args(0), StringType))), 1),
            Literal(1)),
          Cast(args(1), org.apache.spark.sql.types.LongType))
    },
    fn("jaro_sim", "jaro_sim(a, b) - Jaro string similarity in [0, 1]") {
      args => graft.functions.JaroWinkler(args(0), args(1), winkler = false)
    },
    fn("jaro_winkler_sim", "jaro_winkler_sim(a, b) - prefix-boosted Jaro-Winkler similarity") {
      args => graft.functions.JaroWinkler(args(0), args(1), winkler = true)
    },
    fn("damerau_levenshtein", "damerau_levenshtein(a, b) - true (unrestricted) Damerau-Levenshtein edit distance") {
      args => graft.functions.DamerauLevenshtein(args(0), args(1))
    },
    fn("multi_pattern_count", "multi_pattern_count(s, array('p1', ...)) - one-pass Aho-Corasick total occurrence count") {
      args => graft.functions.MultiPatternCount(args(0),
        graft.functions.MultiPatternCount.build(stringArrayLit(args(1),
          "multi_pattern_count patterns")), distinctMode = false)
    },
    fn("multi_pattern_distinct", "multi_pattern_distinct(s, array('p1', ...)) - distinct patterns hit in one pass") {
      args => graft.functions.MultiPatternCount(args(0),
        graft.functions.MultiPatternCount.build(stringArrayLit(args(1),
          "multi_pattern_distinct patterns")), distinctMode = true)
    },
    fn("dtw_distance", "dtw_distance(a, b) - dynamic-time-warping distance of two bigint series, L1 cell cost") {
      args => graft.functions.DtwDistance(args(0), args(1))
    },
    fn("modal_count", "modal_count(arr) - occurrence count of the most frequent element") {
      args => graft.functions.ModalCount(args(0))
    },
    fn("entropy_term_sum", "entropy_term_sum(arr) - sum of c*ln(c) over element counts as DECIMAL(27,12)") {
      args => graft.functions.EntropyTermSum(args(0))
    },
    fn("hyperplane_bits", "hyperplane_bits(vec, array(array(...))) - LSH sign-bit string of vec against a constant hyperplane matrix") {
      args => graft.functions.HyperplaneBits(args(0), args(1))
    },
  )

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => JaccardRewrite)
    ext.injectPlannerStrategy(_ => TopKPerKeyStrategy)
    functions.foreach(ext.injectFunction)
  }
}
