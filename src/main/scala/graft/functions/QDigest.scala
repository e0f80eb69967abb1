package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.{floor, lit, udaf}

/** Q-digest (Shrivastava et al.) mergeable quantile sketch as a typed
  * `Aggregator` — the deterministic, bounded-rank-error member of the
  * sketch family next to HLL (q335), KMV (q217), CMS (q108), AMS (q306)
  * and SpaceSaving ([[HeavyHitters]]).
  *
  * Values live in a fixed dyadic universe [0, 2^levels). The sketch is a
  * count map over binary-tree nodes (root id 1, children 2v/2v+1, leaf
  * for value x at id 2^levels + x). Compression folds any child pair whose
  * pair+parent count is ≤ t = n/k into the parent, which (a) caps the
  * sketch at ~3k nodes regardless of n and (b) moves each folded count
  * at most `levels` levels up, so any quantile read off the compressed
  * tree is within ~levels·t ranks of exact. Everything is integer
  * arithmetic on counts — no randomness — so the sketch is
  * bit-reproducible, and merge (add maps, add n, recompress) is
  * associative up to the same error bound, which makes it a valid partial
  * aggregate: map-side combine applies, only O(k)-node sketches cross the
  * shuffle.
  *
  * INPUT CONTRACT: values must already lie in [0, 2^levels). Out-of-range
  * input FAILS the job with a clear message — a silent clamp would
  * saturate quantile boundaries with no diagnostic (the r6-advice bug:
  * l_orderkey overflows the default 24-level universe above ~sf2).
  * Callers with negative / fractional / wide domains either raise
  * `levels` (≤ 62) or pre-map through [[affine]].
  *
  * 100 TB story: an exact percentile needs a global sort (q55) or a
  * two-pass select; this answers any quantile with one scan and a
  * 3k-node state per partition, and per-day sketches stored like
  * [[graft.metrics.ProfileStore]] rows roll up to any date range
  * without re-reading data. Accuracy is not asserted — q366 gates the
  * measured rank error of every reported quantile against the L·t
  * bound on real data.
  */
object QDigest {

  /** Default universe depth: values in [0, 2^24) — covers money-in-cents
    * up to ~167M cents. Raise per sketch for wider domains. */
  val L = 24

  /** Compression factor: sketch ≤ ~3k nodes, rank error ≤ ~levels·(n/k). */
  val K = 4096

  final case class Sketch(nodes: Map[Long, Long], n: Long)
  final case class Node(id: Long, count: Long)
  final case class Digest(n: Long, nodes: Array[Node])

  @inline private def depth(id: Long): Int =
    63 - java.lang.Long.numberOfLeadingZeros(id)

  /** Largest value covered by node `id` (inclusive right endpoint). */
  def rightEnd(id: Long, levels: Int = L): Long = {
    val d = depth(id)
    val width = 1L << (levels - d)
    (id - (1L << d) + 1) * width - 1
  }

  /** Affine pre-map into the dyadic universe for negative / fractional
    * domains: x → floor((x − offset) · scale) as BIGINT. E.g. doubles in
    * [−50, 50) at 3-decimal resolution: `affine(c, -50.0, 1000.0)` needs
    * 17 levels. The map is monotone, so quantiles of the mapped values
    * are the mapped quantiles; invert reads with q/scale + offset. */
  def affine(c: Column, offset: Double, scale: Double): Column =
    floor((c.cast("double") - lit(offset)) * lit(scale)).cast("long")

  /** Bottom-up q-digest compression, in place. Child pairs at each level
    * fold into their parent while pair+parent ≤ t; pairs are independent
    * (each parent has exactly one child pair), so iteration order within
    * a level cannot change the result — the sketch stays deterministic.
    */
  private def compress(m: mutable.HashMap[Long, Long], n: Long,
                       levels: Int): Unit = {
    val t = n / K
    if (t <= 0L) return
    var d = levels
    while (d >= 1) {
      val ids = m.keysIterator.filter(id => depth(id) == d && (id & 1L) == 0L)
        .toArray
      var i = 0
      while (i < ids.length) {
        val v = ids(i); val sib = v | 1L; val p = v >> 1
        val cv = m.getOrElse(v, 0L)
        val cs = m.getOrElse(sib, 0L)
        val cp = m.getOrElse(p, 0L)
        if (cv + cs + cp <= t && cv + cs > 0L) {
          m.remove(v); m.remove(sib)
          m.update(p, cp + cv + cs)
        }
        i += 1
      }
      // pairs are keyed on the even id above, so an odd-id node whose even
      // sibling is absent never got considered — fold those singletons too
      val odd = m.keysIterator.filter(id => depth(id) == d && (id & 1L) == 1L
        && !m.contains(id ^ 1L)).toArray
      var j = 0
      while (j < odd.length) {
        val v = odd(j); val p = v >> 1
        val cv = m.getOrElse(v, 0L)
        val cp = m.getOrElse(p, 0L)
        if (cv + cp <= t && cv > 0L) {
          m.remove(v); m.update(p, cp + cv)
        }
        j += 1
      }
      d -= 1
    }
  }

  private def toMutable(s: Sketch): mutable.HashMap[Long, Long] = {
    val m = new mutable.HashMap[Long, Long](math.max(16, s.nodes.size * 2), 0.75)
    s.nodes.foreach { case (k, v) => m.update(k, v) }
    m
  }

  def aggregator(levels: Int = L): Aggregator[Long, Sketch, Digest] = {
    require(levels >= 1 && levels <= 62,
      s"qdigest levels must be in [1, 62], got $levels")
    new Aggregator[Long, Sketch, Digest] {
      def zero: Sketch = Sketch(Map.empty, 0L)

      def reduce(b: Sketch, value: Long): Sketch = {
        if (value < 0L || value >= (1L << levels))
          throw new IllegalArgumentException(
            s"qdigest input $value outside the dyadic universe " +
              s"[0, 2^$levels) — raise `levels` or pre-map the column " +
              "through QDigest.affine(offset, scale)")
        val leaf = (1L << levels) + value
        val nodes = b.nodes.updated(leaf, b.nodes.getOrElse(leaf, 0L) + 1L)
        val n = b.n + 1
        if (nodes.size > 8 * K) {
          val m = new mutable.HashMap[Long, Long](nodes.size * 2, 0.75)
          nodes.foreach { case (k, c) => m.update(k, c) }
          compress(m, n, levels)
          Sketch(m.toMap, n)
        } else Sketch(nodes, n)
      }

      def merge(a: Sketch, b: Sketch): Sketch = {
        val m = toMutable(a)
        b.nodes.foreach { case (k, c) => m.update(k, m.getOrElse(k, 0L) + c) }
        val n = a.n + b.n
        compress(m, n, levels)
        Sketch(m.toMap, n)
      }

      def finish(s: Sketch): Digest = {
        val m = toMutable(s)
        compress(m, s.n, levels)
        Digest(s.n,
          m.toArray.sortBy(_._1).map { case (id, c) => Node(id, c) })
      }

      def bufferEncoder: Encoder[Sketch] = Encoders.product[Sketch]
      def outputEncoder: Encoder[Digest] =
        org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Digest]()
    }
  }

  /** Column entry point: qdigest(longCol) -> struct(n, nodes). Values
    * must lie in [0, 2^levels) — see the input contract above. */
  def sketch(c: Column, levels: Int = L): Column =
    udaf(aggregator(levels)).apply(c)

  /** Quantile read: nodes ordered by (right endpoint asc, deeper-first);
    * the reported value is the right endpoint of the node where the
    * cumulative count first reaches ceil(q·n). `levels` must match the
    * sketch's. */
  def quantile(digest: Seq[(Long, Long)], n: Long, q: Double,
               levels: Int = L): Long = {
    val sorted = digest.sortBy { case (id, _) => (rightEnd(id, levels), -id) }
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    var i = 0
    while (i < sorted.length) {
      cum += sorted(i)._2
      if (cum >= target) return rightEnd(sorted(i)._1, levels)
      i += 1
    }
    if (sorted.nonEmpty) rightEnd(sorted.last._1, levels) else 0L
  }

  /** Worst-case rank slack for a sketch built-and-merged over n values:
    * each of ≤2 compression generations moves counts ≤ `levels` levels
    * at ≤ t per level. */
  def rankBound(n: Long, levels: Int = L): Long =
    2L * levels * math.max(1L, n / K) + levels
}
