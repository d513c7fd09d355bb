package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ArrayType, LongType}

/** Optimizer rule: rewrite a PURE range join — `point BETWEEN lo AND hi`
  * with no equi-key — into a banded equi-join.
  *
  * Spark plans a join whose condition has no equality conjunct as a
  * nested-loop join: O(|L|·|R|) comparisons, the operator that stops
  * working first at scale. The standard fix (done by hand in q36/q38) is
  * banding: bucket the point by a fixed bin width, explode each interval
  * to the buckets it covers, equi-join on the bucket, and keep the
  * original predicate as a residual. This rule AUTOMATES the rewrite at
  * the logical-plan level, so the user writes the natural θ-join and the
  * planner's own ExtractEquiJoinKeys then picks a hash/sort-merge
  * strategy on the bucket key. Cost model: banded is
  * O(|L| + |R|·avgSpans + matches) — linear, versus the quadratic loop.
  *
  * Activation: set `spark.graft.rangeJoin.binSize` (a positive long, in
  * the point column's units; choose ≥ the typical interval width so most
  * intervals explode to 1–2 buckets). Install per-session via
  * `SparkSession.builder.withExtensions(new graft.GraftExtensions)`, or
  * at runtime on a live session through
  * `spark.experimental.extraOptimizations`.
  *
  * Scope guards (the rewrite must never fire where it could lose): inner
  * joins only; exactly one `lo <= point` / `point <= hi` pair, all three
  * of LongType; point from one side, both bounds from the other; no
  * existing cross-side equality conjunct (those joins already hash). The
  * original condition is kept verbatim as residual, so the rewrite is
  * result-identical by construction: a matching pair shares the point's
  * single bucket (bucket(point) ∈ [bucket(lo), bucket(hi)]) exactly
  * once, and non-matches are filtered by the residual.
  *
  * Hostile intervals cannot break it: bucket arithmetic is exact floor
  * division over the whole Long domain (incl. Long.MinValue sentinels),
  * and rows whose bucket span exceeds `spark.graft.rangeJoin.maxBuckets`
  * (default 4096) — or whose bounds are NULL/inverted — are routed to a
  * θ-join FALLBACK branch against the point side and unioned back in,
  * so a stray open-ended interval degrades that one row's work to the
  * original nested-loop cost instead of failing the query or exploding
  * a sequence.
  */
object BandedRangeJoin {
  /** Marks the θ-join fallback branch the rule itself emits, so the
    * fixed-point batch does not re-rewrite it (see apply). */
  private[plans] val Rewritten =
    new org.apache.spark.sql.catalyst.trees.TreeNodeTag[Unit]("graft.bandedRangeJoin.rewritten")

  /** Idempotently add the rule to a LIVE session via
    * `spark.experimental.extraOptimizations` (sessions built with
    * `withExtensions(new GraftExtensions)` get it at construction and
    * don't need this). Dormant until the binSize conf is set. */
  def install(session: SparkSession): Unit = synchronized {
    val cur = session.experimental.extraOptimizations
    if (!cur.exists(_.isInstanceOf[BandedRangeJoin]))
      session.experimental.extraOptimizations = cur :+ BandedRangeJoin(session)
  }
}

case class BandedRangeJoin(session: SparkSession)
    extends Rule[LogicalPlan] with PredicateHelper {

  private val ConfKey = "spark.graft.rangeJoin.binSize"

  private def binSize: Option[Long] =
    session.conf.getOption(ConfKey)
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .filter(_ > 0)

  override def apply(plan: LogicalPlan): LogicalPlan = binSize match {
    case None => plan
    case Some(bin) =>
      plan.transformUp {
        // the θ-join FALLBACK branch we emit carries the skip tag (tags
        // survive transform copies): without it the rule would re-match
        // its own output's range predicate forever and never reach the
        // batch's fixed point. The tag alone is not durable — a rule in
        // another batch that rebuilds the Join via case-class copy()
        // (rather than makeCopy/withNewChildren) drops tags, after which
        // this rule would re-wrap the fallback every batch iteration
        // until maxIterations (result-correct but plan bloat). So the
        // STRUCTURAL guard below backs it up: the fallback is the only
        // inner θ-join whose interval-side child is our own wide-row
        // Filter (Or(IsNull(c), Not(c)) over a bucket-arithmetic c).
        case j @ Join(_, _, Inner, Some(_), _)
            if j.getTagValue(BandedRangeJoin.Rewritten).isEmpty &&
              !isOwnFallback(j) =>
          rewrite(j, bin).getOrElse(j)
      }
  }

  /** Structural re-detection of the rule's own θ-join fallback branch
    * (see apply): one child is the wide-row Filter this rule emits —
    * `Or(IsNull(c), Not(c))` with both sides the same narrowness
    * predicate, which contains the bucket IntegralDivide. A user join
    * accidentally matching this exact shape is only SKIPPED (it keeps
    * its original nested-loop plan), never mis-rewritten. */
  private def isOwnFallback(j: Join): Boolean = j.children.exists {
    case Filter(Or(IsNull(a), Not(b)), _) if a.semanticEquals(b) =>
      b.exists(_.isInstanceOf[IntegralDivide])
    case _ => false
  }

  /** floor(e / bin) as exact integer arithmetic, valid over the WHOLE
    * Long domain: truncating divide, minus 1 when a negative value has a
    * remainder. (The tempting `(e - pmod(e, bin)) / bin` underflows for
    * e within pmod of Long.MinValue — sentinel open bounds live exactly
    * there.) `e div bin` cannot overflow for bin ≥ 1, and the -1
    * correction applies only when the quotient is negative, far from
    * Long.MinValue. */
  private def bucketOf(e: Expression, bin: Long): Expression = {
    val q = IntegralDivide(e, Literal(bin))
    val r = Remainder(e, Literal(bin))
    If(And(LessThan(e, Literal(0L)), Not(EqualTo(r, Literal(0L)))),
      Subtract(q, Literal(1L)), q)
  }

  private def rewrite(j: Join, bin: Long): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val leftOut = j.left.outputSet
    val rightOut = j.right.outputSet
    def fromLeft(e: Expression) = e.references.subsetOf(leftOut) && e.references.nonEmpty
    def fromRight(e: Expression) = e.references.subsetOf(rightOut) && e.references.nonEmpty

    // joins that already carry a cross-side equality hash fine as-is
    val hasEqui = conjuncts.exists {
      case EqualTo(a, b) => (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
      case EqualNullSafe(a, b) => (fromLeft(a) && fromRight(b)) || (fromLeft(b) && fromRight(a))
      case _ => false
    }
    if (hasEqui) return None

    // normalize ≥/≤/>/< into (point, bound, isLower): strict bounds band
    // identically (the residual keeps strictness exact)
    def asBound(c: Expression): Seq[(Expression, Expression, Boolean)] = c match {
      case GreaterThanOrEqual(p, lo) => Seq((p, lo, true))
      case GreaterThan(p, lo) => Seq((p, lo, true))
      case LessThanOrEqual(p, hi) => Seq((p, hi, false))
      case LessThan(p, hi) => Seq((p, hi, false))
      case _ => Seq.empty
    }
    val bounds = conjuncts.flatMap(asBound).filter { case (p, b, _) =>
      p.dataType == LongType && b.dataType == LongType &&
        ((fromLeft(p) && fromRight(b)) || (fromRight(p) && fromLeft(b)))
    }
    val pair = bounds.collectFirst(Function.unlift {
      case lower @ (p, _, true) =>
        bounds.collectFirst {
          case (p2, hi, false) if p2.semanticEquals(p) => (p, lower._2, hi)
        }
      case _ => None
    })

    pair.flatMap { case (point, lo, hi) =>
      if (!(fromLeft(lo) == fromLeft(hi) && fromRight(lo) == fromRight(hi))) None
      else {
        val pointOnLeft = fromLeft(point)
        val (pointPlan, intervalPlan) = if (pointOnLeft) (j.left, j.right) else (j.right, j.left)

        val bucketAlias = Alias(bucketOf(point, bin), "__graft_bucket_p")()
        val pointSide = Project(pointPlan.output :+ bucketAlias, pointPlan)

        val bLo = bucketOf(lo, bin)
        val bHi = bucketOf(hi, bin)
        // WIDE intervals (span > maxBuckets) must not explode — a single
        // sentinel row like hi = Long.MaxValue would try to materialize
        // ~2^63/bin sequence elements and turn a slow-but-correct θ-join
        // into a hard failure. Split the interval relation instead:
        // narrow rows take the banded equi-join; the (by-assumption
        // rare) wide/NULL-bounded rows take the original θ-join against
        // the point side, and the two branches union — result-identical
        // for EVERY input, no configuration cliff.
        // span test without arithmetic that can overflow: bHi-bLo wraps
        // when the buckets straddle ±2^62 (bin=1). Or() short-circuits:
        // when bLo sits within maxBuckets of Long.MaxValue the interval
        // is narrow by construction and bLo+maxBuckets is never computed.
        val mb = maxBuckets
        val narrowPred = And(GreaterThanOrEqual(bHi, bLo),
          Or(GreaterThan(bLo, Literal(Long.MaxValue - mb)),
            LessThan(bHi, Add(bLo, Literal(mb)))))
        val isNarrow = And(And(IsNotNull(lo), IsNotNull(hi)), narrowPred)
        val narrow = Filter(isNarrow, intervalPlan)
        val wide = Filter(Or(IsNull(isNarrow), Not(isNarrow)), intervalPlan)

        // Sequence is TimeZoneAwareExpression (unresolved without a zone
        // even for longs); bHi - bLo is bounded by the narrow filter so
        // neither the subtraction nor the sequence can overflow
        val seq = Sequence(bLo, bHi, Some(Literal(1L)),
          Some(session.sessionState.conf.sessionLocalTimeZone))
        val bucketAttr = AttributeReference("__graft_bucket_i", LongType)()
        val intervalSide = Generate(Explode(seq), Nil, outer = false, None,
          Seq(bucketAttr), narrow)

        val newCond = And(EqualTo(bucketAlias.toAttribute, bucketAttr), j.condition.get)
        val (nl, nr) = if (pointOnLeft) (pointSide, intervalSide) else (intervalSide, pointSide)
        val banded = Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint))
        val (wl, wr) = if (pointOnLeft) (pointPlan, wide) else (wide, pointPlan)
        val wideJoin = Join(wl, wr, Inner, j.condition, j.hint)
        wideJoin.setTagValue(BandedRangeJoin.Rewritten, ())
        val widened = Project(j.output, wideJoin)
        Some(Union(Seq(banded, widened)))
      }
    }
  }

  /** Max buckets a single interval may explode to before it is routed to
    * the θ-join fallback branch instead. */
  private def maxBuckets: Long =
    session.conf.getOption("spark.graft.rangeJoin.maxBuckets")
      .flatMap(v => scala.util.Try(v.trim.toLong).toOption)
      .filter(_ > 0).getOrElse(4096L)
}
