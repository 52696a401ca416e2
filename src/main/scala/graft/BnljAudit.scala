package graft

import org.apache.spark.sql.catalyst.expressions.{
  AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual,
  In, InSet, LessThan, LessThanOrEqual, Literal}
import org.apache.spark.sql.execution.{FilterExec, RangeExec, SparkPlan}
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}

/** Mechanical boundedness audit of every BroadcastNestedLoopJoin — the
  * machine version of the per-round human adjudication ("all BNLJs are
  * intentional broadcast-side-bounded crossJoins"): a BNLJ is sanctioned
  * ONLY when its broadcast side provably derives from
  *
  *  - an AGGREGATE (scalar attaches of 1-row aggregates; k-row LUT /
  *    codebook / centroid tables — every grouped aggregate in this
  *    engine's broadcast positions groups by a model-sized key), or
  *  - a LIMIT / top-k (TakeOrderedAndProject, Global/LocalLimit), or
  *  - REGISTERED bounded leaves only (the fixed dim tables, literal
  *    LocalTableScans, bounded Range), or
  *  - a REGISTERED bounded filter: a literal equality/range/IN predicate
  *    on a column whose registration (below, each with its reason)
  *    certifies the filtered branch is query-sized, not corpus-sized.
  *
  * Anything else is an audit failure: `PlanSpec` runs this over every
  * registered query's sparkPlan (pre-exchange physical plan — BNLJ
  * children are direct, no ReusedExchange indirection), so a future
  * plan that broadcasts an unbounded side fails the suite instead of
  * waiting for a human to re-read PLANS.md.
  */
object BnljAudit {

  /** Dim tables whose cardinality is fixed by the schema (TPC-H region:
    * 5 rows, nation: 25 — scale-factor-independent). */
  val BoundedDimFiles: Seq[String] = Seq("region.parquet", "nation.parquet")

  /** Columns where a literal =/</<=/IN predicate bounds the branch BY
    * CONSTRUCTION, each with why:
    *  - vec_id / q_id: `vec_id < NQueries` carves the fixed query set
    *    out of the embedding corpus (the similarity family's probe side);
    *  - prn / arn / rn / rnk: rank columns from a row_number that the
    *    branch filters to a literal top-R/top-nprobe — at most that many
    *    rows per partition key survive;
    *  - cluster / cell: a literal IN over probed cells (nprobe × queries
    *    values by construction);
    *  - s / sub: subspace index (fixed PQ subspace count);
    *  - round / n_merges / k / grams: sweep-tier literals (fixed tier set).
    */
  val BoundedFilterCols: Set[String] =
    Set("vec_id", "q_id", "prn", "arn", "rn", "rnk", "cluster", "cell",
      "s", "sub", "round", "n_merges", "k", "grams")

  /** Max Range(…) size still considered a bounded literal generator. */
  val MaxBoundedRange = 65536L

  /** Queries whose all-pairs BNLJ is the POINT: the exact brute-force
    * ground-truth tiers, labeled as calibration stages in their own
    * scaladoc, against which the banded/bucketed production forms
    * (`dedup_embedding_lsh`, the probe-sampled tier's recall) are
    * measured. These are the ONLY sanctioned unbounded broadcasts;
    * registering them here keeps the exemption enumerable and auditable
    * instead of widening the taxonomy until it can't fail. */
  val CalibrationExempt: Set[String] =
    Set("dedup_embedding", "dedup_embedding_sampled")

  final case class Finding(query: String, verdict: Option[String], plan: String)

  private def simple(p: SparkPlan): String = p.getClass.getSimpleName

  /** A literal bound must be a TOP-LEVEL conjunct: split on And only —
    * a bounded predicate hiding inside an Or branch bounds nothing (the
    * other branch may pass the whole corpus), so Or is never descended
    * (advisor-caught weakening in the `cond.exists` traversal this
    * replaces). */
  private def literalBound(cond: Expression): Boolean = {
    def reg(e: Expression): Boolean = e match {
      case a: AttributeReference => BoundedFilterCols.contains(a.name.toLowerCase)
      case _ => e.children.exists(reg) // casts/aliases over the column
    }
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    conjuncts(cond).exists {
      case LessThan(a, _: Literal) => reg(a)
      case LessThanOrEqual(a, _: Literal) => reg(a)
      case GreaterThan(_: Literal, a) => reg(a)
      case GreaterThanOrEqual(_: Literal, a) => reg(a)
      case EqualTo(a, _: Literal) => reg(a)
      case EqualTo(_: Literal, a) => reg(a)
      case In(a, vs) if vs.forall(_.isInstanceOf[Literal]) => reg(a)
      case InSet(a, _) => reg(a)
      case _ => false
    }
  }

  /** CACHE/AQE wrappers are transparent for classification: an
    * InMemoryTableScan's provenance — the aggregate/limit that bounded
    * it — lives in the relation's cachedPlan (not a `children` member;
    * suite run order is arbitrary, observed: emb_kmeans centroids cached
    * by an earlier suite); same for AdaptiveSparkPlanExec/QueryStageExec
    * inputs. */
  private def unwrapped(p: SparkPlan): Option[SparkPlan] = p match {
    case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
      Some(s.relation.cachedPlan)
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      Some(a.inputPlan)
    case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
      Some(qs.plan)
    case _ => None
  }

  private def boundedLeaf(l: SparkPlan): Boolean = l match {
    case r: RangeExec => r.numElements.isValidLong &&
      r.numElements.toLong <= MaxBoundedRange
    case _ if simple(l) == "LocalTableScanExec" => true
    case _ if simple(l) == "FileSourceScanExec" =>
      BoundedDimFiles.exists(l.toString.contains)
    case _ => false
  }

  /** The boundedness verdict for one broadcast-side subtree: Some(reason)
    * when sanctioned, None when unclassifiable.
    *
    * Classification walks the ROOT OUTPUT PATH (advisor-caught: the old
    * any-node-in-subtree scan would sanction `corpus.join(broadcast(topK))`
    * because SOME node under the broadcast was a Limit — even though the
    * corpus side of that join makes the broadcast OUTPUT unbounded). The
    * bounding op must DOMINATE the output:
    *  - an Aggregate / Limit / registered-bounded Filter node bounds
    *    everything above it on the path — accept;
    *  - row-preserving/reducing unary ops (Project, Sort, Exchange,
    *    Window, Expand, Generate over a bounded input, codegen/cache/AQE
    *    wrappers) pass the question down to their input;
    *  - a JOIN's output is bounded only if: left-semi/anti/existence —
    *    its LEFT side is (output ⊆ left); otherwise BOTH sides are
    *    (k×m of two query-sized inputs stays query-sized);
    *  - a UNION is bounded iff every child is;
    *  - a leaf must be a registered bounded dim/LUT/Range.
    * Generate (explode) multiplies rows but only by per-row array arity
    * over an already-bounded input — same acceptance the old taxonomy
    * gave aggregate-derived explodes, now explicit. */
  def boundedReason(side: SparkPlan): Option[String] = {
    import org.apache.spark.sql.execution.joins.BaseJoinExec
    def walk(p: SparkPlan): Option[String] = unwrapped(p) match {
      case Some(inner) => walk(inner)
      case None => p match {
        case _ if simple(p).contains("Aggregate") => Some("aggregate")
        case _ if simple(p).contains("Limit") ||
          simple(p).contains("TakeOrdered") => Some("limit")
        case f: FilterExec if literalBound(f.condition) =>
          Some("registered bounded filter")
        case j: BaseJoinExec =>
          import org.apache.spark.sql.catalyst.plans.{LeftSemi, LeftAnti, ExistenceJoin}
          j.joinType match {
            case LeftSemi | LeftAnti | _: ExistenceJoin => walk(j.left)
            case _ =>
              for (l <- walk(j.left); r <- walk(j.right))
                yield if (l == r) l else s"$l×$r"
          }
        case u if simple(u) == "UnionExec" =>
          val parts = u.children.map(walk)
          if (parts.forall(_.isDefined)) Some(parts.flatten.distinct.mkString("∪"))
          else None
        case l if l.children.isEmpty =>
          if (boundedLeaf(l)) Some("bounded dim/LUT leaves") else None
        case one if one.children.size == 1 => walk(one.children.head)
        case _ => None
      }
    }
    walk(side)
  }

  /** Every BNLJ of `plan` classified; `query` labels the findings. */
  def audit(query: String, plan: SparkPlan): Seq[Finding] =
    plan.collect { case b: BroadcastNestedLoopJoinExec =>
      val side = b.buildSide match {
        case BuildLeft => b.left
        case BuildRight => b.right
      }
      Finding(query, boundedReason(side),
        side.toString.linesIterator.take(8).mkString("\n"))
    }
}
