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

  private def literalBound(cond: Expression): Boolean = {
    def reg(e: Expression): Boolean = e match {
      case a: AttributeReference => BoundedFilterCols.contains(a.name.toLowerCase)
      case _ => e.children.exists(reg) // casts/aliases over the column
    }
    cond.exists {
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

  /** The subtree with CACHE and AQE wrappers expanded: when a branch was
    * persisted by an earlier query (suite run order is arbitrary), the
    * broadcast side renders as an InMemoryTableScan whose provenance —
    * the aggregate/limit that bounded it — lives in the relation's
    * cachedPlan, which is not a `children` member; same for an
    * AdaptiveSparkPlanExec's input. Without this, the audit's verdict
    * would depend on which specs ran first (observed: emb_kmeans
    * centroids cached by an earlier suite). */
  private def expanded(p: SparkPlan): Seq[SparkPlan] = {
    val inner: Seq[SparkPlan] = p match {
      case s: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
        expanded(s.relation.cachedPlan)
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        expanded(a.inputPlan)
      case qs: org.apache.spark.sql.execution.adaptive.QueryStageExec =>
        expanded(qs.plan)
      case _ => Seq.empty
    }
    p +: (p.children.flatMap(expanded) ++ inner)
  }

  /** The boundedness verdict for one broadcast-side subtree: Some(reason)
    * when sanctioned, None when unclassifiable. */
  def boundedReason(side: SparkPlan): Option[String] = {
    val nodes = expanded(side)
    // a wrapper counts as a leaf only through its expansion, not itself
    val leaves = nodes.filter(p => p.children.isEmpty &&
      !p.isInstanceOf[org.apache.spark.sql.execution.columnar.InMemoryTableScanExec] &&
      !p.isInstanceOf[org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec] &&
      !p.isInstanceOf[org.apache.spark.sql.execution.adaptive.QueryStageExec])
    if (nodes.exists(p => simple(p).contains("Aggregate")))
      Some("aggregate")
    else if (nodes.exists(p =>
        simple(p).contains("Limit") || simple(p).contains("TakeOrdered")))
      Some("limit")
    else if (leaves.nonEmpty && leaves.forall {
        case r: RangeExec => r.numElements.isValidLong &&
          r.numElements.toLong <= MaxBoundedRange
        case l if simple(l) == "LocalTableScanExec" => true
        case l if simple(l) == "FileSourceScanExec" =>
          BoundedDimFiles.exists(l.toString.contains)
        case _ => false
      })
      Some("bounded dim/LUT leaves")
    else if (nodes.exists {
        case f: FilterExec => literalBound(f.condition)
        case _ => false
      })
      Some("registered bounded filter")
    else None
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
