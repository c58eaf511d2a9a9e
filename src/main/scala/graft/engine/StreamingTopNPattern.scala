package graft.engine

import org.apache.spark.sql.catalyst.analysis.{UnresolvedAttribute, UnresolvedFunction, UnresolvedRelation, UnresolvedStar}
import org.apache.spark.sql.catalyst.expressions.{Alias, Descending, Expression, LessThan, LessThanOrEqual, Literal, WindowExpression}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, SubqueryAlias}

/** The detected Flink top-N query shape: `SELECT … FROM (SELECT *,
  * ROW_NUMBER() OVER (PARTITION BY p ORDER BY o) AS rn FROM t) WHERE
  * rn <= k`.
  *
  * `orderCols` pairs each ORDER BY column with its descending flag;
  * `limit` is normalized to the inclusive bound (`rn < k` arrives as
  * k−1).
  */
final case class StreamTopNShape(
    table: String,
    partitionCols: Seq[String],
    orderCols: Seq[(String, Boolean)],
    limit: Int)

/** Detects the Flink streaming top-N idiom on a PARSED (unresolved) plan.
  *
  * The reference's SQL envelope accepts `ROW_NUMBER() OVER (PARTITION BY …
  * ORDER BY …) … WHERE rn <= k` on an unbounded table (Flink's documented
  * top-N pattern); Spark's Structured Streaming planner rejects
  * rank-over-stream outright, so the engine must recognize the shape
  * BEFORE planning and route it to the stateful top-N operator. Detection
  * is deliberately conservative — exactly one row_number window alias over
  * a plain relation, simple column references everywhere — anything
  * fancier falls through to the normal streaming planner and fails with
  * Spark's own error.
  */
object StreamingTopNPattern {

  private def isSimple(e: Expression): Boolean = e match {
    case _: UnresolvedStar => true
    case _: UnresolvedAttribute => true
    case Alias(_: UnresolvedAttribute, _) => true
    case _ => false
  }

  private def unwrap(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, c) => unwrap(c)
    case _ => p
  }

  def detect(plan: LogicalPlan): Option[StreamTopNShape] = {
    val filter = plan match {
      case Project(pl, f: Filter) if pl.forall(isSimple) => f
      case f: Filter => f
      case _ => return None
    }
    val bound = filter.condition match {
      case LessThanOrEqual(a: UnresolvedAttribute, Literal(v: Int, _)) => Some((a.name, v))
      case LessThan(a: UnresolvedAttribute, Literal(v: Int, _)) => Some((a.name, v - 1))
      case _ => None
    }
    bound match {
      case Some((rnName, k)) if k > 0 =>
        unwrap(filter.child) match {
          case Project(items, r: UnresolvedRelation) =>
            val windows = items.collect {
              case Alias(WindowExpression(fn: UnresolvedFunction, spec), name) =>
                (fn, spec, name)
            }
            val rest = items.filter {
              case Alias(_: WindowExpression, _) => false
              case e => isSimple(e)
            }
            windows match {
              case Seq((fn, spec, name))
                  if name.equalsIgnoreCase(rnName) &&
                    fn.nameParts.last.equalsIgnoreCase("row_number") &&
                    rest.size == items.size - 1 &&
                    spec.partitionSpec.forall(_.isInstanceOf[UnresolvedAttribute]) &&
                    spec.orderSpec.forall(_.child.isInstanceOf[UnresolvedAttribute]) &&
                    spec.orderSpec.nonEmpty =>
                Some(StreamTopNShape(
                  r.multipartIdentifier.last,
                  spec.partitionSpec.map(_.asInstanceOf[UnresolvedAttribute].name),
                  spec.orderSpec.map(o => (
                    o.child.asInstanceOf[UnresolvedAttribute].name,
                    o.direction == Descending)),
                  k))
              case _ => None
            }
          case _ => None
        }
      case _ => None
    }
  }
}
