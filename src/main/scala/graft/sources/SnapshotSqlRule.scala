package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, AttributeReference, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, InSet, LessThan, LessThanOrEqual, Literal, NamedExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Max, Min}
import org.apache.spark.sql.catalyst.planning.PhysicalOperation
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, DeleteFromTable, Filter, LocalRelation, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.SnapshotTable

/** Pre-CBO substitution for [[SnapshotCatalog]] relations — the Spark-first
  * alternative to a custom DSv2 batch reader: instead of re-implementing a
  * (row-at-a-time) parquet scan behind the DSv2 `Batch` API, each catalog
  * relation is REPLACED in the logical plan by the table's native read —
  * the same vectorized `spark.read.parquet` scans, merge-on-read anti-joins
  * and schema-as-of-snapshot projection the API path uses — so SQL reads
  * inherit whole-stage codegen, parquet filter pushdown, AQE, and broadcast
  * sizing with zero custom execution code. Runs once, after the operator-
  * optimization fixed point (predicates are fully pushed and collapsed
  * next to the relation) and before the DSv2 push-down batch (the relation
  * must not survive to `V2ScanRelationPushDown`).
  *
  * Three rewrites, in priority order:
  *
  *  1. '''Manifest aggregates''': a global `count(*)` / `min` / `max` over
  *     a bare relation becomes a [[LocalRelation]] row computed from the
  *     pinned manifest — zero IO at any table size. Guards: no pending
  *     merge-on-read deletes (`totalRows`/stat bounds are physical), no
  *     grouping, no filters, min/max only on columns whose manifest stats
  *     cover EVERY live dir (an all-null dir writes no stat entry, and a
  *     dir committed before the column joined `stats_by` has none — both
  *     make bounds incomplete, so the rewrite declines).
  *  2. '''Dir-pruned scans''': conjuncts of the pushed filter that compare
  *     a stat'd column to literals prune data dirs driver-side via
  *     [[SnapshotTable.planScan]] (range hull) and
  *     [[SnapshotTable.planScanEq]] (point lookups — Bloom sidecars prune
  *     dirs whose bounds can't). The filter itself stays in the plan (on
  *     the no-deletes path) so kept files still get exact row-group
  *     pushdown; pruning only removes provably-empty IO — the
  *     `readWhere` contract, now reachable from plain SQL.
  *  3. '''Leaf grafting''': the surviving relation is swapped for the
  *     native plan with a [[Project]] of aliases that re-issues the
  *     relation's original attribute ids, so the surrounding plan is
  *     untouched. Tables with pending MOR deletes consume the pushed
  *     filter into the native frame instead (a `Filter` above the
  *     anti-join union would not reach parquet through `PhysicalOperation`
  *     at planning time); between compactions that path trades row-group
  *     pruning on the delta window for correctness, exactly like the API
  *     read.
  *
  * `DeleteFromTable` subtrees are left alone: the relation under a DELETE
  * is the write TARGET (`SupportsDelete` resolves it at planning), not a
  * read.
  */
class SnapshotSqlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = go(plan)

  private def go(plan: LogicalPlan): LogicalPlan = plan match {
    case d: DeleteFromTable => d
    case agg: Aggregate if manifestAgg(agg).nonEmpty => manifestAgg(agg).get
    case PhysicalOperation(projects, filters, rel: DataSourceV2Relation)
        if rel.table.isInstanceOf[GraftSqlTable] =>
      graft(projects, filters, rel, rel.table.asInstanceOf[GraftSqlTable])
    case PhysicalOperation(projects, filters, rel: DataSourceV2Relation)
        if rel.table.isInstanceOf[GraftMetaTable] =>
      val native = rel.table.asInstanceOf[GraftMetaTable].recipe()
      shape(projects, filters, aliased(rel.output, native.queryExecution.optimizedPlan),
        rel.output)
    case other => other.mapChildren(go)
  }

  // ---- 1. global aggregates answered from the manifest ----

  private object Underlying {
    def unapply(p: LogicalPlan): Option[DataSourceV2Relation] = p match {
      case r: DataSourceV2Relation => Some(r)
      case Project(pl, r: DataSourceV2Relation)
          if pl.forall(_.isInstanceOf[AttributeReference]) => Some(r)
      case _ => None
    }
  }

  private def manifestAgg(agg: Aggregate): Option[LogicalPlan] = agg.child match {
    case Underlying(rel) if rel.table.isInstanceOf[GraftSqlTable] &&
        agg.groupingExpressions.isEmpty =>
      val m = rel.table.asInstanceOf[GraftSqlTable].manifest
      if (m.deletes.nonEmpty) None // physical counts/bounds, not net
      else {
        val vals = agg.aggregateExpressions.map(answer(_, m))
        if (vals.forall(_.isDefined))
          Some(LocalRelation(agg.output.map(_.toAttribute),
            Seq(InternalRow.fromSeq(vals.map(_.get)))))
        else None
      }
    case _ => None
  }

  private def answer(e: NamedExpression, m: SnapshotTable.Manifest): Option[Any] =
    e match {
      case Alias(ae: AggregateExpression, _) if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          case Count(Seq(Literal(v, _))) if v != null => Some(m.totalRows)
          case Min(a: AttributeReference) => statExtreme(m, a, min = true)
          case Max(a: AttributeReference) => statExtreme(m, a, min = false)
          case _ => None
        }
      case Alias(l: Literal, _) => Some(l.value)
      case _ => None
    }

  private def statExtreme(m: SnapshotTable.Manifest, a: AttributeReference,
                          min: Boolean): Option[Any] = {
    val entries = m.stats.filter(st => st.column == a.name && m.live.contains(st.dir))
    if (m.live.isEmpty) Some(null) // empty table: min/max are NULL
    else if (entries.map(_.dir).toSet != m.live.toSet) None // incomplete coverage
    else {
      val rendered = entries.map(st => if (min) st.min else st.max)
      val tpe = entries.head.tpe
      def pick[T](xs: Seq[T])(implicit ord: Ordering[T]): T =
        if (min) xs.min else xs.max
      val v: Any = tpe match {
        case "long" => pick(rendered.map(_.toLong))
        case "double" => pick(rendered.map(_.toDouble))
        case _ => pick(rendered)
      }
      // back to the column's Catalyst-internal value
      a.dataType match {
        case ByteType => Some(v.asInstanceOf[Long].toByte)
        case ShortType => Some(v.asInstanceOf[Long].toShort)
        case IntegerType => Some(v.asInstanceOf[Long].toInt)
        case LongType => Some(v)
        case FloatType => Some(v.asInstanceOf[Double].toFloat)
        case DoubleType => Some(v)
        case StringType => Some(UTF8String.fromString(v.asInstanceOf[String]))
        case _ => None // stats never cover other types (statDomain)
      }
    }
  }

  // ---- 2 + 3. dir pruning and leaf grafting ----

  private def graft(projects: Seq[NamedExpression], filters: Seq[Expression],
                    rel: DataSourceV2Relation, tbl: GraftSqlTable): LogicalPlan = {
    val m = tbl.manifest
    val kept = prune(tbl, m, filters)
    val leaf =
      if (kept.isEmpty)
        LocalRelation(rel.output)
      else if (m.deletes.isEmpty) {
        // plain scan: graft the relation only; filters/projects stay in the
        // outer plan and reach the parquet scan natively at planning
        aliased(rel.output, tbl.nativeRead(kept).queryExecution.optimizedPlan)
      } else {
        // MOR anti-join union: consume the filter into the native frame so
        // the nested optimization pushes it through the union/joins
        val base = tbl.nativeRead(kept)
        val byName = base.queryExecution.analyzed.output
          .map(a => a.name.toLowerCase -> a).toMap
        val pushed = filters.reduceOption(And).map { cond =>
          val remapped = cond.transform {
            case ar: AttributeReference => byName.getOrElse(ar.name.toLowerCase,
              sys.error(s"substitution lost filter column '${ar.name}' on ${tbl.dir}"))
          }
          base.filter(Bridge.column(remapped))
        }.getOrElse(base)
        return shape(projects, Nil,
          aliased(rel.output, pushed.queryExecution.optimizedPlan), rel.output)
      }
    shape(projects, filters, leaf, rel.output)
  }

  private def prune(tbl: GraftSqlTable, m: SnapshotTable.Manifest,
                    filters: Seq[Expression]): Seq[String] =
    SnapshotPrune.keepDirs(spark, tbl.dir, m, filters)

  // ---- plan plumbing ----

  /** Graft `plan` under a Project that re-issues the original relation's
    * attribute ids — the standard leaf-swap seam (the surrounding plan's
    * references stay valid; matching is by name, types must agree since
    * both sides derive from the same manifest schema).
    */
  private def aliased(out: Seq[Attribute], plan: LogicalPlan): LogicalPlan = {
    val byName = plan.output.map(a => a.name.toLowerCase -> a).toMap
    Project(out.map { a =>
      val src = byName.getOrElse(a.name.toLowerCase,
        sys.error(s"catalog substitution lost column '${a.name}'"))
      require(src.dataType == a.dataType,
        s"catalog substitution type drift on '${a.name}': " +
          s"${src.dataType.catalogString} vs ${a.dataType.catalogString}")
      Alias(src, a.name)(exprId = a.exprId)
    }, plan)
  }

  private def shape(projects: Seq[NamedExpression], filters: Seq[Expression],
                    leaf: LogicalPlan, relOutput: Seq[Attribute]): LogicalPlan = {
    val filtered =
      if (filters.isEmpty) leaf else Filter(filters.reduce(And), leaf)
    // PhysicalOperation hands back the relation's own output when no
    // Project existed — skip the no-op node in that case
    if (projects == relOutput) filtered else Project(projects, filtered)
  }
}

/** Manifest-driven dir pruning from Catalyst predicates — shared by the
  * SELECT substitution rule ([[SnapshotSqlRule]]) and the DML commands
  * ([[SnapshotDmlRule]]'s UPDATE hint).
  */
private[sources] object SnapshotPrune {

  /** Live dirs that survive every prunable conjunct (non-prunable conjuncts
    * keep everything — pruning only ever removes provably-empty IO).
    */
  def keepDirs(spark: SparkSession, dir: String, m: SnapshotTable.Manifest,
               filters: Seq[Expression]): Seq[String] = {
    var kept: Set[String] = m.live.toSet
    def range(c: String, lo: Option[Any], hi: Option[Any]): Unit =
      kept &= SnapshotTable.planScan(m, SnapshotTable.KeyRange(c, lo, hi))._1.toSet
    def point(c: String, v: Any): Unit =
      kept &= SnapshotTable.planScanEq(spark, dir, m, c, v)._1.toSet
    def points(c: String, vs: Seq[Any]): Unit =
      kept &= vs.flatMap(v =>
        SnapshotTable.planScanEq(spark, dir, m, c, v)._1).toSet
    filters.flatMap(splitAnd).foreach {
      case EqualTo(a: AttributeReference, l: Literal) =>
        ext(l).foreach(point(a.name, _))
      case EqualTo(l: Literal, a: AttributeReference) =>
        ext(l).foreach(point(a.name, _))
      case GreaterThan(a: AttributeReference, l: Literal) =>
        ext(l).foreach(v => range(a.name, Some(v), None))
      case GreaterThanOrEqual(a: AttributeReference, l: Literal) =>
        ext(l).foreach(v => range(a.name, Some(v), None))
      case LessThan(a: AttributeReference, l: Literal) =>
        ext(l).foreach(v => range(a.name, None, Some(v)))
      case LessThanOrEqual(a: AttributeReference, l: Literal) =>
        ext(l).foreach(v => range(a.name, None, Some(v)))
      case GreaterThan(l: Literal, a: AttributeReference) =>
        ext(l).foreach(v => range(a.name, None, Some(v)))
      case GreaterThanOrEqual(l: Literal, a: AttributeReference) =>
        ext(l).foreach(v => range(a.name, None, Some(v)))
      case LessThan(l: Literal, a: AttributeReference) =>
        ext(l).foreach(v => range(a.name, Some(v), None))
      case LessThanOrEqual(l: Literal, a: AttributeReference) =>
        ext(l).foreach(v => range(a.name, Some(v), None))
      case In(a: AttributeReference, vs)
          if vs.length <= 64 && vs.forall(_.isInstanceOf[Literal]) =>
        val lits = vs.map(v => ext(v.asInstanceOf[Literal]))
        if (lits.forall(_.nonEmpty)) points(a.name, lits.map(_.get))
      case InSet(a: AttributeReference, hset) if hset.size <= 64 =>
        val vs = hset.toSeq.map(extRaw).filter(_ != null)
        if (vs.length == hset.size) points(a.name, vs)
      case _ => () // not prunable: keep all
    }
    m.live.filter(kept) // preserve manifest order
  }

  private[sources] def splitAnd(e: Expression): Seq[Expression] = e match {
    case And(l, r) => splitAnd(l) ++ splitAnd(r)
    case other => Seq(other)
  }

  /** Literal -> external value planScan/planScanEq understand (they compare
    * via the stat domain rendering, and probe Blooms by Long/String).
    */
  private def ext(l: Literal): Option[Any] =
    if (l.value == null) None else Some(extRaw(l.value))

  private def extRaw(v: Any): Any = v match {
    case u: UTF8String => u.toString
    case other => other
  }
}
