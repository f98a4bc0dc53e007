package graft.sources

import org.apache.spark.sql.{Column => SqlColumn, Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, Cast, EqualTo, ExprId, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical.{Assignment, DeleteAction, DeleteFromTable, InsertAction, LogicalPlan, MergeAction, MergeIntoTable, OverwritePartitionsDynamic, SubqueryAlias, UpdateAction, UpdateTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.functions.lit
import org.apache.spark.sql.graft.Bridge

import graft.operators.SnapshotTable

/** SQL DML over [[SnapshotCatalog]] tables — `UPDATE`, `DELETE FROM` (any
  * predicate), and `MERGE INTO` from plain `spark.sql`:
  *
  * {{{
  *   UPDATE graft.logs SET level = 'warn', n = n + 1 WHERE ts < cutoff
  *   DELETE FROM graft.logs WHERE level = 'debug' AND ts < cutoff
  *   MERGE INTO graft.logs USING updates u ON logs.id = u.id
  *     WHEN MATCHED AND u.del THEN DELETE
  *     WHEN MATCHED THEN UPDATE SET level = u.level
  *     WHEN NOT MATCHED THEN INSERT *
  * }}}
  *
  * Spark's own row-level path requires `SupportsRowLevelOperations` — a
  * DSv2 scan/write pair this library deliberately avoids (reads would drop
  * out of the native vectorized plan, writes would need a custom batch
  * writer). Instead, a post-hoc resolution rule replaces each fully-
  * resolved DML node over a graft table with a [[LeafRunnableCommand]]
  * that drives the table's native machinery (the Delta approach):
  *
  *  - `UPDATE`  → [[SnapshotTable.update]]  — copy-on-write rewrite of only
  *    the dirs the folded WHERE conjuncts can touch (manifest stats +
  *    Bloom pruning via [[SnapshotPrune]]).
  *  - `DELETE`  → [[SnapshotTable.deleteWhere]] — same pruning, arbitrary
  *    predicates (conjunctions over several columns, disjunctions, ...).
  *  - `MERGE`   → [[SnapshotTable.merge]] — the O(delta) merge-on-read
  *    commit: source-key-bounded dir pruning, broadcast match join, one
  *    atomic data-dir + delete-file commit. Clause conditions and
  *    assignments translate onto the merge's `tgt`/`src` struct views;
  *    first-match-wins clause order is encoded into the API's
  *    delete-wins semantics (see [[SnapshotDmlRule.mergeCommand]]).
  *
  * The commands recompute pruning against the manifest AT RUN TIME (the
  * analysis-time pin is a read concern; writes always act on the chain
  * head). Restrictions fail loudly, never silently: merge needs a single
  * target-key equality ON clause, at most one UPDATE and one DELETE
  * matched clause, no NOT MATCHED BY SOURCE, no WITH SCHEMA EVOLUTION
  * (appends evolve schemas; SQL merge keeps the stamped one).
  */
class SnapshotDmlRule(spark: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case u @ UpdateTable(Unwrapped(tbl), assigns, cond) if u.resolved =>
      requireHead(tbl, "UPDATE")
      GraftUpdateCommand(tbl.dir, cond,
        assigns.map(a => targetName(a.key, "UPDATE SET") -> a.value))
    case d @ DeleteFromTable(Unwrapped(tbl), cond) if d.resolved =>
      requireHead(tbl, "DELETE")
      GraftDeleteCommand(tbl.dir, cond)
    case m: MergeIntoTable if m.resolved =>
      m.targetTable match {
        case Unwrapped(tbl) => mergeCommand(m, tbl)
        case _ => m
      }
    // df.writeTo("cat.t").option("partition_by","<expr>").overwritePartitions()
    // — Spark has no V1 fallback exec for dynamic overwrite, so the node
    // lowers here onto the table's own atomic partition-swap commit
    case o @ OverwritePartitionsDynamic(Unwrapped(tbl), query, opts, _, _)
        if o.resolved =>
      requireHead(tbl, "dynamic overwrite")
      val pExpr = opts.getOrElse("partition_by", sys.error(
        s"dynamic partition overwrite of ${tbl.dir} needs the partition " +
          "transform: .option(\"partition_by\", \"<expr>\") (the same " +
          "transform the table was appendPartitioned with — this format " +
          "stamps no table-level partition spec)"))
      GraftDynOverwriteCommand(tbl.dir, query, pExpr,
        opts.get("batch_id"),
        opts.get("stats_by").toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty),
        opts.get("bloom_by").toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty))
    case other => other
  }

  private object Unwrapped {
    def unapply(p: LogicalPlan): Option[GraftSqlTable] = p match {
      case SubqueryAlias(_, child) => unapply(child)
      case r: DataSourceV2Relation => r.table match {
        case t: GraftSqlTable => Some(t)
        case _ => None
      }
      case _ => None
    }
  }

  private def requireHead(tbl: GraftSqlTable, verb: String): Unit =
    require(!tbl.pinned, s"$verb on a pinned table (${tbl.dir}) — " +
      "writes go to the chain head; drop the VERSION/TIMESTAMP clause")

  private def targetName(key: Expression, where: String): String = key match {
    case a: AttributeReference => a.name
    case other => sys.error(s"$where assignment target must be a plain " +
      s"column, got ${other.sql} (nested-field assignment is not mapped)")
  }

  private def mergeCommand(m: MergeIntoTable, tbl: GraftSqlTable): LogicalPlan = {
    requireHead(tbl, "MERGE INTO")
    require(!m.schemaEvolutionEnabled,
      "MERGE ... WITH SCHEMA EVOLUTION is not mapped — SQL merge keeps the " +
        "stamped schema (appends evolve schemas)")
    require(m.notMatchedBySourceActions.isEmpty,
      "WHEN NOT MATCHED BY SOURCE is not mapped — use " +
        "SnapshotTable.deleteKeys/update for source-absent row actions")
    val tgtOut = m.targetTable.output
    val srcOut = m.sourceTable.output
    // ON: exactly one equality between a bare target column and a source-
    // side expression (Spark's widening cast on the source side is fine —
    // merge() re-casts the key to the table type; a cast on the TARGET side
    // would change join semantics, so it rejects)
    val conjs = SnapshotPrune.splitAnd(m.mergeCondition)
    require(conjs.length == 1,
      s"MERGE ON must be a single equality, got: ${m.mergeCondition.sql}")
    val tgtIds = tgtOut.map(_.exprId).toSet
    val srcIds = srcOut.map(_.exprId).toSet
    def srcOnly(e: Expression): Boolean =
      e.references.forall(a => srcIds.contains(a.exprId))
    val (keyAttr, srcKey) = conjs.head match {
      case EqualTo(a: AttributeReference, r) if tgtIds(a.exprId) && srcOnly(r) =>
        (a, r)
      case EqualTo(l, a: AttributeReference) if tgtIds(a.exprId) && srcOnly(l) =>
        (a, l)
      case other => sys.error("MERGE ON must equate one target column with " +
        s"a source expression, got: ${other.sql} (cast the source side " +
        "explicitly if Spark wrapped the target column in a cast)")
    }
    val (updates, deletes) = {
      val us = m.matchedActions.collect { case u: UpdateAction => u }
      val ds = m.matchedActions.collect { case d: DeleteAction => d }
      require(us.length <= 1 && ds.length <= 1 &&
        us.length + ds.length == m.matchedActions.length,
        "MERGE maps at most one WHEN MATCHED UPDATE and one WHEN MATCHED " +
          s"DELETE clause, got: ${m.matchedActions.mkString(", ")}")
      (us.headOption, ds.headOption)
    }
    val insertAct = m.notMatchedActions match {
      case Nil => None
      case Seq(i: InsertAction) => Some(i)
      case other => sys.error("MERGE maps at most one WHEN NOT MATCHED " +
        s"INSERT clause, got: ${other.mkString(", ")}")
    }
    // first-match-wins: when UPDATE precedes DELETE, a row matching both
    // conditions updates — encode by masking the delete with !updateCond
    // (the API itself is delete-wins, which matches DELETE-first order)
    val updateFirst = m.matchedActions.headOption.exists(_.isInstanceOf[UpdateAction])
    GraftMergeCommand(tbl.dir, m.sourceTable, tgtOut, srcOut,
      keyAttr.name, srcKey, updates, deletes, insertAct, updateFirst)
  }
}

/** Shared expression plumbing for the DML commands. */
private[sources] object SnapshotDml {

  /** Fold constant subexpressions (the analyzer wraps literals in casts —
    * `id = 1` arrives as `id = cast(1 as bigint)` — and [[SnapshotPrune]]
    * prunes on bare [[Literal]]s only; post-hoc rules run before the
    * optimizer would fold them).
    */
  def fold(e: Expression): Expression = e.transformUp {
    case x if x.foldable && !x.isInstanceOf[Literal] =>
      Literal.create(x.eval(null), x.dataType)
  }

  /** Expression -> Column against a frame whose columns are the table's
    * plain names (the CoW rewrite view): attribute references re-resolve
    * by name.
    */
  def plainCol(e: Expression): SqlColumn = Bridge.column(e.transform {
    case a: AttributeReference => UnresolvedAttribute(Seq(a.name))
  })

  /** Expression -> Column against the merge join's two struct views:
    * target attributes become `tgt.<name>`, source attributes `src.<name>`.
    */
  def structCol(e: Expression, tgtIds: Set[ExprId], srcIds: Set[ExprId])
      : SqlColumn = Bridge.column(e.transform {
    case a: AttributeReference =>
      if (tgtIds.contains(a.exprId)) UnresolvedAttribute(Seq("tgt", a.name))
      else if (srcIds.contains(a.exprId)) UnresolvedAttribute(Seq("src", a.name))
      else sys.error(s"MERGE expression references '${a.name}' from neither " +
        "the target nor the source")
  })

  def stripCast(e: Expression): Expression = e match {
    case c: Cast => stripCast(c.child)
    case other => other
  }
}

/** `UPDATE <table> SET ... [WHERE ...]` — copy-on-write via
  * [[SnapshotTable.update]], dirs pruned by the folded WHERE conjuncts
  * against the run-time manifest.
  */
case class GraftUpdateCommand(dir: String, condition: Option[Expression],
                              assigns: Seq[(String, Expression)])
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import SnapshotDml._
    val last = SnapshotTable.latestId(spark, dir).getOrElse(
      sys.error(s"$dir has no committed snapshot"))
    val m = SnapshotTable.manifest(spark, dir, last)
    val folded = condition.map(fold)
    val kept = folded match {
      case Some(c) => SnapshotPrune.keepDirs(spark, dir, m, Seq(c))
      case None => m.live
    }
    SnapshotTable.update(spark, dir,
      folded.map(plainCol).getOrElse(lit(true)),
      assigns.map { case (n, v) => n -> plainCol(v) }.toMap,
      Some(kept))
    Nil
  }
}

/** `DELETE FROM <table> WHERE <any predicate>` — copy-on-write via
  * [[SnapshotTable.deleteWhere]], same pruning as UPDATE. (Single-column
  * conjunctions also plan through [[GraftSqlTable]]'s `SupportsDelete`
  * when this rule is absent; the rule supersedes it with the general
  * path.)
  */
case class GraftDeleteCommand(dir: String, condition: Expression)
  extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    import SnapshotDml._
    val last = SnapshotTable.latestId(spark, dir).getOrElse(
      sys.error(s"$dir has no committed snapshot"))
    val m = SnapshotTable.manifest(spark, dir, last)
    val folded = fold(condition)
    val kept = SnapshotPrune.keepDirs(spark, dir, m, Seq(folded))
    SnapshotTable.deleteWhere(spark, dir, plainCol(folded), Some(kept))
    Nil
  }
}

/** `df.writeTo(<table>).overwritePartitions()` — one atomic dynamic
  * partition swap via [[SnapshotTable.overwritePartitions]]: exactly the
  * hidden partitions the frame produces values for are replaced, the rest
  * carry over untouched. The transform arrives as the `partition_by` write
  * option (an expression string over the frame's columns).
  */
case class GraftDynOverwriteCommand(dir: String, query: LogicalPlan,
                                    partitionExpr: String,
                                    batchId: Option[String],
                                    statsBy: Seq[String], bloomBy: Seq[String])
  extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(query)
  override def run(spark: SparkSession): Seq[Row] = {
    SnapshotTable.overwritePartitions(spark, Bridge.ofRows(spark, query), dir,
      org.apache.spark.sql.functions.expr(partitionExpr), batchId,
      statsBy = statsBy, bloomBy = bloomBy)
    Nil
  }
}

/** `MERGE INTO <table> USING <source> ON t.k = <src expr> WHEN ...` —
  * one atomic merge-on-read commit via [[SnapshotTable.merge]]. Returns
  * the per-clause row counts as one row (updated, deleted, inserted).
  */
case class GraftMergeCommand(dir: String, source: LogicalPlan,
                             targetOutput: Seq[Attribute],
                             sourceOutput: Seq[Attribute],
                             key: String, srcKey: Expression,
                             updateAct: Option[UpdateAction],
                             deleteAct: Option[DeleteAction],
                             insertAct: Option[InsertAction],
                             updateFirst: Boolean)
  extends LeafRunnableCommand {

  override val output: Seq[Attribute] = {
    import org.apache.spark.sql.types.LongType
    Seq(AttributeReference("updated", LongType, nullable = false)(),
      AttributeReference("deleted", LongType, nullable = false)(),
      AttributeReference("inserted", LongType, nullable = false)())
  }

  override def run(spark: SparkSession): Seq[Row] = {
    import SnapshotDml._
    val tgtIds = targetOutput.map(_.exprId).toSet
    val srcIds = sourceOutput.map(_.exprId).toSet
    def clause(e: Expression): SqlColumn = structCol(e, tgtIds, srcIds)

    val srcDf = Bridge.ofRows(spark, source)
    require(srcDf.columns.distinct.length == srcDf.columns.length,
      s"MERGE source has duplicate column names: ${srcDf.columns.mkString(", ")}")
    // the join key must exist in the source under the TARGET's key name
    val src = stripCast(srcKey) match {
      case a: AttributeReference if a.name == key => srcDf
      case _ if !srcDf.columns.contains(key) =>
        srcDf.withColumn(key, plainCol(srcKey))
      case other => sys.error(s"MERGE ON source side ${other.sql} collides " +
        s"with an existing source column '$key' — alias the source key " +
        s"column to '$key' instead")
    }

    def assignMap(as: Seq[Assignment], where: String): Map[String, SqlColumn] =
      as.map { a =>
        val n = a.key match {
          case ar: AttributeReference => ar.name
          case other => sys.error(s"$where assignment target must be a " +
            s"plain column, got ${other.sql}")
        }
        n -> clause(a.value)
      }.toMap

    val updCond = updateAct.map(_.condition.map(clause).getOrElse(lit(true)))
    val rawDelCond = deleteAct.map(_.condition.map(clause).getOrElse(lit(true)))
    // first-match-wins: UPDATE-before-DELETE masks the delete with the
    // update's condition (the API applies delete first)
    val delCond = (rawDelCond, updCond) match {
      case (Some(d), Some(u)) if updateFirst =>
        Some(d && !org.apache.spark.sql.functions.coalesce(u, lit(false)))
      case _ => rawDelCond
    }
    val stats = SnapshotTable.merge(spark, dir, src, key,
      update = updateAct.map(u => assignMap(u.assignments, "MERGE UPDATE SET")),
      updateIf = updCond,
      deleteIf = delCond,
      insert = insertAct.nonEmpty,
      insertIf = insertAct.flatMap(_.condition.map(clause)),
      insertAssign = insertAct.map(i => assignMap(i.assignments, "MERGE INSERT")))
    Seq(Row(stats.updated, stats.deleted, stats.inserted))
  }
}
