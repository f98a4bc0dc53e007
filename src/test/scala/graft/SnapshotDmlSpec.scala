package graft

import org.apache.spark.sql.functions._

import graft.operators.{SnapshotTable => ST}

/** SQL DML on snapshot tables ([[graft.sources.SnapshotDmlRule]]): UPDATE,
  * DELETE with arbitrary predicates, and MERGE INTO lowered onto the native
  * copy-on-write / merge-on-read machinery — with manifest-stats dir
  * pruning, run-time manifests, and CDC interplay.
  */
class SnapshotDmlSpec extends SparkSpec {

  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft_sqldml").toString
    spark.conf.set("spark.sql.catalog.gdml", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gdml.root", w)
    w
  }

  private var n = 0
  private def fresh(): String = { warehouse; n += 1; s"d$n" }
  private def sql(q: String) = spark.sql(q)

  /** Three banded appends (0-99, 1000-1099, 2000-2099) with id stats. */
  private def banded(t: String): String = {
    import spark.implicits._
    val dir = s"$warehouse/$t"
    Seq(0L, 1000L, 2000L).foreach { base =>
      ST.append(spark, (base until base + 100L).map(i => (i, s"v$i", i % 7L))
        .toDF("id", "v", "x"), dir, statsBy = Seq("id"))
    }
    dir
  }

  test("UPDATE rewrites only the dirs the WHERE can touch (folded-cast pruning)") {
    val t = fresh()
    val dir = banded(t)
    sql(s"UPDATE gdml.$t SET v = 'hit', x = x + 1 WHERE id >= 1000 AND id < 1100")
    val m = ST.manifest(spark, dir, ST.latestId(spark, dir).get)
    assert(m.operation == "update")
    // outer bands carried untouched; only the middle dir was rewritten
    assert(m.live.contains("snap-000000") && m.live.contains("snap-000002")
      && !m.live.contains("snap-000001"), m.live)
    val rows = sql(s"SELECT * FROM gdml.$t WHERE v = 'hit'").collect()
    assert(rows.length == 100 && rows.forall(r => r.getLong(0) >= 1000L
      && r.getLong(0) < 1100L && r.getLong(2) == (r.getLong(0) % 7L) + 1L))
    assert(sql(s"SELECT count(*) AS c FROM gdml.$t").head.getLong(0) == 300L)
    // point UPDATE prunes through the literal's widening cast (id = 5 parses
    // as id = cast(5 as bigint); the command folds it before pruning)
    sql(s"UPDATE gdml.$t SET v = 'pt' WHERE id = 5")
    val m2 = ST.manifest(spark, dir, ST.latestId(spark, dir).get)
    assert(m2.live.contains("snap-000002") && !m2.live.contains("snap-000000"), m2.live)
    assert(sql(s"SELECT v FROM gdml.$t WHERE id = 5").head.getString(0) == "pt")
  }

  test("UPDATE without WHERE hits every row; NULL-condition rows pass through") {
    val t = fresh()
    import spark.implicits._
    val dir = s"$warehouse/$t"
    ST.append(spark, Seq((1L, Some("a")), (2L, None), (3L, Some("c")))
      .toDF("id", "v"), dir)
    sql(s"UPDATE gdml.$t SET v = 'all'")
    assert(sql(s"SELECT * FROM gdml.$t WHERE v = 'all'").count() == 3L)
    // v = 'all' comparison is NULL for null v → those rows must NOT update
    ST.append(spark, Seq((4L, Option.empty[String])).toDF("id", "v"), dir)
    sql(s"UPDATE gdml.$t SET v = 'x2' WHERE v = 'zzz'") // matches nothing
    assert(sql(s"SELECT * FROM gdml.$t WHERE v IS NULL").count() == 1L)
  }

  test("UPDATE over pending MOR deletes materializes them, never resurrects") {
    val t = fresh()
    import spark.implicits._
    val dir = s"$warehouse/$t"
    ST.append(spark, (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    ST.deleteKeys(spark, dir, Seq(3L, 7L).toDF("id"), "id")
    sql(s"UPDATE gdml.$t SET v = 'u' WHERE id < 100")
    val got = sql(s"SELECT id FROM gdml.$t ORDER BY id").collect().map(_.getLong(0))
    assert(got.toSeq == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L))
    assert(sql(s"SELECT * FROM gdml.$t WHERE v = 'u'").count() == 8L)
  }

  test("DELETE with multi-column and disjunctive predicates (beyond SupportsDelete)") {
    val t = fresh()
    val dir = banded(t)
    sql(s"DELETE FROM gdml.$t WHERE id >= 1000 AND id < 1100 AND x = 0")
    val m = ST.manifest(spark, dir, ST.latestId(spark, dir).get)
    assert(m.operation == "delete")
    assert(m.live.contains("snap-000000") && m.live.contains("snap-000002")
      && !m.live.contains("snap-000001"), m.live)
    val midLeft = sql(s"SELECT count(*) AS c FROM gdml.$t " +
      "WHERE id >= 1000 AND id < 1100").head.getLong(0)
    assert(midLeft == (1000L until 1100L).count(_ % 7L != 0L))
    // disjunction: not prunable (keeps all dirs) but still correct
    sql(s"DELETE FROM gdml.$t WHERE id = 0 OR id = 2000")
    assert(sql(s"SELECT count(*) AS c FROM gdml.$t WHERE id IN (0, 2000)")
      .head.getLong(0) == 0L)
  }

  test("MERGE INTO: update/delete/insert clauses with conditions, one atomic commit") {
    val t = fresh()
    import spark.implicits._
    val dir = s"$warehouse/$t"
    ST.append(spark, Seq((1L, "a", 10L), (2L, "b", 20L), (3L, "c", 30L))
      .toDF("id", "v", "x"), dir)
    val before = ST.latestId(spark, dir).get
    val stats = sql(
      s"""MERGE INTO gdml.$t USING (
         |  SELECT 1 AS id, 'A' AS v, 100 AS x, false AS del UNION ALL
         |  SELECT 2, 'B', 200, true UNION ALL
         |  SELECT 9, 'I', 900, false) s
         |ON $t.id = s.id
         |WHEN MATCHED AND s.del THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = s.v, x = $t.x + s.x
         |WHEN NOT MATCHED AND s.x > 0 THEN INSERT (id, v, x) VALUES (s.id, s.v, s.x)
         |""".stripMargin).collect()
    assert(stats.toSeq.map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      == Seq((1L, 1L, 1L))) // updated, deleted, inserted
    // ONE commit for the whole merge
    assert(ST.latestId(spark, dir).contains(before + 1))
    val got = sql(s"SELECT id, v, x FROM gdml.$t ORDER BY id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, "A", 110L), (3L, "c", 30L), (9L, "I", 900L)))
  }

  test("MERGE first-match-wins: UPDATE-before-DELETE masks the delete") {
    import spark.implicits._
    // both conditions TRUE for id=1; clause order decides
    def mk(): String = {
      val t = fresh()
      ST.append(spark, Seq((1L, "a"), (2L, "b")).toDF("id", "v"), s"$warehouse/$t")
      t
    }
    val tu = mk()
    sql(s"""MERGE INTO gdml.$tu USING (SELECT 1 AS id) s ON $tu.id = s.id
           |WHEN MATCHED AND true THEN UPDATE SET v = 'upd'
           |WHEN MATCHED AND true THEN DELETE
           |""".stripMargin)
    assert(sql(s"SELECT v FROM gdml.$tu WHERE id = 1").head.getString(0) == "upd")
    val td = mk()
    sql(s"""MERGE INTO gdml.$td USING (SELECT 1 AS id) s ON $td.id = s.id
           |WHEN MATCHED AND true THEN DELETE
           |WHEN MATCHED AND true THEN UPDATE SET v = 'upd'
           |""".stripMargin)
    assert(sql(s"SELECT count(*) AS c FROM gdml.$td WHERE id = 1").head.getLong(0) == 0L)
  }

  test("MERGE INSERT with a column subset nulls the rest; UPDATE SET */INSERT *") {
    val t = fresh()
    import spark.implicits._
    ST.append(spark, Seq((1L, "a", 10L)).toDF("id", "v", "x"), s"$warehouse/$t")
    sql(s"""MERGE INTO gdml.$t USING (SELECT 7 AS id, 'g' AS v) s
           |ON $t.id = s.id
           |WHEN NOT MATCHED THEN INSERT (id, v) VALUES (s.id, s.v)
           |""".stripMargin)
    val r7 = sql(s"SELECT id, v, x FROM gdml.$t WHERE id = 7").head
    assert(r7.getString(1) == "g" && r7.isNullAt(2))
    sql(s"""MERGE INTO gdml.$t USING (SELECT 1 AS id, 'A' AS v, 99 AS x) s
           |ON $t.id = s.id
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *
           |""".stripMargin)
    val r1 = sql(s"SELECT id, v, x FROM gdml.$t WHERE id = 1").head
    assert(r1.getString(1) == "A" && r1.getLong(2) == 99L)
  }

  test("changelogCdc recovers UPDATE as delete(old)+insert(new); incremental fails loudly") {
    val t = fresh()
    import spark.implicits._
    val dir = s"$warehouse/$t"
    ST.append(spark, (0L until 10L).map(i => (i, s"v$i")).toDF("id", "v"), dir)
    val pre = ST.latestId(spark, dir).get
    sql(s"UPDATE gdml.$t SET v = 'upd' WHERE id = 4")
    val post = ST.latestId(spark, dir).get
    val cdc = ST.changelogCdc(spark, dir, pre, post)
      .select("_change_type", "id", "v").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSet
    assert(cdc == Set(("delete", 4L, "v4"), ("insert", 4L, "upd")))
    intercept[Exception](ST.incremental(spark, dir, pre, post).count())
  }

  test("unsupported shapes fail loudly, never corrupt") {
    val t = fresh()
    import spark.implicits._
    ST.append(spark, Seq((1L, "a")).toDF("id", "v"), s"$warehouse/$t")
    // multi-equality ON
    intercept[Exception](sql(
      s"""MERGE INTO gdml.$t USING (SELECT 1 AS id, 'a' AS v) s
         |ON $t.id = s.id AND $t.v = s.v
         |WHEN MATCHED THEN UPDATE SET v = s.v""".stripMargin))
    // NOT MATCHED BY SOURCE
    intercept[Exception](sql(
      s"""MERGE INTO gdml.$t USING (SELECT 1 AS id) s ON $t.id = s.id
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin))
    // WITH SCHEMA EVOLUTION
    intercept[Exception](sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO gdml.$t
         |USING (SELECT 1 AS id, 'b' AS w) s ON $t.id = s.id
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin))
    // duplicate source keys break "the" replacement — loud, pre-commit
    intercept[Exception](sql(
      s"""MERGE INTO gdml.$t USING (SELECT 1 AS id UNION ALL SELECT 1) s
         |ON $t.id = s.id
         |WHEN MATCHED THEN UPDATE SET v = 'x'""".stripMargin))
    // table unchanged by all of the above
    assert(sql(s"SELECT v FROM gdml.$t WHERE id = 1").head.getString(0) == "a")
  }
}
