package graft

import graft.operators.{SnapshotTable => ST}

/** Maintenance stored procedures on the SQL catalog
  * (`CALL <cat>.system.<proc>(...)` — [[graft.sources.SnapshotCatalog]]'s
  * ProcedureCatalog face): compaction, retention, rollback, refs and
  * branches, all driven from SQL with LocalScan result rows.
  */
class SnapshotProcSpec extends SparkSpec {

  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft_sqlproc").toString
    spark.conf.set("spark.sql.catalog.gproc", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gproc.root", w)
    w
  }

  private var n = 0
  private def fresh(): String = { warehouse; n += 1; s"p$n" }
  private def sql(q: String) = spark.sql(q)

  private def seed(t: String, batches: Int = 3): String = {
    import spark.implicits._
    val dir = s"$warehouse/$t"
    (0 until batches).foreach { b =>
      ST.append(spark, (0L until 10L).map(i => (b * 100L + i, s"v$b-$i"))
        .toDF("id", "v"), dir, statsBy = Seq("id"))
    }
    dir
  }

  test("CALL compact rewrites the live set into one dir; row set unchanged") {
    val t = fresh()
    val dir = seed(t)
    val r = sql(s"CALL gproc.system.compact(table => '$t')").collect()(0)
    assert(r.getLong(0) == 3L && !r.getBoolean(1))
    val m = ST.manifest(spark, dir, 3L)
    assert(m.operation == "replace" && m.live.size == 1)
    assert(sql(s"SELECT count(*) AS c FROM gproc.$t").head.getLong(0) == 30L)
    // idempotent: a second compact of an already-1-dir table skips
    val r2 = sql(s"CALL gproc.system.compact(table => '$t')").collect()(0)
    assert(r2.getBoolean(1))
  }

  test("CALL compact(zorder_by) and compact_small route their options") {
    val t = fresh()
    seed(t)
    intercept[Exception]( // zorder needs >= 2 columns — the API guard fires
      sql(s"CALL gproc.system.compact(table => '$t', zorder_by => 'id')"))
    val r = sql(s"CALL gproc.system.compact_small(table => '$t', " +
      "max_bytes => 1000000)").collect()(0)
    assert(!r.getBoolean(1)) // three tiny dirs pack into one
    assert(sql(s"SELECT count(*) AS c FROM gproc.$t").head.getLong(0) == 30L)
  }

  test("CALL expire_snapshots + vacuum: bounded history, orphans reclaimed") {
    val t = fresh()
    val dir = seed(t, batches = 4)
    val e1 = sql(s"CALL gproc.system.expire_snapshots(table => '$t', keep_last => 1)")
      .collect()(0).getSeq[String](0)
    intercept[Exception](ST.asOf(spark, dir, 0L).count()) // expired
    // appends accumulate live dirs, so expiring history alone deletes
    // nothing — only a compact makes the old dirs unreferenced
    assert(e1.isEmpty)
    sql(s"CALL gproc.system.compact(table => '$t')")
    val e2 = sql(s"CALL gproc.system.expire_snapshots(table => '$t', keep_last => 1)")
      .collect()(0).getSeq[String](0)
    assert(e2.nonEmpty) // expire itself reclaims the now-unreferenced dirs
    // vacuum reaps ORPHANS (crashed writes, dropped branches) — none here
    val vacuumed = sql(s"CALL gproc.system.vacuum(table => '$t')")
      .collect()(0).getSeq[String](0)
    assert(vacuumed.isEmpty)
    assert(sql(s"SELECT count(*) AS c FROM gproc.$t").head.getLong(0) == 40L)
  }

  test("CALL rollback_to_snapshot restores state as a new commit") {
    val t = fresh()
    seed(t)
    val r = sql(s"CALL gproc.system.rollback_to_snapshot(table => '$t', " +
      "snapshot_id => 0)").collect()(0)
    assert(r.getLong(0) == 3L)
    assert(sql(s"SELECT count(*) AS c FROM gproc.$t").head.getLong(0) == 10L)
    // pre-rollback state stays time-travelable
    assert(sql(s"SELECT count(*) AS c FROM gproc.$t VERSION AS OF 2")
      .head.getLong(0) == 30L)
  }

  test("CALL create_tag / drop_ref / create_branch / fast_forward / drop_branch") {
    val t = fresh()
    import spark.implicits._
    val dir = seed(t, batches = 2)
    sql(s"CALL gproc.system.create_tag(table => '$t', tag => 'rel', snapshot_id => 0)")
    assert(sql(s"SELECT * FROM gproc.$t VERSION AS OF 'rel'").count() == 10L)
    sql(s"CALL gproc.system.create_branch(table => '$t', branch => 'exp', from_id => 1)")
    ST.appendToBranch(spark, Seq((999L, "z")).toDF("id", "v"), dir, "exp")
    assert(sql(s"SELECT * FROM gproc.$t VERSION AS OF 'branch:exp'").count() == 21L)
    assert(sql(s"SELECT * FROM gproc.$t").count() == 20L) // main untouched
    val ff = sql(s"CALL gproc.system.fast_forward(table => '$t', branch => 'exp')")
      .collect()(0)
    assert(!ff.getBoolean(1))
    assert(sql(s"SELECT * FROM gproc.$t").count() == 21L)
    // fast-forward publishes AND drops the branch
    assert(sql(s"SELECT count(*) AS c FROM gproc.$t.branches").head.getLong(0) == 0L)
    // drop_branch discards an UNpublished branch; its dirs become orphans
    sql(s"CALL gproc.system.create_branch(table => '$t', branch => 'dead', from_id => 1)")
    ST.appendToBranch(spark, Seq((1000L, "q")).toDF("id", "v"), dir, "dead")
    sql(s"CALL gproc.system.drop_branch(table => '$t', branch => 'dead')")
    assert(sql(s"SELECT count(*) AS c FROM gproc.$t.branches").head.getLong(0) == 0L)
    val vacuumed = sql(s"CALL gproc.system.vacuum(table => '$t')")
      .collect()(0).getSeq[String](0)
    assert(vacuumed.nonEmpty) // the dropped branch's dir reaped
    sql(s"CALL gproc.system.drop_ref(table => '$t', name => 'rel')")
    assert(sql(s"SELECT count(*) AS c FROM gproc.$t.refs").head.getLong(0) == 0L)
  }

  test("unknown procedure / table and wrong namespace fail loudly") {
    val t = fresh()
    seed(t, batches = 1)
    intercept[Exception](sql(s"CALL gproc.system.nope(table => '$t')"))
    intercept[Exception](sql("CALL gproc.system.vacuum(table => 'no_such')"))
    intercept[Exception](sql(s"CALL gproc.vacuum(table => '$t')"))
  }
}
