package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

import graft.operators.{SnapshotTable => ST}

/** SQL catalog over snapshot tables ([[graft.sources.SnapshotCatalog]] +
  * the pre-CBO substitution rule): CREATE/INSERT/SELECT/DELETE/TRUNCATE,
  * manifest-answered aggregates, dir pruning from plain WHERE clauses,
  * time travel, and metadata tables — all through `spark.sql`.
  */
class SnapshotSqlSpec extends SparkSpec {

  private lazy val warehouse = {
    val w = java.nio.file.Files.createTempDirectory("graft_sqlcat").toString
    spark.conf.set("spark.sql.catalog.gsql", "graft.sources.SnapshotCatalog")
    spark.conf.set("spark.sql.catalog.gsql.root", w)
    // plan-string assertions below read scan locations — don't truncate them
    spark.conf.set("spark.sql.maxMetadataStringLength", "2000")
    w
  }

  private var n = 0
  private def fresh(): String = { warehouse; n += 1; s"t$n" }

  private def sql(q: String) = spark.sql(q)

  test("CREATE TABLE stamps schema; empty read; INSERT INTO; SELECT round-trips") {
    val t = fresh()
    sql(s"CREATE TABLE gsql.$t (id BIGINT, v STRING) TBLPROPERTIES (stats_by='id')")
    // empty state reads: zero rows WITH the stamped schema
    val empty = sql(s"SELECT * FROM gsql.$t")
    assert(empty.columns.toSeq == Seq("id", "v") && empty.count() == 0)
    sql(s"INSERT INTO gsql.$t VALUES (1, 'a'), (2, 'b'), (3, 'c')")
    sql(s"INSERT INTO gsql.$t VALUES (10, 'x'), (11, 'y')")
    val rows = sql(s"SELECT id, v FROM gsql.$t ORDER BY id").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 10L, 11L))
    // each INSERT is one snapshot commit
    assert(ST.latestId(spark, s"$warehouse/$t").contains(2L))
  }

  test("CREATE on an existing table fails; create() rejects bad stats columns") {
    val t = fresh()
    sql(s"CREATE TABLE gsql.$t (id BIGINT)")
    intercept[Exception](sql(s"CREATE TABLE gsql.$t (id BIGINT)"))
    intercept[Exception](ST.create(spark, s"$warehouse/zz_badstats",
      sql(s"SELECT * FROM gsql.$t").schema, statsBy = Seq("nope")))
    // array columns are non-comparable: fail at create, not first append
    import spark.implicits._
    val arr = Seq((1L, Seq(1, 2))).toDF("id", "toks").schema
    intercept[Exception](ST.create(spark, s"$warehouse/zz_badstats2", arr,
      statsBy = Seq("toks")))
  }

  test("global count/min/max answered from the manifest — zero scan in the plan") {
    val t = fresh()
    sql(s"CREATE TABLE gsql.$t (id BIGINT, v STRING) TBLPROPERTIES (stats_by='id')")
    sql(s"INSERT INTO gsql.$t VALUES (5, 'a'), (2, 'b'), (9, 'c')")
    sql(s"INSERT INTO gsql.$t VALUES (1, 'd'), (7, 'e')")
    val agg = sql(s"SELECT count(*) AS c, min(id) AS lo, max(id) AS hi FROM gsql.$t")
    // substituted pre-CBO: no relation survives, no parquet scan runs
    assert(agg.queryExecution.optimizedPlan.collect {
      case r: DataSourceV2Relation => r }.isEmpty)
    val aggPlan = agg.queryExecution.executedPlan.toString
    assert(aggPlan.contains("LocalTableScan") && !aggPlan.contains("Parquet"), aggPlan)
    val r = agg.collect()(0)
    assert(r.getLong(0) == 5L && r.getLong(1) == 1L && r.getLong(2) == 9L)
    // a column without manifest stats declines the shortcut but stays correct
    val v = sql(s"SELECT count(*) AS c, max(v) AS hi FROM gsql.$t").collect()(0)
    assert(v.getLong(0) == 5L && v.getString(1) == "e")
    // empty table: count 0, min/max NULL — still manifest-answered
    val e = fresh()
    sql(s"CREATE TABLE gsql.$e (id BIGINT) TBLPROPERTIES (stats_by='id')")
    val er = sql(s"SELECT count(*) AS c, min(id) AS lo FROM gsql.$e").collect()(0)
    assert(er.getLong(0) == 0L && er.isNullAt(1))
  }

  test("WHERE on a stats column prunes data dirs driver-side") {
    val t = fresh()
    import spark.implicits._
    val dir = s"$warehouse/$t"
    ST.append(spark, (0L until 100L).map(i => (i, s"v$i")).toDF("id", "v"),
      dir, statsBy = Seq("id"), bloomBy = Seq("v"))
    ST.append(spark, (1000L until 1100L).map(i => (i, s"v$i")).toDF("id", "v"),
      dir, statsBy = Seq("id"), bloomBy = Seq("v"))
    ST.append(spark, (2000L until 2100L).map(i => (i, s"v$i")).toDF("id", "v"),
      dir, statsBy = Seq("id"), bloomBy = Seq("v"))
    // range: only the middle dir intersects [1000, 1100)
    val mid = sql(s"SELECT * FROM gsql.$t WHERE id >= 1000 AND id < 1100")
    val mp = mid.queryExecution.executedPlan.toString
    assert(mp.contains("snap-000001") && !mp.contains("snap-000000")
      && !mp.contains("snap-000002"), mp)
    assert(mid.count() == 100)
    // point lookup on the bloom'd column prunes to one dir too
    val pt = sql(s"SELECT * FROM gsql.$t WHERE v = 'v2050'")
    val pp = pt.queryExecution.executedPlan.toString
    assert(pp.contains("snap-000002") && !pp.contains("snap-000001"), pp)
    assert(pt.collect().map(_.getLong(0)).toSeq == Seq(2050L))
    // nothing matches: the relation collapses to an empty LocalRelation
    val none = sql(s"SELECT * FROM gsql.$t WHERE id > 90000")
    assert(!none.queryExecution.executedPlan.toString.contains("snap-"))
    assert(none.count() == 0)
    // IN-list unions point prunes
    val in = sql(s"SELECT * FROM gsql.$t WHERE id IN (5, 1005)")
    val ip = in.queryExecution.executedPlan.toString
    assert(!ip.contains("snap-000002"), ip)
    assert(in.count() == 2)
  }

  test("joins and grouped aggregates over catalog tables stay correct") {
    val t = fresh()
    sql(s"CREATE TABLE gsql.$t (id BIGINT, grp STRING, x DOUBLE)")
    sql(s"INSERT INTO gsql.$t VALUES (1,'a',1.0),(2,'a',2.0),(3,'b',3.0),(4,'b',4.0)")
    val g = sql(
      s"SELECT grp, count(*) AS c, sum(x) AS s FROM gsql.$t GROUP BY grp ORDER BY grp")
      .collect()
    assert(g.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSeq ==
      Seq(("a", 2L, 3.0), ("b", 2L, 7.0)))
    // self-join through the catalog (two independent substitutions)
    val j = sql(s"SELECT a.id FROM gsql.$t a JOIN gsql.$t b ON a.id = b.id + 1 " +
      "ORDER BY a.id").collect()
    assert(j.map(_.getLong(0)).toSeq == Seq(2L, 3L, 4L))
  }

  test("INSERT with a batch_id is exactly-once through the SQL write path") {
    val t = fresh()
    sql(s"CREATE TABLE gsql.$t (id BIGINT, v STRING)")
    import spark.implicits._
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    df.writeTo(s"gsql.$t").option("batch_id", "ing-1").append()
    df.writeTo(s"gsql.$t").option("batch_id", "ing-1").append() // replay
    assert(sql(s"SELECT count(*) AS c FROM gsql.$t").collect()(0).getLong(0) == 2L)
    df.writeTo(s"gsql.$t").option("batch_id", "ing-2").append()
    assert(sql(s"SELECT count(*) AS c FROM gsql.$t").collect()(0).getLong(0) == 4L)
  }

  test("INSERT OVERWRITE replaces contents in one commit; history survives") {
    val t = fresh()
    sql(s"CREATE TABLE gsql.$t (id BIGINT, v STRING)")
    sql(s"INSERT INTO gsql.$t VALUES (1, 'a'), (2, 'b')")
    sql(s"INSERT OVERWRITE gsql.$t VALUES (100, 'z')")
    val now = sql(s"SELECT * FROM gsql.$t").collect()
    assert(now.length == 1 && now(0).getLong(0) == 100L)
    // pre-overwrite state stays time-travelable
    assert(sql(s"SELECT * FROM gsql.$t VERSION AS OF 1").count() == 2)
  }

  test("TRUNCATE TABLE empties in a metadata-only commit; schema survives") {
    val t = fresh()
    sql(s"CREATE TABLE gsql.$t (id BIGINT, v STRING)")
    sql(s"INSERT INTO gsql.$t VALUES (1, 'a'), (2, 'b')")
    sql(s"TRUNCATE TABLE gsql.$t")
    val after = sql(s"SELECT * FROM gsql.$t")
    assert(after.columns.toSeq == Seq("id", "v") && after.count() == 0)
    // appends keep working post-truncate
    sql(s"INSERT INTO gsql.$t VALUES (3, 'c')")
    assert(sql(s"SELECT * FROM gsql.$t").collect()(0).getLong(0) == 3L)
  }

  test("DELETE FROM keeps strict bounds exact while pruning on the hull") {
    val t = fresh()
    sql(s"CREATE TABLE gsql.$t (id BIGINT, v STRING) TBLPROPERTIES (stats_by='id')")
    sql(s"INSERT INTO gsql.$t VALUES (1,'a'),(5,'b'),(6,'c'),(9,'d')")
    sql(s"DELETE FROM gsql.$t WHERE id > 5") // strict: 5 must SURVIVE
    assert(sql(s"SELECT id FROM gsql.$t ORDER BY id").collect()
      .map(_.getLong(0)).toSeq == Seq(1L, 5L))
    sql(s"DELETE FROM gsql.$t WHERE id >= 1 AND id < 5")
    assert(sql(s"SELECT id FROM gsql.$t").collect().map(_.getLong(0)).toSeq == Seq(5L))
    // multi-column predicates route through the DML rule's general
    // copy-on-write path (SnapshotDmlSpec covers it in depth)
    sql(s"DELETE FROM gsql.$t WHERE id > 0 AND v = 'b'")
    assert(sql(s"SELECT count(*) AS c FROM gsql.$t").head.getLong(0) == 0L)
  }

  test("SELECT over pending merge-on-read deletes applies them (filter preserved)") {
    val t = fresh()
    import spark.implicits._
    val dir = s"$warehouse/$t"
    ST.append(spark, (0L until 20L).map(i => (i, s"v$i")).toDF("id", "v"), dir,
      statsBy = Seq("id"))
    ST.deleteKeys(spark, dir, Seq(3L, 7L).toDF("id"), "id")
    val got = sql(s"SELECT id FROM gsql.$t WHERE id < 10 ORDER BY id").collect()
      .map(_.getLong(0)).toSeq
    assert(got == Seq(0L, 1L, 2L, 4L, 5L, 6L, 8L, 9L))
    // MOR state declines the manifest count (physical != net)
    assert(sql(s"SELECT count(*) AS c FROM gsql.$t").collect()(0).getLong(0) == 18L)
  }

  test("time travel: VERSION AS OF id/tag/branch and TIMESTAMP AS OF") {
    val t = fresh()
    import spark.implicits._
    val dir = s"$warehouse/$t"
    ST.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val afterFirst = System.currentTimeMillis()
    Thread.sleep(20)
    ST.append(spark, Seq((2L, "b")).toDF("id", "v"), dir)
    ST.tag(spark, dir, "v1.0", 0L)
    ST.createBranch(spark, dir, "exp", 1L)
    ST.appendToBranch(spark, Seq((99L, "z")).toDF("id", "v"), dir, "exp")
    assert(sql(s"SELECT * FROM gsql.$t VERSION AS OF 0").count() == 1)
    assert(sql(s"SELECT * FROM gsql.$t VERSION AS OF 'v1.0'").count() == 1)
    assert(sql(s"SELECT * FROM gsql.$t VERSION AS OF 'branch:exp'").count() == 3)
    // branch rows never leak to main
    assert(sql(s"SELECT * FROM gsql.$t").count() == 2)
    val ts = new java.sql.Timestamp(afterFirst).toString
    assert(sql(s"SELECT * FROM gsql.$t TIMESTAMP AS OF '$ts'").count() == 1)
    // writes to a pinned table are rejected
    intercept[Exception](
      sql(s"INSERT INTO gsql.$t VERSION AS OF 0 VALUES (7, 'q')"))
  }

  test("metadata tables: history / files / refs / branches via SQL") {
    val t = fresh()
    import spark.implicits._
    val dir = s"$warehouse/$t"
    ST.append(spark, Seq((1L, "a")).toDF("id", "v"), dir, statsBy = Seq("id"))
    ST.append(spark, Seq((2L, "b")).toDF("id", "v"), dir, statsBy = Seq("id"))
    ST.tag(spark, dir, "rel", 1L)
    ST.createBranch(spark, dir, "dev", 0L)
    val hist = sql(s"SELECT snapshot_id, operation FROM gsql.$t.history " +
      "ORDER BY snapshot_id").collect()
    assert(hist.length == 2 && hist.forall(_.getString(1) == "append"))
    assert(sql(s"SELECT * FROM gsql.$t.files").count() == 2)
    val refs = sql(s"SELECT name, snapshot_id FROM gsql.$t.refs").collect()
    assert(refs.length == 1 && refs(0).getString(0) == "rel" && refs(0).getLong(1) == 1L)
    val br = sql(s"SELECT name, fork_id, head_id FROM gsql.$t.branches").collect()
    assert(br.length == 1 && br(0).getString(0) == "dev")
    // metadata tables can be filtered/aggregated like any relation
    assert(sql(s"SELECT count(*) AS r FROM gsql.$t.files WHERE column = 'id'")
      .collect()(0).getLong(0) == 2L)
  }

  test("ALTER TABLE ADD/DROP COLUMNS: metadata-only commits, guarded shadowing") {
    val t = fresh()
    val dir = s"$warehouse/$t"
    sql(s"CREATE TABLE gsql.$t (id BIGINT, v STRING) TBLPROPERTIES (stats_by='id')")
    sql(s"INSERT INTO gsql.$t VALUES (1, 'a')")
    sql(s"ALTER TABLE gsql.$t ADD COLUMNS (score DOUBLE)")
    // existing rows surface null in the added column; inserts can fill it
    val r = sql(s"SELECT id, v, score FROM gsql.$t").collect()(0)
    assert(r.getLong(0) == 1L && r.isNullAt(2))
    sql(s"INSERT INTO gsql.$t VALUES (2, 'b', 0.5)")
    assert(sql(s"SELECT score FROM gsql.$t WHERE id = 2").head.getDouble(0) == 0.5)
    // metadata-only: the alter commit added no data dirs
    val alterM = ST.manifest(spark, dir, 2L)
    assert(alterM.operation == "alter" && alterM.added.isEmpty)
    sql(s"ALTER TABLE gsql.$t DROP COLUMN v")
    assert(sql(s"SELECT * FROM gsql.$t").columns.toSeq == Seq("id", "score"))
    // time travel still sees the dropped column
    assert(sql(s"SELECT v FROM gsql.$t VERSION AS OF 1").count() == 1L)
    // re-adding a stamped name would shadow old bytes — rejected
    intercept[Exception](sql(s"ALTER TABLE gsql.$t ADD COLUMNS (v INT)"))
    // non-mapped changes fail loudly
    intercept[Exception](sql(s"ALTER TABLE gsql.$t RENAME COLUMN score TO s2"))
    // a pending MOR delete pins its key column
    import spark.implicits._
    ST.deleteKeys(spark, dir, Seq(1L).toDF("id"), "id")
    intercept[Exception](sql(s"ALTER TABLE gsql.$t DROP COLUMN id"))
  }

  test("writeTo.overwritePartitions swaps only the restated hidden partitions") {
    import spark.implicits._
    val t = fresh()
    val dir = s"$warehouse/$t"
    val days = Seq((1L, "2026-01-01", "a"), (2L, "2026-01-01", "b"),
      (3L, "2026-01-02", "c")).toDF("id", "day", "v")
    ST.appendPartitioned(spark, days, dir, col("day"), Some("d0"),
      statsBy = Seq("day"))
    // the DSv2 path: partition transform arrives as a write option
    Seq((10L, "2026-01-01", "a2")).toDF("id", "day", "v")
      .writeTo(s"gsql.$t").option("partition_by", "day")
      .option("batch_id", "r1").overwritePartitions()
    assert(sql(s"SELECT id FROM gsql.$t ORDER BY id")
      .collect().map(_.getLong(0)).toSeq == Seq(3L, 10L))
    val m = ST.manifest(spark, dir, ST.latestId(spark, dir).get)
    assert(m.operation == "dynoverwrite" &&
      m.live.contains("snap-000000/_p=2026-01-02"))
    // replayed batch id skips through the SQL path too
    Seq((99L, "2026-01-01", "zz")).toDF("id", "day", "v")
      .writeTo(s"gsql.$t").option("partition_by", "day")
      .option("batch_id", "r1").overwritePartitions()
    assert(sql(s"SELECT count(*) AS c FROM gsql.$t").collect().head.getLong(0) == 2)
    // without the transform option it fails loudly, never a silent full overwrite
    val e = intercept[Exception] {
      Seq((5L, "2026-01-03", "x")).toDF("id", "day", "v")
        .writeTo(s"gsql.$t").overwritePartitions()
    }
    assert(e.getMessage.contains("partition_by"))
  }

  test("catalog management: SHOW TABLES, rename, drop") {
    val a = fresh()
    sql(s"CREATE TABLE gsql.$a (id BIGINT)")
    val listed = sql("SHOW TABLES IN gsql").collect().map(_.getString(1)).toSet
    assert(listed.contains(a))
    sql(s"ALTER TABLE gsql.$a RENAME TO ${a}_renamed")
    assert(sql(s"SELECT * FROM gsql.${a}_renamed").columns.toSeq == Seq("id"))
    intercept[Exception](sql(s"SELECT * FROM gsql.$a"))
    sql(s"DROP TABLE gsql.${a}_renamed")
    intercept[Exception](sql(s"SELECT * FROM gsql.${a}_renamed"))
  }

  test("streaming: readStream.table tails commits; writeStream.toTable ledgers epochs") {
    val t = fresh()
    import spark.implicits._
    val dir = s"$warehouse/$t"
    ST.append(spark, Seq((1L, "a")).toDF("id", "v"), dir)
    val ckpt = java.nio.file.Files.createTempDirectory("graft_sqlstream").toString
    val outDir = java.nio.file.Files.createTempDirectory("graft_sqlout").toString
    val q = spark.readStream.table(s"gsql.$t")
      .writeStream.format("parquet")
      .option("checkpointLocation", ckpt)
      .option("path", outDir)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination(60000)
    assert(spark.read.parquet(outDir).count() == 1)
    // streaming WRITE into the catalog table: epochs commit through the ledger
    val t2 = fresh()
    sql(s"CREATE TABLE gsql.$t2 (id BIGINT, v STRING)")
    val ckpt2 = java.nio.file.Files.createTempDirectory("graft_sqlstream2").toString
    val src = java.nio.file.Files.createTempDirectory("graft_sqlsrc").toString
    Seq((5L, "e"), (6L, "f")).toDF("id", "v").write.mode("append").parquet(src)
    val q2 = spark.readStream.schema("id BIGINT, v STRING").parquet(src)
      .writeStream.option("checkpointLocation", ckpt2)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .toTable(s"gsql.$t2")
    q2.awaitTermination(60000)
    assert(sql(s"SELECT count(*) AS c FROM gsql.$t2").collect()(0).getLong(0) == 2L)
  }
}
