package graft.sources

import graft.SparkSpec

/** The DataSource V2 row-level-operation connector under q380: the
  * full SQL lifecycle (CREATE / INSERT / MERGE / UPDATE / DELETE)
  * against the scratch catalog, each statement's effect checked
  * row-for-row. MERGE exercises the op-column ReplaceData layout
  * (MergeRows prepends `__row_operation`); UPDATE and DELETE exercise
  * the bare-arity replace path — both normalize through the same
  * schema-aware writer.
  */
class ScratchCatalogSpec extends SparkSpec {

  private def rows(table: String): Seq[(Long, String, Long)] =
    spark
      .table(table)
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .toSeq

  test("MERGE INTO: delete, update and insert clauses land exactly") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec1")
    spark.sql("CREATE TABLE graft_scratch.db.spec1 (k BIGINT, st STRING, cents BIGINT)")
    spark.sql("INSERT INTO graft_scratch.db.spec1 VALUES (1, 'A', 10), (2, 'B', 20), (3, 'A', 30)")
    assert(rows("graft_scratch.db.spec1") === Seq((1L, "A", 10L), (2L, "B", 20L), (3L, "A", 30L)))
    spark
      .sql(
        "SELECT 2 AS k, 'B' AS st, CAST(99 AS BIGINT) AS cents, 'U' AS op " +
          "UNION ALL SELECT 3, 'A', 30, 'D' UNION ALL SELECT 4, 'C', 40, 'I'"
      )
      .createOrReplaceTempView("scratch_spec_src")
    spark.sql("""MERGE INTO graft_scratch.db.spec1 t USING scratch_spec_src s ON t.k = s.k
                |WHEN MATCHED AND s.op = 'D' THEN DELETE
                |WHEN MATCHED AND s.op = 'U' THEN UPDATE SET cents = s.cents
                |WHEN NOT MATCHED AND s.op = 'I' THEN INSERT (k, st, cents) VALUES (s.k, s.st, s.cents)
                |""".stripMargin)
    assert(rows("graft_scratch.db.spec1") === Seq((1L, "A", 10L), (2L, "B", 99L), (4L, "C", 40L)))
  }

  test("ALTER TABLE ADD COLUMN: legacy rows read NULL, new writes carry the column, backfill works") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec3")
    spark.sql("CREATE TABLE graft_scratch.db.spec3 (k BIGINT, st STRING, cents BIGINT)")
    spark.sql("INSERT INTO graft_scratch.db.spec3 VALUES (1, 'A', 10), (2, 'B', 20)")
    spark.sql("ALTER TABLE graft_scratch.db.spec3 ADD COLUMN tier STRING")
    // legacy rows predate the column: they must read back NULL
    val afterAlter = spark.table("graft_scratch.db.spec3").orderBy("k").collect()
    assert(afterAlter.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(afterAlter.forall(_.isNullAt(3)))
    // inserts after the alter carry the new arity
    spark.sql("INSERT INTO graft_scratch.db.spec3 VALUES (3, 'A', 30, 'gold')")
    // and a row-level write can backfill the legacy rows
    spark.sql("UPDATE graft_scratch.db.spec3 SET tier = 'std' WHERE k = 1")
    val rows = spark
      .table("graft_scratch.db.spec3")
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), if (r.isNullAt(3)) null else r.getString(3)))
      .toSeq
    assert(rows === Seq((1L, "std"), (2L, null), (3L, "gold")))
  }

  test("MERGE WHEN NOT MATCHED BY SOURCE: stale target rows take the BY SOURCE branch (q395)") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec4")
    spark.sql("CREATE TABLE graft_scratch.db.spec4 (k BIGINT, st STRING, cents BIGINT)")
    // k=1 matched-changed, k=2 matched-unchanged, k=3 stale 'O' (expire),
    // k=4 stale non-'O' (tombstone), k=5 arrives source-only (insert)
    spark.sql("INSERT INTO graft_scratch.db.spec4 VALUES (1, 'A', 10), (2, 'B', 20), (3, 'O', 30), (4, 'F', 40)")
    spark
      .sql(
        "SELECT 1 AS k, 'A' AS st, CAST(11 AS BIGINT) AS cents " +
          "UNION ALL SELECT 2, 'B', 20 UNION ALL SELECT 5, 'C', 50"
      )
      .createOrReplaceTempView("scratch_spec4_src")
    spark.sql("""MERGE INTO graft_scratch.db.spec4 t USING scratch_spec4_src s ON t.k = s.k
                |WHEN MATCHED AND t.cents <> s.cents THEN UPDATE SET cents = s.cents
                |WHEN NOT MATCHED THEN INSERT (k, st, cents) VALUES (s.k, s.st, s.cents)
                |WHEN NOT MATCHED BY SOURCE AND t.st = 'O' THEN DELETE
                |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET cents = -1
                |""".stripMargin)
    assert(
      rows("graft_scratch.db.spec4") ===
        Seq((1L, "A", 11L), (2L, "B", 20L), (4L, "F", -1L), (5L, "C", 50L))
    )
  }

  test("container-typed columns survive the write buffer: values are deep-copied, not referenced") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec5")
    spark.sql(
      "CREATE TABLE graft_scratch.db.spec5 " +
        "(k BIGINT, b BINARY, a ARRAY<BIGINT>, m MAP<STRING, BIGINT>, s STRUCT<x: BIGINT, y: STRING>)"
    )
    // enough rows that Spark's reused row buffers would corrupt
    // reference-held values if the writer did not copy them
    spark.sql(
      """INSERT INTO graft_scratch.db.spec5
        |SELECT id, encode(CAST(id AS STRING), 'UTF-8'), array(id, id * 2),
        |  map('v', id), named_struct('x', id, 'y', CAST(id AS STRING))
        |FROM range(0, 50)""".stripMargin
    )
    val got = spark
      .table("graft_scratch.db.spec5")
      .selectExpr("k", "decode(b, 'UTF-8') AS bs", "a[1] AS a2", "m['v'] AS mv", "s.x AS sx", "s.y AS sy")
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getString(5)))
    assert(got.length === 50)
    got.foreach { case (k, bs, a2, mv, sx, sy) =>
      assert(bs === k.toString, s"binary corrupted at k=$k")
      assert(a2 === k * 2, s"array corrupted at k=$k")
      assert(mv === k, s"map corrupted at k=$k")
      assert(sx === k && sy === k.toString, s"struct corrupted at k=$k")
    }
  }

  test("ALTER ADD COLUMN with an explicit position is refused, not silently mislaid") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec6")
    spark.sql("CREATE TABLE graft_scratch.db.spec6 (k BIGINT, st STRING)")
    val e = intercept[Exception] {
      spark.sql("ALTER TABLE graft_scratch.db.spec6 ADD COLUMN early BIGINT FIRST")
    }
    assert(e.getMessage.toLowerCase.contains("position"))
  }

  test("MERGE WITH SCHEMA EVOLUTION: a source-only column evolves the table in the same statement (q399)") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec7")
    spark.sql("CREATE TABLE graft_scratch.db.spec7 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO graft_scratch.db.spec7 VALUES (1, 10), (2, 20)")
    spark
      .sql(
        "SELECT CAST(1 AS BIGINT) AS k, CAST(11 AS BIGINT) AS cents, 'gold' AS tier " +
          "UNION ALL SELECT 3, 30, 'std'"
      )
      .createOrReplaceTempView("scratch_spec7_src")
    spark.sql("""MERGE WITH SCHEMA EVOLUTION INTO graft_scratch.db.spec7 t USING scratch_spec7_src s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET *
                |WHEN NOT MATCHED THEN INSERT *
                |""".stripMargin)
    val after = spark.table("graft_scratch.db.spec7")
    // the statement itself evolved the schema…
    assert(after.schema.map(_.name) === Seq("k", "cents", "tier"))
    // …updated/inserted rows carry the new column, the legacy row reads NULL
    val rows = after
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getString(2)))
      .toSeq
    assert(rows === Seq((1L, 11L, "gold"), (2L, 20L, null), (3L, 30L, "std")))
  }

  test("UPDATE and DELETE run through the same row-level replace") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec2")
    spark.sql("CREATE TABLE graft_scratch.db.spec2 (k BIGINT, st STRING, cents BIGINT)")
    spark.sql("INSERT INTO graft_scratch.db.spec2 VALUES (1, 'A', 10), (2, 'B', 20), (3, 'A', 30)")
    spark.sql("UPDATE graft_scratch.db.spec2 SET cents = cents + 5 WHERE st = 'A'")
    assert(rows("graft_scratch.db.spec2") === Seq((1L, "A", 15L), (2L, "B", 20L), (3L, "A", 35L)))
    spark.sql("DELETE FROM graft_scratch.db.spec2 WHERE k = 2")
    assert(rows("graft_scratch.db.spec2") === Seq((1L, "A", 15L), (3L, "A", 35L)))
  }

  // ——— OCC conflict matrix (q404): the commit protocol at the state
  // layer, where the interleavings are controllable ———

  private def occState() = {
    import org.apache.spark.sql.types._
    new ScratchCatalog.TableState(StructType(Seq(StructField("k", LongType))))
  }

  private def row(k: Long): org.apache.spark.sql.catalyst.InternalRow =
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](k))

  test("OCC: concurrent appends all land — a CAS loser re-reads and re-applies, never overwrites") {
    val state = occState()
    val threads = (0 until 4).map { t =>
      new Thread(() => (0 until 100).foreach { i =>
        state.update(s => s.copy(rows = s.rows :+ row(t * 100L + i)))
      })
    }
    threads.foreach(_.start()); threads.foreach(_.join())
    val snap = state.snapshot
    assert(snap.rows.length === 400)
    assert(snap.version === 400L) // one bump per publish: no commit vanished
    assert(snap.rows.map(_.getLong(0)).sorted.toSeq === (0L until 400L))
  }

  test("OCC: a replace anchored to a stale read version aborts loudly instead of losing the interleaved commit") {
    val state = occState()
    state.update(s => s.copy(rows = Array(row(1L))))
    val scanned = state.snapshot // the rewrite's read point
    // a concurrent append lands between scan and commit
    state.update(s => s.copy(rows = s.rows :+ row(2L)))
    val ex = intercept[java.util.ConcurrentModificationException] {
      state.replaceFrom(scanned, Array(row(10L)))
    }
    assert(ex.getMessage.contains("scanned version 1"))
    assert(ex.getMessage.contains("version 2"))
    // the interleaved commit survived: nothing was lost
    assert(state.snapshot.rows.map(_.getLong(0)).toSeq === Seq(1L, 2L))
  }

  test("OCC: a replace against the current version commits and bumps it") {
    val state = occState()
    state.update(s => s.copy(rows = Array(row(1L), row(2L))))
    val scanned = state.snapshot
    val next = state.replaceFrom(scanned, Array(row(7L)))
    assert(next.version === 2L)
    assert(state.snapshot.rows.map(_.getLong(0)).toSeq === Seq(7L))
    // and the SAME read point cannot commit twice (no double-apply)
    intercept[java.util.ConcurrentModificationException] {
      state.replaceFrom(scanned, Array(row(8L)))
    }
  }

  test("OCC: ALTER ADD COLUMN racing appends loses no rows and pads every row it saw") {
    import org.apache.spark.sql.types._
    val state = occState()
    val appender = new Thread(() => (0 until 200).foreach { i =>
      state.update(s => s.copy(rows = s.rows :+ (
        if (s.schema.length == 1) row(i.toLong)
        else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](i.toLong, null))
      )))
    })
    appender.start()
    // the alter's pad-and-swap, expressed through the same CAS loop
    // alterTable uses: a lost race re-pads against the fresh rows
    state.update { snap =>
      val rows = snap.rows.map { r =>
        new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(Array[Any](r.getLong(0), null)): org.apache.spark.sql.catalyst.InternalRow
      }
      snap.copy(schema = snap.schema.add("extra", StringType), rows = rows)
    }
    appender.join()
    val snap = state.snapshot
    assert(snap.schema.length === 2)
    assert(snap.rows.length === 200)
    assert(snap.rows.forall(_.numFields == 2)) // no row's arity disagrees with the schema
  }

  test("VERSION AS OF: every published version reads back pinned; past is read-only; missing refuses") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec_tt")
    spark.sql("CREATE TABLE graft_scratch.db.spec_tt (k BIGINT, v BIGINT)")
    spark.sql("INSERT INTO graft_scratch.db.spec_tt VALUES (1, 10), (2, 20)") // v1
    spark.sql("UPDATE graft_scratch.db.spec_tt SET v = 99 WHERE k = 1") // v2
    spark.sql("DELETE FROM graft_scratch.db.spec_tt WHERE k = 2") // v3
    def rows(v: Long): Seq[(Long, Long)] =
      spark
        .sql(s"SELECT k, v FROM graft_scratch.db.spec_tt VERSION AS OF $v ORDER BY k")
        .collect()
        .map(r => (r.getLong(0), r.getLong(1)))
        .toSeq
    assert(spark.sql("SELECT * FROM graft_scratch.db.spec_tt VERSION AS OF 0").count() === 0L)
    assert(rows(1) === Seq((1L, 10L), (2L, 20L)))
    assert(rows(2) === Seq((1L, 99L), (2L, 20L)))
    assert(rows(3) === Seq((1L, 99L)))
    // a later write does not disturb pinned reads (history immutable)
    spark.sql("INSERT INTO graft_scratch.db.spec_tt VALUES (7, 70)") // v4
    assert(rows(1) === Seq((1L, 10L), (2L, 20L)))
    // the AS-OF table exposes no write capability
    assertThrows[Exception](
      spark.sql("INSERT INTO graft_scratch.db.spec_tt VERSION AS OF 1 VALUES (9, 90)")
    )
    // and a never-published version refuses at resolution
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_scratch.db.spec_tt VERSION AS OF 42").collect()
    )
    assert(e.getMessage.contains("no version 42") || e.getMessage.contains("42"))
  }

  test("history retention: expired versions refuse AS EXPIRED, retained ones keep serving, head untouched") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec_exp")
    spark.sql("CREATE TABLE graft_scratch.db.spec_exp (k BIGINT)")
    spark.sql("INSERT INTO graft_scratch.db.spec_exp VALUES (1)") // v1
    spark.sql("INSERT INTO graft_scratch.db.spec_exp VALUES (2)") // v2
    spark.sql("INSERT INTO graft_scratch.db.spec_exp VALUES (3)") // v3
    ScratchCatalog.expireHistory("db.spec_exp", 2L)
    // expired: refuses loudly, NAMED as expired (distinct from missing)
    val e = intercept[Exception](
      spark.sql("SELECT * FROM graft_scratch.db.spec_exp VERSION AS OF 1").collect()
    )
    assert(e.getMessage.contains("EXPIRED"), e.getMessage)
    // retained versions and the head read keep serving
    assert(spark.sql("SELECT * FROM graft_scratch.db.spec_exp VERSION AS OF 2").count() === 2L)
    assert(spark.sql("SELECT * FROM graft_scratch.db.spec_exp VERSION AS OF 3").count() === 3L)
    assert(spark.table("graft_scratch.db.spec_exp").count() === 3L)
    // a never-published version still reads as missing, not expired
    val e2 = intercept[Exception](
      spark.sql("SELECT * FROM graft_scratch.db.spec_exp VERSION AS OF 42").collect()
    )
    assert(!e2.getMessage.contains("EXPIRED") && e2.getMessage.contains("42"), e2.getMessage)
    // the horizon never overtakes the head: expiring "everything"
    // retains the current snapshot
    ScratchCatalog.expireHistory("db.spec_exp", 99L)
    assert(spark.sql("SELECT * FROM graft_scratch.db.spec_exp VERSION AS OF 3").count() === 3L)
    assert(spark.table("graft_scratch.db.spec_exp").count() === 3L)
  }

  test("history retention: writes after expiration publish and time-travel normally above the horizon") {
    spark.conf.set("spark.sql.catalog.graft_scratch", classOf[ScratchCatalog].getName)
    spark.sql("DROP TABLE IF EXISTS graft_scratch.db.spec_exp2")
    spark.sql("CREATE TABLE graft_scratch.db.spec_exp2 (k BIGINT)")
    spark.sql("INSERT INTO graft_scratch.db.spec_exp2 VALUES (1)") // v1
    ScratchCatalog.expireHistory("db.spec_exp2", 1L)
    spark.sql("INSERT INTO graft_scratch.db.spec_exp2 VALUES (2)") // v2
    assert(spark.sql("SELECT * FROM graft_scratch.db.spec_exp2 VERSION AS OF 2").count() === 2L)
    assert(spark.sql("SELECT * FROM graft_scratch.db.spec_exp2 VERSION AS OF 1").count() === 1L)
  }
}
