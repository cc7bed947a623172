package graft.sources

import graft.SparkSpec

/** CHECK constraints on the manifest catalog — versioned table
  * metadata riding the schema-evolution channel, enforced at write
  * time by Spark's own `CheckInvariant` machinery: the DSv2 path
  * through `ResolveTableConstraints` (the table serves
  * `constraints()`), the V1 partitioned path through the same
  * expression planted by the write builder. ADD CONSTRAINT validates
  * existing rows (Spark's AddCheckConstraintExec scan); a violating
  * INSERT refuses without publishing a commit.
  */
class ConstraintsSpec extends SparkSpec {

  private def useCatalog(): Unit =
    spark.conf.set("spark.sql.catalog.graft_mfst", classOf[ManifestCatalog].getName)

  test("ADD CONSTRAINT enforces on subsequent INSERTs; violation publishes nothing") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.ck1")
    spark.sql("CREATE TABLE graft_mfst.db.ck1 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO graft_mfst.db.ck1 VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graft_mfst.db.ck1 ADD CONSTRAINT cents_pos CHECK (cents >= 0)")
    val dir = s"${ManifestCatalog.defaultWarehouse}/db/ck1"
    val headBefore = DurableManifestLog.open(dir).head()
    val e = intercept[Exception](
      spark.sql("INSERT INTO graft_mfst.db.ck1 VALUES (3, -5)"))
    val msg = Option(e.getMessage).getOrElse("") + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.toLowerCase.contains("cents_pos") || msg.toLowerCase.contains("check"), msg)
    // the failed write left NO commit and NO rows
    assert(DurableManifestLog.open(dir).head() === headBefore)
    assert(spark.table("graft_mfst.db.ck1").count() === 2L)
    // a conforming insert still lands
    spark.sql("INSERT INTO graft_mfst.db.ck1 VALUES (3, 30)")
    assert(spark.table("graft_mfst.db.ck1").count() === 3L)
  }

  test("ADD CONSTRAINT validates EXISTING rows and refuses when violated") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.ck2")
    spark.sql("CREATE TABLE graft_mfst.db.ck2 (k BIGINT)")
    spark.sql("INSERT INTO graft_mfst.db.ck2 VALUES (1), (-2)")
    assertThrows[Exception](
      spark.sql("ALTER TABLE graft_mfst.db.ck2 ADD CONSTRAINT k_pos CHECK (k > 0)"))
    // the refused ALTER left no constraint behind
    spark.sql("INSERT INTO graft_mfst.db.ck2 VALUES (-3)")
    assert(spark.table("graft_mfst.db.ck2").count() === 3L)
  }

  test("the V1 partitioned write path enforces the same constraint") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.ck3")
    spark.sql("CREATE TABLE graft_mfst.db.ck3 (k BIGINT, cents BIGINT, p BIGINT) PARTITIONED BY (p)")
    spark.sql("ALTER TABLE graft_mfst.db.ck3 ADD CONSTRAINT cents_pos CHECK (cents >= 0)")
    spark.sql("INSERT INTO graft_mfst.db.ck3 VALUES (1, 10, 0), (2, 20, 1)")
    assertThrows[Exception](
      spark.sql("INSERT INTO graft_mfst.db.ck3 VALUES (3, -1, 0)"))
    assert(spark.table("graft_mfst.db.ck3").count() === 2L)
  }

  test("row-level writes enforce too: an UPDATE/MERGE that would violate refuses") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.ck6")
    spark.sql("CREATE TABLE graft_mfst.db.ck6 (k BIGINT, cents BIGINT)")
    spark.sql("INSERT INTO graft_mfst.db.ck6 VALUES (1, 10), (2, 20)")
    spark.sql("ALTER TABLE graft_mfst.db.ck6 ADD CONSTRAINT cpos CHECK (cents >= 0)")
    assertThrows[Exception](
      spark.sql("UPDATE graft_mfst.db.ck6 SET cents = -5 WHERE k = 1"))
    assertThrows[Exception](
      spark.sql(
        "MERGE INTO graft_mfst.db.ck6 t USING (SELECT 2 AS k, -7 AS cents) s ON t.k = s.k " +
          "WHEN MATCHED THEN UPDATE SET t.cents = s.cents"))
    // both refusals left the table untouched
    val got = spark.sql("SELECT k, cents FROM graft_mfst.db.ck6 ORDER BY k").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(got === Seq((1L, 10L), (2L, 20L)))
    // a conforming row-level write still lands
    spark.sql("UPDATE graft_mfst.db.ck6 SET cents = 99 WHERE k = 1")
    assert(spark.sql("SELECT cents FROM graft_mfst.db.ck6 WHERE k = 1").collect()(0).getLong(0) === 99L)
  }

  test("DROP CONSTRAINT lifts enforcement; constraints version and time-travel") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.ck4")
    spark.sql("CREATE TABLE graft_mfst.db.ck4 (k BIGINT)")
    spark.sql("ALTER TABLE graft_mfst.db.ck4 ADD CONSTRAINT k_pos CHECK (k > 0)") // v1
    spark.sql("INSERT INTO graft_mfst.db.ck4 VALUES (1)") // v2
    spark.sql("ALTER TABLE graft_mfst.db.ck4 DROP CONSTRAINT k_pos") // v3
    spark.sql("INSERT INTO graft_mfst.db.ck4 VALUES (-9)") // v4: now legal
    assert(spark.table("graft_mfst.db.ck4").count() === 2L)
    // constraints are VERSIONED metadata: the pinned v2 table still
    // carries it; the head carries none
    val cat = spark.sessionState.catalogManager
      .catalog("graft_mfst").asInstanceOf[ManifestCatalog]
    val ident = org.apache.spark.sql.connector.catalog.Identifier.of(Array("db"), "ck4")
    assert(cat.loadTable(ident, "2").constraints().length === 1)
    assert(cat.loadTable(ident).constraints().isEmpty)
    // dropping a missing constraint refuses (IF EXISTS tolerates)
    assertThrows[Exception](spark.sql("ALTER TABLE graft_mfst.db.ck4 DROP CONSTRAINT nope"))
    spark.sql("ALTER TABLE graft_mfst.db.ck4 DROP CONSTRAINT IF EXISTS nope")
  }

  test("db.t.constraints lists the in-force contract; empty after DROP") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.ck7")
    spark.sql("CREATE TABLE graft_mfst.db.ck7 (k BIGINT)")
    spark.sql("ALTER TABLE graft_mfst.db.ck7 ADD CONSTRAINT k_pos CHECK (k > 0)")
    spark.sql("ALTER TABLE graft_mfst.db.ck7 ADD CONSTRAINT k_small CHECK (k < 1000)")
    val got = spark.read.table("graft_mfst.db.ck7.constraints").collect()
      .map(r => (r.getString(0), r.getString(1), r.getBoolean(2))).toSeq
    assert(got === Seq(("k_pos", "k > 0", true), ("k_small", "k < 1000", true)))
    spark.sql("ALTER TABLE graft_mfst.db.ck7 DROP CONSTRAINT k_pos")
    assert(spark.read.table("graft_mfst.db.ck7.constraints").count() === 1L)
  }

  test("RENAME/DROP COLUMN referenced by a constraint refuses; literals do not false-positive") {
    useCatalog()
    spark.sql("DROP TABLE IF EXISTS graft_mfst.db.ck5")
    spark.sql("CREATE TABLE graft_mfst.db.ck5 (k BIGINT, note STRING) TBLPROPERTIES ('column_mapping'='name')")
    spark.sql("ALTER TABLE graft_mfst.db.ck5 ADD CONSTRAINT k_pos CHECK (k > 0)")
    assertThrows[Exception](spark.sql("ALTER TABLE graft_mfst.db.ck5 RENAME COLUMN k TO kk"))
    assertThrows[Exception](spark.sql("ALTER TABLE graft_mfst.db.ck5 DROP COLUMN k"))
    // 'note' is only named inside a string literal of the predicate —
    // the reference check parses, it does not substring-match. (The
    // literal must not make the predicate constant-foldable: Spark's
    // AddCheckConstraint strategy cannot plan a validation scan the
    // optimizer folded away.)
    spark.sql("ALTER TABLE graft_mfst.db.ck5 ADD CONSTRAINT lit CHECK (CAST(k AS STRING) != 'note')")
    spark.sql("ALTER TABLE graft_mfst.db.ck5 RENAME COLUMN note TO comment_text")
    spark.sql("ALTER TABLE graft_mfst.db.ck5 DROP COLUMN comment_text")
  }
}
