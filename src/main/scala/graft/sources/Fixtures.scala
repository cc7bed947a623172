package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

/** Deterministic calls-for-service file fixtures (CSV + JSON lines).
  *
  * The reference's first act is loading a calls CSV with an explicit
  * dtype map (`app.py:53-87`) and ingesting API JSON (`app.py:171-183`).
  * The driver testdata is parquet-only, so the file-format surface is
  * exercised against these generated fixtures: content is pure
  * arithmetic in the row index — including malformed cells at known
  * positions (bad ints, empty floats, missing JSON keys) to prove
  * coerce-to-null semantics — and both engines read the SAME file, so
  * the DuckDB oracle only has to mirror the cast logic, not the data.
  *
  * Written once per JVM under `/tmp/graft_fixtures` (a fixed absolute
  * path: the oracle SQL must name it statically).
  */
object Fixtures {

  val Dir = "/tmp/graft_fixtures"
  val CsvPath = s"$Dir/calls.csv"
  val JsonPath = s"$Dir/calls.jsonl"
  val Rows = 240

  val Columns: Seq[String] =
    Seq("event_number", "create_time_incident", "incident_type_desc", "priority", "latitude_x", "longitude_x", "district")

  private val IncidentTypes =
    // one value carries a comma to exercise CSV quoting on both readers
    Array("DIRECTED PATROL", "THEFT, PETTY", "WELLNESS CHECK", "NOISE COMPLAINT", "TRAFFIC STOP")

  /** Row i as raw string cells; None = absent (empty CSV cell / missing
    * JSON key). `priority` is the string "N/A" every 13th row (coerces
    * to null int); `latitude_x` is absent every 17th row.
    */
  private def cells(i: Int): Seq[Option[String]] = Seq(
    Some(f"CFS$i%06d"),
    Some(f"2019-${1 + i % 12}%02d-${1 + i % 28}%02d ${i % 24}%02d:${(i * 7) % 60}%02d:00"),
    Some(IncidentTypes(i % IncidentTypes.length)),
    Some(if (i % 13 == 0) "N/A" else (1 + i % 5).toString),
    if (i % 17 == 0) None else Some(f"39.${1000 + (i * 37) % 9000}%04d"),
    Some(f"-84.${1000 + (i * 53) % 9000}%04d"),
    Some((1 + i % 5).toString)
  )

  private def csvCell(v: Option[String]): String =
    v.fold("")(s => if (s.contains(",")) "\"" + s + "\"" else s)

  private def jsonField(name: String, v: Option[String]): Option[String] =
    v.map(s => "\"" + name + "\": \"" + s + "\"")

  /** Write both fixtures unless the on-disk bytes already equal the
    * generated content — comparing CONTENT (not mere existence) means a
    * code change to the generator can never serve stale files, while
    * repeat calls skip the write. Writes go to a temp file then
    * ATOMIC_MOVE into place — a reader in another process can never
    * observe a truncated fixture.
    */
  def materialize(): Unit = synchronized {
    val dir = Paths.get(Dir)
    Files.createDirectories(dir)
    val csv = (Columns.mkString(",") +: (0 until Rows).map(i => cells(i).map(csvCell).mkString(","))).mkString("", "\n", "\n")
    val json = (0 until Rows)
      .map(i => Columns.zip(cells(i)).flatMap { case (n, v) => jsonField(n, v) }.mkString("{", ", ", "}"))
      .mkString("", "\n", "\n")
    writeUnlessCurrent(CsvPath, csv)
    writeUnlessCurrent(JsonPath, json)
  }

  private def writeUnlessCurrent(path: String, content: String): Unit = {
    val bytes = content.getBytes(StandardCharsets.UTF_8)
    val p = Paths.get(path)
    if (Files.exists(p) && java.util.Arrays.equals(Files.readAllBytes(p), bytes)) return
    val tmp = Files.createTempFile(Paths.get(Dir), ".tmp-", "")
    Files.write(tmp, bytes)
    Files.move(tmp, p, java.nio.file.StandardCopyOption.ATOMIC_MOVE, java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
