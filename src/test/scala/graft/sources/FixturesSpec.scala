package graft.sources

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** File fixtures for the CSV/JSON oracle queries: deterministic,
  * idempotent, and the two encodings carry the same logical rows.
  */
class FixturesSpec extends SparkSpec {

  test("materialize is idempotent and deterministic") {
    Fixtures.materialize()
    val first = Files.readAllBytes(Paths.get(Fixtures.CsvPath))
    Fixtures.materialize()
    assert(Files.readAllBytes(Paths.get(Fixtures.CsvPath)).sameElements(first))
    assert(new String(first, "UTF-8").linesIterator.size === Fixtures.Rows + 1) // + header
  }

  test("CSV and JSON fixtures parse to identical rows") {
    val csv = graft.Queries.csvIngest(spark, sfDir).collect()
    val json = graft.Queries.jsonIngest(spark, sfDir).collect()
    assert(csv.length === Fixtures.Rows)
    assert(csv.toSeq === json.toSeq)
  }

  test("malformed cells coerce to null at known positions") {
    val rows = graft.Queries.csvIngest(spark, sfDir).collect()
    // every 13th row's priority is the string "N/A" → null int
    assert(rows.zipWithIndex.forall { case (r, i) => r.isNullAt(3) === (i % 13 == 0) })
    // every 17th row's latitude cell is empty → null double
    assert(rows.zipWithIndex.forall { case (r, i) => r.isNullAt(4) === (i % 17 == 0) })
    // the quoted comma-carrying incident type survives CSV parsing
    assert(rows.exists(_.getString(1) == "THEFT, PETTY"))
  }
}
