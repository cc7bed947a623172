package graft.operators

/** Space-filling-curve index arithmetic as SHARED SQL TEXT: the same
  * generated integer expressions parse in Spark SQL (via `expr`) and
  * in DuckDB, so engine and oracle cannot drift — the strongest
  * parity there is. Pure CASE / AND / multiply arithmetic only: no
  * `^` (DuckDB's `^` is POWER), no shifts on the hot path.
  *
  * The Hilbert curve is the locality upgrade over the Morton/z-order
  * curve q363 prices: z-order has "seams" where one bit flip jumps
  * across the grid, Hilbert is CONTINUOUS — consecutive indices are
  * always grid-adjacent (spec-proven), which is why its file cells
  * track a 2-D box with fewer false-positive files.
  */
object SpaceFill {

  /** One unrolled level of the classic xy→d walk on a 2^order grid
    * (s = the level's half-width): returns (xNext, yNext, dTerm) SQL
    * over the caller-named current (x, y). The XOR in the textbook
    * `d += s²·((3·rx) ^ ry)` is replaced by its {0,1}-truth-table
    * polynomial 3·rx + ry − 2·rx·ry, exact for bits and portable.
    */
  def hilbertStep(s: Int, x: String, y: String): (String, String, String) = {
    val rx = s"(CASE WHEN ($x & $s) > 0 THEN 1 ELSE 0 END)"
    val ry = s"(CASE WHEN ($y & $s) > 0 THEN 1 ELSE 0 END)"
    val dTerm = s"(${s.toLong * s} * (3 * $rx + $ry - 2 * $rx * $ry))"
    // rotation: quadrants 0/3 (ry = 0) reflect-and-swap the frame
    val nx = s"(CASE WHEN $ry = 1 THEN $x WHEN $rx = 1 THEN ${s - 1} - $y ELSE $y END)"
    val ny = s"(CASE WHEN $ry = 1 THEN $y WHEN $rx = 1 THEN ${s - 1} - $x ELSE $x END)"
    (nx, ny, dTerm)
  }

  /** The level half-widths for a 2^order × 2^order grid, outermost
    * first — the iteration order both the SQL chain and [[hilbertD]]
    * walk.
    */
  def levels(order: Int): Seq[Int] = (order - 1 to 0 by -1).map(1 << _)

  /** Driver-side reference implementation — the spec's ground truth
    * for bijectivity and adjacency of the generated SQL.
    */
  def hilbertD(order: Int, x0: Long, y0: Long): Long = {
    var (x, y, d) = (x0, y0, 0L)
    levels(order).foreach { s =>
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s.toLong * s * (3 * rx + ry - 2 * rx * ry)
      if (ry == 0) {
        val (ox, oy) = (x, y)
        if (rx == 1) { x = s - 1 - oy; y = s - 1 - ox }
        else { x = oy; y = ox }
      }
    }
    d
  }
}
