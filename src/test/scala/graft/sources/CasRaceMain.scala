package graft.sources

/** Subprocess entry point for the cross-PROCESS createExclusive race
  * (see GraftFsCrossProcessSpec): two real JVMs hammer the same entry
  * names through [[GraftFs.createExclusive]]; the JVM-wide gate that
  * serializes same-process racers is useless here, so the test
  * exercises the storage CAS itself. Under the pre-fix protocol
  * (publish via `FileSystem.rename`, which on a local FS delegates to
  * rename(2) and silently REPLACES the destination) both processes can
  * "win" the same entry and one acknowledged payload is overwritten —
  * detected below as winner-count > 1 for an entry, or a final file
  * whose bytes match neither claimed winner.
  *
  * Args: dir, processId, entryCount. Prints one line per WON entry:
  * `won <i>`. Both processes spin on a `go` file so attempts overlap.
  */
object CasRaceMain {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val id = args(1)
    val n = args(2).toInt
    val go = new java.io.File(dir, "go")
    while (!go.exists()) Thread.onSpinWait()
    var i = 0
    while (i < n) {
      val payload = s"""{"winner":"$id","entry":$i,"pad":"${"x" * 64}","eof":true}"""
      val won = GraftFs.createExclusive(s"$dir/entry-$i.json", payload.getBytes("UTF-8"))
      if (won) println(s"won $i")
      i += 1
    }
  }
}
