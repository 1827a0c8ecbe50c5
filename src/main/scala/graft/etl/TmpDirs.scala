package graft.etl

/** Per-JVM-unique scratch space for the sink round-trip queries.
  *
  * Paths are stable WITHIN a JVM (a warm-up and a timed bench run of the
  * same query overwrite one directory instead of accumulating) but unique
  * ACROSS JVMs, so a Bench and a Verify running concurrently on the same
  * sf-dir can't race on each other's output.
  */
object TmpDirs {
  private lazy val base: String = {
    val d = new java.io.File(
      sys.props.getOrElse("java.io.tmpdir", "/tmp"),
      s"graft-${ProcessHandle.current().pid()}")
    d.mkdirs()
    d.getAbsolutePath
  }

  def dir(tag: String): String = s"$base/$tag"
}
