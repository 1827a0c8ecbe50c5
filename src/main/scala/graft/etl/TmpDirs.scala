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
    // r15: prefer tmpfs (/dev/shm) when present — everything under this
    // root is ephemeral per-JVM scratch by contract (streaming
    // checkpoints for the AvailableNow twins, sink round-trips, sliced
    // fixtures), the exact state a production cluster puts on fast
    // local disks. Deleted on JVM exit either way; falls back to
    // java.io.tmpdir where shm is absent or read-only. The durable
    // kill-and-restart RECOVERY guarantees are exercised by the
    // StreamingSpec checkpoint tests, not by scratch-media choice.
    val shm = new java.io.File("/dev/shm")
    val root =
      if (shm.isDirectory && shm.canWrite) shm
      else new java.io.File(sys.props.getOrElse("java.io.tmpdir", "/tmp"))
    val d = new java.io.File(root, s"graft-${ProcessHandle.current().pid()}")
    d.mkdirs()
    // scratch is per-JVM by construction, so it is garbage the moment
    // this JVM exits — reap it then, or repeated bench/verify runs grow
    // /tmp by one warehouse per JVM forever
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteRecursively(d)))
    d.getAbsolutePath
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val kids = f.listFiles()
    if (kids != null) kids.foreach(deleteRecursively)
    f.delete(): Unit
  }

  def dir(tag: String): String = s"$base/$tag"
}
