package graft.queries

/** Scratch output dirs for the sink-roundtrip queries: pid-suffixed
  * (overlapping JVMs on the same sf must not clobber each other's
  * lazily-read output) AND deleted on JVM exit (a bare pid suffix
  * would leak one full export per query per process into the tmpdir —
  * every Bench/Verify/test JVM a fresh copy, nothing ever sweeping).
  * Within one JVM the path is stable, so repeated invocations
  * overwrite in place exactly like the pre-pid behavior.
  */
object SinkScratch {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }

  /** A per-(query, dataset, JVM) scratch dir path, swept at exit. */
  def dir(query: String, sfDir: String): String = {
    val path = s"${sys.props("java.io.tmpdir")}/graft_${query}_" +
      s"${sfDir.hashCode.toHexString}_${ProcessHandle.current().pid()}"
    if (registered.add(path))
      Runtime.getRuntime.addShutdownHook(
        new Thread(() => deleteRecursively(new java.io.File(path))))
    path
  }
}
