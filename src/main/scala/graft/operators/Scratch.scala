package graft.operators

/** Per-JVM scratch directories for gate queries whose result frames
  * lazily READ a local store written inside the query lambda (q202's
  * jsonl round trip, q139/q186's parquet index stores). The dir cannot
  * be deleted inside the lambda — the driver's hash action reads it
  * later — so lifecycle is:
  *
  *   - the path is pid-suffixed (concurrent gate runs on the same
  *     dataset never race each other's overwrite, the q186 contract);
  *   - every dir handed out is registered with ONE shutdown hook that
  *     removes it at JVM exit — repeated gate runs no longer
  *     accumulate data under /tmp;
  *   - on each allocation, sibling dirs with the same prefix whose
  *     embedded pid is no longer alive are swept — a crashed or
  *     SIGKILL'd run's partial dirs are reclaimed by the next run
  *     instead of leaking forever.
  */
object Scratch {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => deleteRecursively(new java.io.File(p)))
    }, "graft-scratch-cleanup"))
    true
  }

  /** A `/tmp/<prefix>_<pid>` dir path: registered for exit cleanup,
    * stale siblings swept. The caller writes with overwrite semantics
    * (same JVM reuses the same path).
    */
  def dir(prefix: String): String = {
    require(hookInstalled)
    sweepStale(prefix)
    val d = s"/tmp/${prefix}_${java.lang.ProcessHandle.current().pid()}"
    registered.add(d)
    d
  }

  private def sweepStale(prefix: String): Unit = {
    val self = java.lang.ProcessHandle.current().pid()
    val kids = Option(new java.io.File("/tmp").listFiles()).getOrElse(Array.empty)
    kids.foreach { f =>
      val nm = f.getName
      if (nm.startsWith(prefix + "_")) {
        val owner = nm.substring(prefix.length + 1).toLongOption
        val ownerAlive = owner.exists(p =>
          p == self || java.lang.ProcessHandle.of(p)
            .map[java.lang.Boolean](h => h.isAlive).orElse(false))
        if (owner.isDefined && !ownerAlive) deleteRecursively(f)
      }
    }
  }

  private[operators] def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory)
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
    f.delete(): Unit
  }
}
