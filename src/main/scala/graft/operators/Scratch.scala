package graft.operators

/** Per-JVM scratch directories for gate queries whose result frames
  * lazily READ a local store written inside the query lambda (q202's
  * jsonl round trip, q139/q186's parquet index stores). The dir cannot
  * be deleted inside the lambda — the driver's hash action reads it
  * later — so lifecycle is:
  *
  *   - everything lives under ONE dedicated parent,
  *     `<java.io.tmpdir>/graft_scratch/` — the sweeper never looks at
  *     (let alone deletes) anything outside that namespace, so an
  *     unrelated `/tmp` entry that happens to match a name pattern is
  *     out of reach by construction;
  *   - the leaf is pid-suffixed (concurrent gate runs on the same
  *     dataset never race each other's overwrite, the q186 contract);
  *   - every dir handed out is registered with ONE shutdown hook that
  *     removes it at JVM exit — repeated gate runs no longer
  *     accumulate data under the tmpdir;
  *   - on each allocation, sibling dirs with the same prefix whose
  *     embedded pid is no longer alive are swept — a crashed or
  *     SIGKILL'd run's partial dirs are reclaimed by the next run
  *     instead of leaking forever. (Within the namespace a pid-reuse
  *     race between liveness check and delete can still reclaim a
  *     LIVE run's dir in theory; the window is one listFiles pass and
  *     the blast radius is our own scratch data, never foreign files.)
  */
object Scratch {
  private val registered =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Dedicated namespace root: all scratch lives here, the sweeper
    * never leaves it. */
  private[operators] def root: java.io.File =
    new java.io.File(System.getProperty("java.io.tmpdir", "/tmp"), "graft_scratch")

  private lazy val hookInstalled: Boolean = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      registered.forEach(p => deleteRecursively(new java.io.File(p)))
    }, "graft-scratch-cleanup"))
    true
  }

  /** A `<tmpdir>/graft_scratch/<prefix>_<pid>` dir path: registered for
    * exit cleanup, stale siblings swept. The caller writes with
    * overwrite semantics (same JVM reuses the same path).
    */
  def dir(prefix: String): String = {
    require(hookInstalled)
    root.mkdirs()
    sweepStale(prefix)
    val d = new java.io.File(root, s"${prefix}_${java.lang.ProcessHandle.current().pid()}")
      .getAbsolutePath
    registered.add(d)
    d
  }

  private def sweepStale(prefix: String): Unit = {
    val self = java.lang.ProcessHandle.current().pid()
    val kids = Option(root.listFiles()).getOrElse(Array.empty)
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
