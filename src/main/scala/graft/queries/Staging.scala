package graft.queries

/** Process-scoped staging directories for round-trip query entries.
  *
  * Paths are keyed on (kind, md5 of the source dir, pid): two scale
  * factors never collide, and two concurrent driver processes (e.g.
  * Verify and Bench) never race one directory with
  * overwrite-while-scanning. The pid suffix means no later process
  * ever reuses a dir — so every registered path is deleted on JVM
  * exit, or /tmp would accumulate a full table export per run.
  */
private[queries] object Staging {

  private val created =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  sys.addShutdownHook {
    created.forEach(p => deleteRecursively(new java.io.File(p)))
  }

  // self-healing sweep: a SIGKILL'd driver never runs its shutdown
  // hook, so whenever any graft driver starts, prune staging dirs
  // whose owning process is no longer alive (the pid suffix makes
  // ownership checkable). Worst case a recycled pid keeps a dir one
  // round longer — it is re-swept next start.
  locally {
    val pidSuffix = ".*_([0-9]+)$".r
    val tmp = new java.io.File(System.getProperty("java.io.tmpdir"))
    val candidates = tmp.listFiles((_, n) =>
      n.startsWith("graft_staging_") || n.startsWith("graft_stream_json_"))
    if (candidates != null) candidates.foreach { f =>
      f.getName match {
        case pidSuffix(pid) =>
          val alive = ProcessHandle.of(pid.toLong)
            .map[Boolean](_.isAlive).orElse(false)
          if (!alive) deleteRecursively(f)
        case _ => // pre-pid legacy name: no owner, safe to prune
          deleteRecursively(f)
      }
    }
  }

  def path(kind: String, dir: String): String =
    register(s"${System.getProperty("java.io.tmpdir")}/graft_staging_" +
      s"${kind}_${md5Hex(dir)}_${ProcessHandle.current().pid()}")

  /** Track an externally-built staging path for exit-time cleanup. */
  def register(p: String): String = { created.add(p); p }

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
    ()
  }
}
