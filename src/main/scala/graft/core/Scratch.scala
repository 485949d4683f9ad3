package graft.core

/** Process-lifetime scratch directories for the persisted-index queries
  * (MinHash/BM25/IVFADC save→probe chains run by Verify/Bench).
  *
  * Keyed by data dir AND process id, so (a) repeated invocations in one
  * process (bench warmup + timed passes) reuse one directory instead of
  * accumulating copies, and (b) two concurrent harness processes — whose
  * index saves are non-atomic (postings, sigs, meta written sequentially)
  * — can never interleave writes into each other's index and produce
  * silently wrong rows.
  *
  * Lifecycle: a JVM shutdown hook deletes THIS process's directories
  * (registered once, on first use), and first use also reaps any
  * leftover `graft_mh_idx_*_<pid>` whose owning pid is no longer alive
  * (a kill -9 skips shutdown hooks; the next harness run sweeps the
  * orphan). Live pids are never touched — the pid keying that prevents
  * write interleaving also makes the reap safe. */
object Scratch {

  private val prefix = "graft_mh_idx_"

  private def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteRecursively))
    f.delete(); ()
  }

  private lazy val cleanupOnce: Unit = {
    val tmp = new java.io.File(sys.props("java.io.tmpdir"))
    val self = ProcessHandle.current().pid()
    Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
      val name = f.getName
      if (f.isDirectory && name.startsWith(prefix)) {
        val pid = name.substring(name.lastIndexOf('_') + 1)
        val dead = pid.forall(_.isDigit) && pid.nonEmpty && pid.toLong != self &&
          !ProcessHandle.of(pid.toLong).map[Boolean](_.isAlive).orElse(false)
        if (dead) deleteRecursively(f)
      }
    }
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      Option(tmp.listFiles()).getOrElse(Array.empty).foreach { f =>
        if (f.isDirectory && f.getName.startsWith(prefix) &&
            f.getName.endsWith(s"_$self"))
          deleteRecursively(f)
      }))
    ()
  }

  /** A scratch directory unique to (data dir, tag, this process). */
  def dir(dataDir: String, tag: String): String = {
    cleanupOnce
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(dataDir.getBytes("UTF-8")).take(4).map("%02x".format(_)).mkString
    new java.io.File(sys.props("java.io.tmpdir"),
      s"$prefix$key${tag}_${ProcessHandle.current().pid()}").toString
  }
}
