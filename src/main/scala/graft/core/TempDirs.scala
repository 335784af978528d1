package graft.core

/** JVM-exit cleanup for per-application fixture directories.
  *
  * The i08/mm05 round-trip queries write under a path that embeds the
  * Spark applicationId (two JVMs benching the same data dir must not
  * race on overwrite-then-read-back), which means no later JVM ever
  * reuses — or removes — the directory: every bench/verify run would
  * otherwise leave a fresh `target/mm_shards_*` / `fixtures_frag_*`
  * tree behind, accumulating without bound across rounds.
  *
  * Deletion can't happen eagerly (the query's read-back DataFrame is
  * lazy — consumers may re-scan the directory any time during the
  * session), so registered paths are removed by a single shutdown
  * hook. Registration is idempotent per path.
  */
object TempDirs {

  private val paths =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hook: Unit = {
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      paths.forEach { p =>
        try deleteRecursively(new java.io.File(p))
        catch { case _: Throwable => () }
      }
    }, "graft-tempdir-cleanup"))
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) {
      val children = f.listFiles()
      if (children != null) children.foreach(deleteRecursively)
    }
    f.delete()
    ()
  }

  /** Register `path` for deletion at JVM exit; returns it unchanged so
    * call sites stay one expression. The REGISTERED form is the
    * absolute path resolved NOW — the shutdown hook runs against the
    * JVM's exit-time working directory, so a relative registration
    * ('target/...') from a consumer that changes cwd mid-process would
    * leak the intended tree or delete an unrelated one. */
  def cleanupOnExit(path: String): String = {
    hook
    paths.add(new java.io.File(path).getAbsolutePath)
    path
  }
}
