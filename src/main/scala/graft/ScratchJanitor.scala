package graft

/** Best-effort JVM-exit cleanup for heavyweight scratch directories
  * (full-table materializations under java.io.tmpdir). Registered
  * paths are deleted recursively in a shutdown hook — bounding
  * cross-run tmp accumulation to JVMs that died hard. Deliberately
  * NOT used for the small derived-table memos: those are cheap, and
  * deleting them early would break constructed plans that still read
  * them; a shutdown hook runs strictly after the last query. */
object ScratchJanitor {
  private val dirs =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      dirs.forEach { d =>
        try deleteRecursively(new java.io.File(d))
        catch { case _: Throwable => () } // exit path: never throw
      }, "graft-scratch-janitor"))

  def register(path: String): Unit = {
    hookInstalled
    dirs.add(path)
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    val children = f.listFiles()
    if (children != null) children.foreach(deleteRecursively)
    f.delete()
  }
}
