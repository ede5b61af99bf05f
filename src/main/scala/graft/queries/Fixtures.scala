package graft.queries

/** Query-local fixture directories: built once per (tag, key), cached
  * for the session, recursively deleted by a shutdown hook. `build`
  * receives the fresh root and returns the path the cache hands out
  * (usually a subdirectory it wrote) — the single implementation of the
  * temp-dir/cleanup shape every fixture-building query shares.
  */
private[queries] object Fixtures {

  private val dirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]
  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]

  // NOT computeIfAbsent-with-build: one fixture's build may request
  // another fixture (e.g. the streaming-agg table drains the two-batch
  // events dir), and nested computeIfAbsent on one map throws
  // "Recursive update" whenever the keys share a bin. Per-key locks
  // keep builds exclusive while letting them nest (the dependency
  // graph is acyclic, so no deadlock).
  def cached(tag: String, key: String)(
      build: java.io.File => String): String = {
    val k = s"$tag#$key"
    val hit = dirs.get(k)
    if (hit != null) return hit
    val lock = locks.computeIfAbsent(k, _ => new Object)
    lock.synchronized {
      val again = dirs.get(k)
      if (again != null) again
      else {
        val root = java.nio.file.Files
          .createTempDirectory(s"graft-$tag").toFile
        Runtime.getRuntime.addShutdownHook(new Thread(() => {
          def rm(f: java.io.File): Unit = {
            Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
            f.delete(); ()
          }
          rm(root)
        }))
        val v = build(root)
        dirs.put(k, v)
        v
      }
    }
  }
}
