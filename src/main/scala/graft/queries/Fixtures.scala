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

  def cached(tag: String, key: String)(
      build: java.io.File => String): String =
    dirs.computeIfAbsent(s"$tag#$key", _ => {
      val root = java.nio.file.Files
        .createTempDirectory(s"graft-$tag").toFile
      Runtime.getRuntime.addShutdownHook(new Thread(() => {
        def rm(f: java.io.File): Unit = {
          Option(f.listFiles()).getOrElse(Array.empty).foreach(rm)
          f.delete(); ()
        }
        rm(root)
      }))
      build(root)
    })
}
