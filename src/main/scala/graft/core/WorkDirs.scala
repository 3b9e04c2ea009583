package graft.core

/** Local scratch roots for the maintained-store gate queries (q167–q180
  * and the ScaleBench variants): each run rebuilds its store under
  * `<root>/target/stream_gate/<name>` from a fresh directory.
  *
  * The root derives from the process environment — `graft.work.dir`
  * system property when set, else the JVM working directory — so the
  * declared queries run from ANY checkout, not one hardcoded absolute
  * path (sbt sets user.dir to the project root, which is where a
  * `target/` scratch dir belongs).
  */
object WorkDirs {

  def root: String =
    sys.props.get("graft.work.dir")
      .orElse(sys.props.get("user.dir"))
      .getOrElse(".")

  /** Scratch dir for one named maintained store. */
  def streamGate(name: String): String = s"$root/target/stream_gate/$name"

  private val built =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Memoized fresh build of one maintained store: the FIRST call per
    * (store name, JVM) deletes the scratch dir and runs `build`; later
    * calls reuse the store. Builds are deterministic per sf dir (the
    * name embeds it), so reuse never changes a query's answer — the
    * seam exists so Bench can time fold machinery (store build)
    * separately from the read the query actually answers with. */
  def ensureStore(name: String)(build: String => Unit): String =
    built.computeIfAbsent(streamGate(name), { wh =>
      deleteDir(wh); build(wh); wh
    })

  /** Recursive local delete — the fresh-store guarantee before a gate
    * query rebuilds its store. Local-FS only by design: these are
    * driver-local scratch dirs, never warehouse data. */
  def deleteDir(path: String): Unit = {
    def rec(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rec))
      f.delete(): Unit
    }
    rec(new java.io.File(path))
  }
}
