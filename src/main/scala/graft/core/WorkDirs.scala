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
