package graft.streaming

/** Content-signature helper for staged /tmp landing dirs.
  *
  * Several harnesses stage a derived copy of a fixture (a sentinel row,
  * a doubled delivery) under /tmp, keyed by the fixture path and made
  * permanent by a `_READY` marker. Keying by PATH alone is a staleness
  * hazard: regenerate the fixture in place (new timestamps, new rows)
  * and the stale staged copy is silently reused — e.g. a sentinel that
  * no longer exceeds max event time quietly degrades outer emission.
  * Folding the fixture's (size, mtime) into the key makes regeneration
  * produce a NEW staging dir, so `_READY` only ever blesses a copy
  * derived from the bytes it was built from.
  */
object FixtureStaging {

  /** Deterministic signature of a fixture file or directory: total size
    * and max mtime over the file (or the directory's direct children —
    * parquet dirs change their part files on rewrite). */
  def sig(path: String): String = {
    val f = new java.io.File(path)
    val files =
      if (f.isDirectory) Option(f.listFiles()).getOrElse(Array.empty)
      else Array(f)
    val size = files.map(_.length()).sum
    val mtime = if (files.isEmpty) 0L else files.map(_.lastModified()).max
    s"$size:$mtime"
  }

  /** 8-char staging key from a namespace tag, the fixture path, and the
    * fixture's content signature. */
  def key(tag: String, fixturePath: String): String =
    java.util.UUID
      .nameUUIDFromBytes(s"$tag:$fixturePath:${sig(fixturePath)}".getBytes)
      .toString.take(8)

  private val stagedDirs =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** The staged-dir protocol, single-sourced (it was copy-pasted at
    * three sites before): per (fixture signature, process) scratch dir,
    * half-staged dirs (no `_READY`) rebuilt instead of silently
    * accepted, `_READY` created only after `build` completes, the dir
    * deleted on JVM exit (per-pid scratch must not accumulate across
    * runs), and intra-JVM reuse through one map. Returns the dir. */
  def stageOnce(tag: String, fixturePath: String, dirPrefix: String)
      (build: java.nio.file.Path => Unit): String = {
    import java.nio.file.{Files, Paths}
    val k = key(tag, fixturePath)
    val pid = ProcessHandle.current().pid()
    stagedDirs.computeIfAbsent(s"$tag|$fixturePath|$dirPrefix", { _ =>
      val d = Paths.get(s"$dirPrefix-$k-p$pid")
      val ready = d.resolve("_READY")
      if (Files.exists(d) && !Files.exists(ready))
        org.apache.commons.io.FileUtils.deleteDirectory(d.toFile)
      if (!Files.exists(ready)) {
        Files.createDirectories(d)
        build(d)
        Files.createFile(ready)
      }
      deleteOnExit(d.toString)
      d.toString
    })
  }

  /** Symlink a parquet fixture into `into` for the file-stream source:
    * a single fixture FILE links as `name`; a Spark DIRECTORY write
    * links each part file (name-prefixed so two fixtures staged into
    * one landing stay distinct). The single-file-only form silently
    * produced an EMPTY stream on ScaleGen fixtures (directory writes):
    * the source does not follow a symlinked directory, so every
    * streaming monitor read zero rows at 10× while its batch twin
    * read the fixture fine. */
  def linkParquet(into: java.nio.file.Path, name: String,
      fixture: String): Unit = {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val src = Paths.get(fixture)
    if (Files.isDirectory(src))
      Files.list(src).iterator().asScala.toSeq
        .filter(_.getFileName.toString.endsWith(".parquet"))
        .foreach(p => Files.createSymbolicLink(
          into.resolve(s"$name-${p.getFileName}"), p))
    else Files.createSymbolicLink(into.resolve(name), src)
  }

  /** Stage a symlink landing dir over parquet fixtures (each
    * (linkName, fixturePath)), content-sig-keyed via [[stageOnce]] so
    * regenerating a fixture in place yields a NEW landing — the
    * path-only keys the call sites used before this existed kept
    * dangling part-file links across regenerations. */
  def linkLanding(tag: String, prefix: String,
      fixtures: (String, String)*): String =
    stageOnce(tag, fixtures.head._2, prefix) { d =>
      fixtures.foreach { case (name, path) => linkParquet(d, name, path) }
    }

  /** Best-effort removal of a scratch dir when the JVM exits. */
  def deleteOnExit(path: String): Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() =>
      org.apache.commons.io.FileUtils
        .deleteQuietly(new java.io.File(path)): Unit))
}
