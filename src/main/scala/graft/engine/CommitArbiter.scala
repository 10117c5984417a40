package graft.engine

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE primitive a snapshot/catalog commit needs from its store:
  * publish a fully-written temp file at `target` IFF nothing exists there,
  * atomically. `true` = this writer owns `target`; `false` = lost the race
  * (another committer published that version first). Everything else in the
  * commit protocol — immutable data files, immutable metadata shards,
  * optimistic retry on the refreshed head — is store-agnostic; this is the
  * seam where a deployment plugs in its store's arbitration:
  *
  *  - POSIX local: `link(2)` — fails-if-exists atomically, content already
  *    durable at publish time ([[CommitArbiter.Link]]).
  *  - HDFS-family: namenode `rename` — atomic, refuses an existing
  *    destination ([[CommitArbiter.Rename]]).
  *  - Object stores: the store's conditional-create — S3 conditional PUT
  *    (`If-None-Match: *`), GCS `ifGenerationMatch=0`, ABFS ETag
  *    preconditions. Register an arbiter wrapping the store's client;
  *    the Hadoop connector's `rename` is copy-then-delete check-then-act
  *    and MUST NOT arbitrate the flip (two racers would both "win" a
  *    version and one commit would be silently lost).
  *
  * An UNREGISTERED scheme throws loudly rather than silently degrading —
  * losing commits is worse than refusing to run. Registration is
  * process-wide (`CommitArbiter.register`), matching Hadoop's own
  * per-scheme FileSystem registry.
  */
trait CommitArbiter {

  /** Publish `tmp` (fully written, durable) at `target` iff absent,
    * atomically. false = target already exists — lost the race. */
  def commitIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean
}

object CommitArbiter {

  /** POSIX local filesystems: `createLink` (link(2)) fails-if-exists
    * atomically in the kernel, with the content already durable. Hadoop's
    * local `create(overwrite=false)` is check-then-act — NOT a substitute. */
  object Link extends CommitArbiter {
    def commitIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean = {
      val t = java.nio.file.Paths.get(f.makeQualified(target).toUri.getPath)
      val s = java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath)
      try { java.nio.file.Files.createLink(t, s); true }
      catch { case _: java.nio.file.FileAlreadyExistsException => false }
    }
  }

  /** HDFS-family: `rename` is atomic at the namenode and refuses an
    * existing destination. */
  object Rename extends CommitArbiter {
    def commitIfAbsent(f: FileSystem, tmp: Path, target: Path): Boolean =
      f.rename(tmp, target)
  }

  private val builtIn: Map[String, CommitArbiter] = Map(
    "file" -> Link,
    "hdfs" -> Rename, "webhdfs" -> Rename, "viewfs" -> Rename)

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, CommitArbiter]()

  /** Plug in (or override) the arbiter for a filesystem scheme — the
    * deployment hook for object stores and catalog services. */
  def register(scheme: String, arbiter: CommitArbiter): Unit =
    registry.put(scheme, arbiter)

  def unregister(scheme: String): Unit = registry.remove(scheme)

  /** Resolve the arbiter for `scheme`: explicit registration wins, then the
    * built-in POSIX/HDFS table; anything else throws — see class doc. */
  def forScheme(scheme: String): CommitArbiter =
    Option(registry.get(scheme)).orElse(builtIn.get(scheme)).getOrElse {
      throw new UnsupportedOperationException(
        s"filesystem scheme '$scheme' has no registered commit arbiter: a racing " +
          "committer could silently overwrite a published manifest. Object " +
          "stores need conditional-put (S3 If-None-Match, GCS generation-match) " +
          "or a catalog service — wrap it in a CommitArbiter and " +
          "CommitArbiter.register(scheme, it).")
    }

  /** The publish step both [[Snapshots]] and [[Catalog]] ride. */
  def publish(f: FileSystem, tmp: Path, target: Path): Boolean =
    forScheme(f.getScheme).commitIfAbsent(f, tmp, target)
}
