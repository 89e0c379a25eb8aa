package graft.sources

import java.util.UUID

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileAlreadyExistsException, FileSystem, Path}

/** The ATOMIC EXCLUSIVE-CREATE every commit in this engine serializes on
  * (manifests, consistency-group files), extracted behind an interface
  * because the right primitive is a property of the STORE, not of the
  * engine:
  *
  *  - HDFS-like filesystems: tmp bytes + a namenode-atomic `rename` that
  *    fails when the target exists (Iceberg's HadoopTableOperations
  *    shape) — [[CreateExclusiveCommit]]. All-or-nothing content AND
  *    exclusive entry in one namespace operation.
  *  - POSIX local disks: Hadoop's local `create` is check-then-open (two
  *    racing committers can both pass the check and clobber each other),
  *    but `link(2)` fails with EEXIST atomically — [[HardLinkCommit]]
  *    writes a tmp and hard-links it into place.
  *  - Rename-less object stores (S3, GCS): neither primitive exists, but
  *    both now expose a CONDITIONAL WRITE (S3 `If-None-Match: *` PUT, GCS
  *    `ifGenerationMatch=0`) — [[ConditionalPutCommit]] is that shape: one
  *    all-or-nothing full-bytes PUT that fails when the key exists,
  *    delegated to a [[ConditionalStore]] SPI so a deployment plugs its
  *    store's SDK call without touching the engine. The bundled
  *    [[LocalGenerationStore]] implements the same contract over the local
  *    disk (tmp + exclusive hard link), which is what the protocol spec
  *    races against.
  *
  * Contract, identical across implementations: `commit` installs the FULL
  * byte content at `target` if and only if nothing exists there, never
  * exposes a partial file at `target`, and throws Hadoop's
  * [[FileAlreadyExistsException]] (an IOException — the type
  * `commitRetrying`'s conflict loop keys on) when a racing committer won.
  * Every caller treats that exception as "re-read the head and re-derive",
  * which is the whole optimistic-concurrency protocol.
  *
  * Selection: `graft.commit.primitive` in the Hadoop conf (settable as
  * `spark.hadoop.graft.commit.primitive`) — `create`, `link`, `condput`,
  * or a [[CommitPrimitive]] class name. Undeclared, the primitive is
  * DISPATCHED BY FILESYSTEM SCHEME (round 13): `link` on `file://`,
  * `condput` on object-store schemes (s3/s3a/gs/abfs/... — their rename
  * is copy+delete, the same double-win hazard as POSIX; requires the
  * deployment's `graft.commit.condput.store` SDK hook, refused loudly
  * without one), `create` on hdfs-shaped atomic namespaces and anything
  * unknown. A deployment on raw S3 just sets
  * `graft.commit.condput.store=<its SDK impl>` and every table commit
  * in the warehouse serializes store-side.
  */
trait CommitPrimitive {
  def name: String

  /** Install `bytes` at `target` iff absent — atomic, all-or-nothing.
    * @throws FileAlreadyExistsException when a racing committer won
    */
  def commit(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit
}

/** HDFS-shaped: full bytes to a tmp file, then one namenode-atomic
  * `rename` that FAILS when the target exists — all-or-nothing (a
  * mid-write crash leaves only tmp debris, never a torn manifest visible
  * at a taken version — the window streaming bytes straight into an
  * exclusive create had) AND exclusive (HDFS rename onto an existing
  * file returns false; the loser maps to the standard conflict). On
  * stores without an atomic namespace this primitive is NOT safe —
  * POSIX rename silently overwrites (the protocol spec demonstrates the
  * double-win), which is why `link` is the local default and `condput`
  * the object-store one.
  */
final class CreateExclusiveCommit extends CommitPrimitive {
  val name = "create"
  def commit(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit = {
    if (fs.exists(target)) // cheap pre-probe; the rename is the real gate
      throw new FileAlreadyExistsException(
        s"$target: a racing committer won this version")
    val tmp = new Path(target.getParent, s".tmp-commit-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    try {
      if (!fs.rename(tmp, target))
        throw new FileAlreadyExistsException(
          s"$target: a racing committer won this version")
    } finally {
      // BEST-EFFORT: after a successful rename the manifest has landed —
      // a transient IOException from the cleanup probe must not make the
      // caller's retry loop re-apply a commit that already won (tmp
      // debris is dot-prefixed and filtered from every listing)
      try if (fs.exists(tmp)) fs.delete(tmp, false)
      catch { case _: java.io.IOException => }
    }
  }
}

/** POSIX-shaped: full bytes to a tmp file, then `link(2)` into place —
  * the link fails with EEXIST atomically, and the target only ever
  * appears with complete content.
  */
final class HardLinkCommit extends CommitPrimitive {
  val name = "link"
  def commit(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit = {
    // link(2) is a LOCAL-disk primitive: misconfiguring it onto a remote
    // store would link paths on the driver's own disk — refuse clearly
    // instead of committing somewhere the table is not
    val scheme = fs.getUri.getScheme
    require(scheme == null || scheme == "file",
      s"graft.commit.primitive=link requires a local filesystem, " +
        s"got scheme '$scheme' — use 'create' or 'condput'")
    val tmp = new Path(target.getParent,
      s".tmp-commit-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
    } catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        throw new FileAlreadyExistsException(
          s"$target: a racing committer won this version")
    } finally fs.delete(tmp, false)
  }
}

/** The conditional-write SPI an object-store deployment implements with
  * its SDK (S3 `PutObject` + `If-None-Match: *`, GCS insert with
  * `ifGenerationMatch=0`): one atomic full-bytes PUT that reports whether
  * the precondition held. Implementations must be all-or-nothing — the
  * key either holds the complete bytes or does not exist.
  */
trait ConditionalStore {
  /** @return false iff the key already existed (precondition failed) */
  def putIfAbsent(fs: FileSystem, target: Path, bytes: Array[Byte]): Boolean
}

/** Local-disk model of the conditional-PUT contract (tmp + exclusive hard
  * link): same observable semantics as a generation-0 precondition —
  * all-or-nothing content, exactly one winner — so the commit protocol is
  * testable against the object-store shape with zero external services.
  */
final class LocalGenerationStore extends ConditionalStore {
  def putIfAbsent(fs: FileSystem, target: Path, bytes: Array[Byte]): Boolean = {
    val tmp = new Path(target.getParent,
      s".tmp-condput-${UUID.randomUUID()}")
    val out = fs.create(tmp, true)
    try out.write(bytes) finally out.close()
    try {
      java.nio.file.Files.createLink(
        java.nio.file.Paths.get(target.toUri.getPath),
        java.nio.file.Paths.get(tmp.toUri.getPath))
      true
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => false
    } finally fs.delete(tmp, false)
  }
}

/** Object-store-shaped commit: one conditional PUT. The store hook is
  * pluggable by class name (`graft.commit.condput.store`).
  */
final class ConditionalPutCommit(store: ConditionalStore) extends CommitPrimitive {
  val name = "condput"
  def commit(fs: FileSystem, target: Path, bytes: Array[Byte]): Unit =
    if (!store.putIfAbsent(fs, target, bytes))
      throw new FileAlreadyExistsException(
        s"$target: conditional PUT precondition failed — a racing " +
          "committer won this version")
}

object GraftCommitPrimitive {
  val ConfKey = "graft.commit.primitive"
  val StoreConfKey = "graft.commit.condput.store"

  /** Hadoop schemes whose `rename` is a non-atomic copy+delete (or
    * plain PUT) with NO exclusive-destination guarantee: the `create`
    * primitive would double-win on them exactly like POSIX rename
    * (spec-demonstrated). Their safe primitive is the conditional PUT.
    */
  val ObjectStoreSchemes: Set[String] = Set("s3", "s3a", "s3n", "gs",
    "gcs", "abfs", "abfss", "wasb", "wasbs", "oss", "cos", "cosn",
    "swift", "obs")

  /** Resolve the primitive for one filesystem. Cheap (no reflection on
    * the default paths), called per commit.
    */
  def forFs(fs: FileSystem): CommitPrimitive = {
    val conf = fs.getConf
    Option(if (conf == null) null else conf.get(ConfKey)) match {
      case None | Some("") => defaultFor(fs)
      case Some("create") => Create
      case Some("link") => Link
      case Some("condput") => new ConditionalPutCommit(storeFrom(fs.getConf))
      case Some(cls) =>
        Class.forName(cls).getDeclaredConstructor().newInstance()
          .asInstanceOf[CommitPrimitive]
    }
  }

  /** SCHEME DISPATCH when nothing is declared (round 13 — the primitive
    * is a property of the STORE, so the store picks it): `link(2)` on the
    * local filesystem (POSIX rename silently overwrites — `create` would
    * double-win); conditional PUT on rename-less object stores (same
    * double-win hazard; requires the deployment's
    * `graft.commit.condput.store` SDK hook and refuses loudly without
    * one — a silent fallback would be the exact unsafety this dispatch
    * closes); exclusive-rename `create` on HDFS-shaped atomic namespaces
    * (hdfs/viewfs/webhdfs and anything unknown — the conservative prior
    * default, correct wherever rename is namespace-atomic and
    * destination-exclusive).
    */
  private def defaultFor(fs: FileSystem): CommitPrimitive = {
    // getUri never throws (getScheme is unimplemented on some
    // FileSystem subclasses, RawLocalFileSystem included)
    val scheme = fs.getUri.getScheme
    if (scheme == null || scheme == "file") Link
    else if (ObjectStoreSchemes.contains(scheme.toLowerCase))
      new ConditionalPutCommit(storeFrom(fs.getConf, requireStore = Some(scheme)))
    else Create
  }

  /** `requireStore`: set when SCHEME dispatch picked condput — the local
    * generation shim links paths on the driver's own disk, which on a
    * real object store would commit somewhere the table is not; an
    * explicit `graft.commit.primitive=condput` keeps the shim (the
    * protocol spec races against it).
    */
  private def storeFrom(conf: Configuration,
                        requireStore: Option[String] = None): ConditionalStore =
    Option(if (conf == null) null else conf.get(StoreConfKey))
      .filter(_.nonEmpty) match {
      case None =>
        requireStore.foreach(scheme => throw new IllegalStateException(
          s"graft commit: scheme '$scheme' needs a conditional-PUT store " +
            s"hook — set $StoreConfKey to your store SDK's " +
            "putIfAbsent implementation (S3 If-None-Match PUT, GCS " +
            "ifGenerationMatch=0); the local shim cannot serialize " +
            "commits on a remote store"))
        new LocalGenerationStore
      case Some(cls) =>
        Class.forName(cls).getDeclaredConstructor().newInstance()
          .asInstanceOf[ConditionalStore]
    }

  private val Create = new CreateExclusiveCommit
  private val Link = new HardLinkCommit
}
