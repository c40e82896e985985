package graft.storage

import java.net.URI

import org.apache.hadoop.fs.{Path, RawLocalFileSystem}
import org.apache.hadoop.util.Progressable

/** Hadoop FileSystem with OBJECT-STORE semantics, for proving the engine's
  * storage layer is object-store-safe (the reference ships S3/Azure/GCS
  * backends — modules/aws/src/main/kotlin/xtdb/aws — whose contract is
  * exactly this): **no rename, no append**. S3-style stores have neither —
  * "rename" is a non-atomic copy+delete, and objects are immutable once
  * PUT. A storage design that relies on either silently corrupts under
  * concurrent readers the day it moves off HDFS.
  *
  * Backed by the local filesystem so specs can run it anywhere, registered
  * under the `objstore://` scheme via
  * `fs.objstore.impl = graft.storage.ObjectStoreFileSystem`
  * (+ `fs.objstore.impl.disable.cache = true` so each spec gets a fresh
  * instance). Any engine-level rename or append throws.
  *
  * One scoped allowance: paths under a `_temporary/` segment — Spark's
  * FileOutputCommitter workspace. Production object-store deployments
  * replace that committer with a zero-rename one via config (the S3A
  * committers in hadoop-aws, "magic"/"staging" — public Hadoop docs); that
  * is deployment wiring, not engine logic. The allowance keeps the stock
  * committer usable under test while still failing hard if the ENGINE
  * itself ever renames: engine paths never contain `_temporary`.
  */
class ObjectStoreFileSystem extends RawLocalFileSystem {

  override def getScheme: String = "objstore"

  // constant: the superclass constructor calls getUri before subclass
  // field initializers run, so this must not read instance state
  override def getUri: URI = ObjectStoreFileSystem.SchemeUri

  override def rename(src: Path, dst: Path): Boolean = {
    val inCommitterWorkspace =
      src.toUri.getPath.contains("_temporary") ||
        dst.toUri.getPath.contains("_temporary")
    if (!inCommitterWorkspace)
      throw new UnsupportedOperationException(
        s"object-store semantics: rename is not available ($src -> $dst); " +
          "commit via a new object + pointer PUT instead")
    super.rename(src, dst)
  }

  override def append(f: Path, bufferSize: Int, progress: Progressable)
      : org.apache.hadoop.fs.FSDataOutputStream =
    throw new UnsupportedOperationException(
      s"object-store semantics: append is not available ($f); " +
        "objects are immutable — write a new object")
}

object ObjectStoreFileSystem {
  val SchemeUri: URI = URI.create("objstore:///")
}
