package graft

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

import java.net.URI

/** In-process Hadoop FileSystem emulating the OBJECT-STORE contract the
  * commit protocol must survive on S3/R2/GCS (the reference deploys on
  * exactly such stores — `/root/reference/bot_iceberg_loader.py:157`):
  *
  *  - `rename` is COPY + DELETE (CopyObject semantics): never atomic,
  *    succeeds even when the destination exists, silently overwriting —
  *    the reason rename-as-CAS is unsafe off the local FS.
  *  - `create(p, overwrite = false)` is CONDITIONAL PUT (`If-None-Match`):
  *    an atomic exists-check-and-create under a store-wide lock, the one
  *    primitive the CAS commit relies on here. (Real stores arbitrate at
  *    request commit; the shim arbitrates at create — same mutual
  *    exclusion, observable earlier.)
  *
  * Implemented as a path-translating wrapper over a RawLocalFileSystem
  * (objstore:/x ↔ file:/x), so Spark executors read and write through it
  * transparently in local mode. Register with
  * `conf.set("fs.objstore.impl", classOf[...].getName)`. */
class ObjectStoreFileSystem extends FileSystem {

  private val local = new RawLocalFileSystem()
  private var wd: Path = new Path("objstore:/")

  override def initialize(uri: URI, conf: Configuration): Unit = {
    super.initialize(uri, conf)
    setConf(conf)
    local.initialize(URI.create("file:///"), conf)
  }

  override def getScheme: String = "objstore"
  override def getUri: URI = URI.create("objstore:///")

  private def toLocal(p: Path): Path = new Path("file", null, p.toUri.getPath)
  private def toObj(p: Path): Path   = new Path("objstore", null, p.toUri.getPath)
  private def st(s: FileStatus): FileStatus = {
    val c = new FileStatus(s) // eager copy materializes permissions
    c.setPath(toObj(s.getPath))
    c
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream =
    local.open(toLocal(f), bufferSize)

  override def create(
      f: Path,
      permission: FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream =
    if (overwrite)
      local.create(toLocal(f), permission, true, bufferSize, replication, blockSize, progress)
    else ObjectStoreFileSystem.putLock.synchronized {
      if (local.exists(toLocal(f)))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(
          s"conditional put lost: $f exists")
      local.create(toLocal(f), permission, false, bufferSize, replication, blockSize, progress)
    }

  override def append(f: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("object stores do not append")

  /** CopyObject + DeleteObject: non-atomic, clobbers an existing
    * destination, handles directories recursively (Spark's committers
    * rename task/job dirs). */
  override def rename(src: Path, dst: Path): Boolean = {
    val (s, d) = (toLocal(src), toLocal(dst))
    if (!local.exists(s)) return false
    FileUtil.copy(local, s, local, d, /*deleteSource=*/ true, /*overwrite=*/ true, getConf)
  }

  override def delete(f: Path, recursive: Boolean): Boolean =
    local.delete(toLocal(f), recursive)

  override def listStatus(f: Path): Array[FileStatus] =
    local.listStatus(toLocal(f)).map(st)

  override def setWorkingDirectory(newDir: Path): Unit = wd = newDir
  override def getWorkingDirectory: Path = wd

  override def mkdirs(f: Path, permission: FsPermission): Boolean =
    local.mkdirs(toLocal(f), permission)

  override def getFileStatus(f: Path): FileStatus =
    st(local.getFileStatus(toLocal(f)))
}

object ObjectStoreFileSystem {
  /** Store-wide arbitration for conditional puts (stands in for the
    * store's own request serialization). */
  private val putLock = new Object
}
