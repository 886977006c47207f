package graft.pipelines

import java.io.{FileNotFoundException, IOException}
import java.net.URI

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs._
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** Minimal in-memory read-only Hadoop FileSystem (scheme `memfs://`) —
  * registered by FileStoreSyncSpec to prove the store connector is
  * transport-agnostic: listing pagination and ranged fetch run through the
  * exact `Path.getFileSystem` code path an object store (s3a/abfs/gs)
  * would, with zero `java.io.File` assumptions. Only the operations the
  * connector contract needs are implemented (status, list, open+seek);
  * mutations throw. */
class MemFs extends FileSystem {

  private var fsUri: URI = URI.create("memfs:///")
  private var wd: Path = new Path("/")

  override def initialize(name: URI, conf: Configuration): Unit = {
    super.initialize(name, conf)
    setConf(conf)
    fsUri = URI.create(
      name.getScheme + "://" + Option(name.getAuthority).getOrElse(""))
  }

  override def getScheme: String = "memfs"
  override def getUri: URI = fsUri
  override def getWorkingDirectory: Path = wd
  override def setWorkingDirectory(p: Path): Unit = wd = p

  private def key(p: Path): String = p.toUri.getPath

  private def fileStatus(p: Path, bytes: Array[Byte]): FileStatus =
    new FileStatus(bytes.length.toLong, false, 1, 4096L, 0L, makeQualified(p))

  private def dirStatus(p: Path): FileStatus =
    new FileStatus(0L, true, 1, 4096L, 0L, makeQualified(p))

  override def getFileStatus(p: Path): FileStatus = {
    val k = key(p)
    MemFs.files.get(k) match {
      case Some(b) => fileStatus(p, b)
      case None =>
        val prefix = if (k.endsWith("/")) k else k + "/"
        if (k == "/" || MemFs.files.keysIterator.exists(_.startsWith(prefix))) dirStatus(p)
        else throw new FileNotFoundException(k)
    }
  }

  override def listStatus(p: Path): Array[FileStatus] = {
    val st = getFileStatus(p)
    if (st.isFile) return Array(st)
    val k = key(p)
    val prefix = if (k.endsWith("/")) k else k + "/"
    MemFs.files.keysIterator.filter(_.startsWith(prefix)).toSeq
      .map(_.substring(prefix.length))
      .groupBy(_.takeWhile(_ != '/'))
      .toSeq.sortBy(_._1)
      .map { case (head, rests) =>
        val child = new Path(prefix + head)
        if (rests.exists(_.contains('/'))) dirStatus(child)
        else fileStatus(child, MemFs.files(prefix + head))
      }
      .toArray
  }

  override def open(p: Path, bufferSize: Int): FSDataInputStream = {
    val bytes = MemFs.files.getOrElse(key(p), throw new FileNotFoundException(key(p)))
    new FSDataInputStream(new MemFsInputStream(bytes))
  }

  override def create(p: Path, permission: FsPermission, overwrite: Boolean,
                      bufferSize: Int, replication: Short, blockSize: Long,
                      progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("memfs is read-only")
  override def append(p: Path, bufferSize: Int, progress: Progressable): FSDataOutputStream =
    throw new UnsupportedOperationException("memfs is read-only")
  override def rename(src: Path, dst: Path): Boolean =
    throw new UnsupportedOperationException("memfs is read-only")
  override def delete(p: Path, recursive: Boolean): Boolean =
    throw new UnsupportedOperationException("memfs is read-only")
  override def mkdirs(p: Path, permission: FsPermission): Boolean =
    throw new UnsupportedOperationException("memfs is read-only")
}

object MemFs {
  /** path (no scheme/authority) → content. */
  val files = scala.collection.concurrent.TrieMap[String, Array[Byte]]()
  def put(path: String, bytes: Array[Byte]): Unit = { files.put(path, bytes); () }
  def clear(): Unit = files.clear()
}

/** Seekable byte-array stream (FSInputStream supplies positioned reads). */
private class MemFsInputStream(data: Array[Byte]) extends FSInputStream {
  private var pos: Int = 0
  override def seek(p: Long): Unit = {
    if (p < 0 || p > data.length) throw new IOException(s"seek $p outside [0, ${data.length}]")
    pos = p.toInt
  }
  override def getPos: Long = pos.toLong
  override def seekToNewSource(targetPos: Long): Boolean = false
  override def read(): Int =
    if (pos >= data.length) -1 else { val r = data(pos) & 0xff; pos += 1; r }
  override def read(buf: Array[Byte], off: Int, len: Int): Int =
    if (pos >= data.length) -1
    else {
      val n = math.min(len, data.length - pos)
      System.arraycopy(data, pos, buf, off, n)
      pos += n
      n
    }
}
