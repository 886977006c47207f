package graft.core

/** Process-unique, collision-proof roots for the write-once snapshot
  * stores (near-dup edges, trained centroids, embedding edges).
  *
  * The identity tag is a SHA-256 prefix of the data-dir string, NOT
  * `hashCode`: two dirs with colliding (or `abs(Int.MinValue)`-negative)
  * hashCodes would silently share a path, and the second build would
  * overwrite the first while its cached root kept reading — wrong
  * results with no error. 64 bits of SHA-256 makes that practically
  * impossible; the pid suffix keeps concurrent processes over the same
  * dir from racing a write against a read.
  */
object StorePaths {
  def root(kind: String, dir: String): String = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val tag = md.digest(dir.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .take(8).map(b => f"$b%02x").mkString
    s"${System.getProperty("java.io.tmpdir")}/graft_${kind}_${ProcessHandle.current().pid()}_$tag"
  }
}
