package graft.pipelines

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.WeightTxt

/** Incremental file-store sync (SURVEY P5; ref:
  * utils/20251223-csv-from-googledrive.py + the sync loop at
  * utils/20251223-weight-for-streamlit.py:135-189): list the store,
  * anti-join against already-processed file ids, parse only the new
  * files, union into the master cache, write the cache back.
  *
  * The reference's store is Google Drive over HTTP; here the connector
  * boundary is a listing DataFrame — any enumerable store (local dir,
  * object store, Drive) plugs in by producing (id, path) rows. The
  * anti-join incremental pattern and cache write-back are the pipeline.
  *
  * Scale: listing and cache are DataFrames (no driver id-set); the
  * anti-join shuffles on id only if both sides are large — the listing
  * side is auto-broadcast below the threshold. Parsing distributes over
  * the new files. The cache is parquet (columnar, splittable), not the
  * reference's single CSV.
  */
object FileStoreSync {

  /** One page of a store listing plus the continuation token for the
    * next page (None = listing exhausted) — the reference's
    * `nextPageToken` contract (20251223-csv-from-googledrive.py:45-107). */
  case class StorePage(files: Seq[(String, String, Long)], nextPageToken: Option[String])

  /** Paginated store listing: returns up to `pageSize` (id, path, size)
    * entries strictly after `pageToken` (an opaque cursor — here the last
    * path already served), in stable path order. Mirrors the reference's
    * Drive `files().list(pageToken=...)` loop: pages are idempotent (the
    * same token always yields the same page, so an interrupted consumer
    * resumes mid-stream losslessly) and the token orders the listing, so
    * new files appearing BEHIND the cursor surface on the next full sync
    * rather than corrupting the current one.
    *
    * A real object store serves the cursor server-side; against Hadoop FS
    * the enumeration is re-run and fast-forwarded — same contract, which
    * is what [[FileStoreSyncSpec]] pins down. */
  def listPage(spark: SparkSession, dir: String, suffix: String = ".txt",
               pageSize: Int = 1000, pageToken: Option[String] = None): StorePage = {
    val all = enumerate(spark, dir, suffix)
    val after = pageToken match {
      case Some(t) => all.dropWhile(_._2 <= t)
      case None => all
    }
    val page = after.take(pageSize)
    StorePage(page, if (after.sizeIs > pageSize) Some(page.last._2) else None)
  }

  private def enumerate(spark: SparkSession, dir: String, suffix: String): Seq[(String, String, Long)] = {
    import org.apache.hadoop.fs.Path
    val path = new Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = Seq.newBuilder[(String, String, Long)]
    if (fs.exists(path)) {
      val it = fs.listFiles(path, /* recursive = */ true)
      while (it.hasNext) {
        val st = it.next()
        if (st.isFile && st.getPath.getName.endsWith(suffix))
          // full URI string, not toUri.getPath: stripping the scheme would
          // break the listing→fetch round trip on any non-default
          // FileSystem (s3a/abfs/...); FileStoreSyncSpec drives the whole
          // contract through a memfs:// scheme to pin this down
          out += ((st.getPath.getName, st.getPath.toString, st.getLen))
      }
    }
    out.result().sortBy(_._2)
  }

  /** Connector: enumerate a store into a listing DataFrame (id = file
    * name, like the reference's Drive file ids) by draining [[listPage]]
    * to exhaustion — the reference's `while page_token:` loop. Recursive;
    * the same code lists a local dir or an object-store prefix. */
  def listing(spark: SparkSession, dir: String, suffix: String = ".txt",
              pageSize: Int = 1000): DataFrame = {
    import spark.implicits._
    val out = Seq.newBuilder[(String, String, Long)]
    var token: Option[String] = None
    var done = false
    while (!done) {
      val page = listPage(spark, dir, suffix, pageSize, token)
      out ++= page.files
      token = page.nextPageToken
      done = token.isEmpty
    }
    out.result().toDF("id", "path", "size")
  }

  /** One chunk of a ranged media fetch plus the offset to resume from —
    * the download twin of [[StorePage]] (the reference's Drive
    * `files().get_media()` downloader issues ranged requests and resumes
    * from the last received byte; here the transport is Hadoop FS
    * `seek`+read, so the same contract covers local disk and object
    * stores). `nextOffset` is None when the file is exhausted. */
  case class FetchChunk(bytes: Array[Byte], nextOffset: Option[Long])

  /** Resumable ranged fetch: read up to `chunkSize` bytes of `path`
    * starting at `offset`. Chunks are idempotent — re-fetching the same
    * offset yields the same bytes (the property that makes a resumed
    * download equal a whole one; FileStoreSyncSpec proves it byte-wise). */
  def fetchChunk(spark: SparkSession, path: String, chunkSize: Int,
                 offset: Long = 0L): FetchChunk = {
    require(chunkSize > 0 && offset >= 0, "chunkSize must be > 0 and offset >= 0")
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    if (offset >= len) return FetchChunk(Array.emptyByteArray, None)
    val n = math.min(chunkSize.toLong, len - offset).toInt
    val buf = new Array[Byte](n)
    val in = fs.open(p)
    try { in.seek(offset); in.readFully(buf) } finally in.close()
    FetchChunk(buf, if (offset + n < len) Some(offset + n) else None)
  }

  /** Drain the file to exhaustion from `offset` — the reference's
    * resumable-download loop, but with ONE open and ONE status call
    * (per-chunk re-open via [[fetchChunk]] would cost 2+ round trips per
    * chunk on an object store). Byte-identical to chaining fetchChunk;
    * FileStoreSyncSpec asserts it. */
  def fetchAll(spark: SparkSession, path: String, chunkSize: Int,
               offset: Long = 0L): Array[Byte] = {
    require(chunkSize > 0 && offset >= 0, "chunkSize must be > 0 and offset >= 0")
    import org.apache.hadoop.fs.Path
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val len = fs.getFileStatus(p).getLen
    if (offset >= len) return Array.emptyByteArray
    // a single JVM byte array caps just below 2 GiB (HotSpot reserves a
    // header margin, so new Array[Byte](Int.MaxValue) itself throws); a
    // silent Int wrap here would return truncated bytes as the "whole"
    // file — fail loudly and point the caller at the chunked API instead
    val maxArray = Int.MaxValue - 8
    require(len - offset <= maxArray,
      s"fetchAll cannot materialize ${len - offset} bytes in one array " +
        s"(max $maxArray); drain via fetchChunk instead")
    val out = new Array[Byte]((len - offset).toInt)
    val in = fs.open(p)
    try {
      in.seek(offset)
      var done = 0
      while (done < out.length) {
        val n = math.min(chunkSize, out.length - done)
        in.readFully(out, done, n)
        done += n
      }
    } finally in.close()
    out
  }

  /** Master cache (8-column EAV), empty-schema frame when absent or not
    * job-committed. All I/O goes through the Hadoop FS API (a
    * java.io.File check would silently report any non-local cache as
    * missing and re-parse the whole store every sync).
    *
    * Crash safety: the cache is valid only with its `_SUCCESS` marker —
    * a partial directory (crash mid-write) reads as absent, which is the
    * conservative answer (full re-parse, never silently-missing rows).
    * A sync killed between the swap's delete and rename leaves the new
    * cache committed under `_tmp`; that window is recovered here by
    * finishing the rename. */
  def readCache(spark: SparkSession, cachePath: String): DataFrame = {
    val (fs, p) = graft.core.HadoopFs.of(spark, cachePath)
    val tmp = new org.apache.hadoop.fs.Path(cachePath + "_tmp")
    def committed(d: org.apache.hadoop.fs.Path) =
      fs.exists(new org.apache.hadoop.fs.Path(d, "_SUCCESS"))
    if (!committed(p) && committed(tmp)) {
      fs.delete(p, true)
      require(fs.rename(tmp, p), s"cache recovery rename failed: $tmp -> $p")
    }
    if (committed(p))
      spark.read.parquet(cachePath)
    else
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        org.apache.spark.sql.Encoders.product[graft.sources.WeightReading].schema)
  }

  /** The incremental step: listing ∖ processed (left_anti on id;
    * ref :144,155). */
  def newFiles(listingDf: DataFrame, cache: DataFrame): DataFrame = {
    val processed = cache.select(col("source_file_id").as("id")).distinct()
    listingDf.join(processed, Seq("id"), "left_anti")
  }

  /** One sync round: parse new files, union into the cache, write back.
    * Returns the refreshed cache frame. Matches the reference's
    * "no new files → cache unchanged" short-circuit. */
  def sync(spark: SparkSession, storeDir: String, cachePath: String): DataFrame = {
    val cache = readCache(spark, cachePath)
    val fresh = newFiles(listing(spark, storeDir), cache)
    val freshPaths = fresh.select("path").collect().map(_.getString(0))
    if (freshPaths.isEmpty) cache
    else {
      val parsed = WeightTxt.read(spark, freshPaths.toSeq)
      // write to a staging dir (the new cache is derived from a lazy read
      // of the old one, so overwriting in place would read-while-write),
      // then SWAP BY RENAME — one materialization instead of two, and a
      // crash mid-swap is recoverable: the staging dir is job-committed
      // (_SUCCESS) before the old cache is touched, and readCache finishes
      // an interrupted rename on the next sync
      val updated = cache.unionByName(parsed)
      val tmp = cachePath + "_tmp"
      updated.write.mode(SaveMode.Overwrite).parquet(tmp)
      val (fs, cacheP) = graft.core.HadoopFs.of(spark, cachePath)
      fs.delete(cacheP, true)
      require(fs.rename(new org.apache.hadoop.fs.Path(tmp), cacheP),
        s"cache swap rename failed: $tmp -> $cachePath")
      spark.read.parquet(cachePath)
    }
  }
}
