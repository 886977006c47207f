package graft.pipelines

import java.nio.file.{Files, Path}

import graft.SparkSpec

class FileStoreSyncSpec extends SparkSpec {

  private def writeTxt(dir: Path, name: String, date: String, w: String): Unit =
    Files.writeString(dir.resolve(name),
      s"header\nTime:08:00, Mon,$date\nWeight:${w}kg\nBMI:25.0\n")

  test("incremental sync: first full load, second round parses only new files, third is a no-op") {
    val store = Files.createTempDirectory("store")
    val cache = store.resolve("cache.parquet").toString
    writeTxt(store, "a.txt", "2025-12-01", "90.0")
    writeTxt(store, "b.txt", "2025-12-02", "91.0")

    val c1 = FileStoreSync.sync(spark, store.toString, cache)
    assert(c1.count() == 4) // 2 files × 2 attributes
    assert(c1.select("source_file_id").distinct().count() == 2)

    writeTxt(store, "c.txt", "2025-12-03", "92.0")
    val c2 = FileStoreSync.sync(spark, store.toString, cache)
    assert(c2.count() == 6)

    // no new files → unchanged (and no write)
    val mtime = Files.getLastModifiedTime(java.nio.file.Paths.get(cache))
    val c3 = FileStoreSync.sync(spark, store.toString, cache)
    assert(c3.count() == 6)
    assert(Files.getLastModifiedTime(java.nio.file.Paths.get(cache)) == mtime)
  }

  test("listing is recursive (nested folders found, like the Drive folder stack)") {
    val store = Files.createTempDirectory("store3")
    Files.createDirectories(store.resolve("sub/inner"))
    writeTxt(store, "top.txt", "2025-12-01", "90.0")
    Files.writeString(store.resolve("sub/inner/deep.txt"),
      "h\nTime:08:00, Mon,2025-12-04\nWeight:93.0kg\n")
    val l = FileStoreSync.listing(spark, store.toString)
    assert(l.count() == 2)
    assert(l.collect().map(_.getString(0)).toSet == Set("top.txt", "deep.txt"))
  }

  test("pagination: pages partition the listing, tokens are idempotent, resume mid-stream is lossless") {
    val store = Files.createTempDirectory("store4")
    (1 to 7).foreach(i => writeTxt(store, f"f$i%02d.txt", "2025-12-01", "90.0"))

    // drain in pages of 3 → 3/3/1, exactly once each
    var token: Option[String] = None
    var pages = Vector.empty[FileStoreSync.StorePage]
    var done = false
    while (!done) {
      val p = FileStoreSync.listPage(spark, store.toString, pageSize = 3, pageToken = token)
      pages :+= p
      token = p.nextPageToken
      done = token.isEmpty
    }
    assert(pages.map(_.files.length) == Vector(3, 3, 1))
    val drained = pages.flatMap(_.files).map(_._1)
    assert(drained == (1 to 7).map(i => f"f$i%02d.txt"))

    // idempotent resume: re-fetching with the first page's token yields
    // the identical second page (an interrupted consumer loses nothing)
    val resumed = FileStoreSync.listPage(spark, store.toString, pageSize = 3,
      pageToken = pages(0).nextPageToken)
    assert(resumed.files == pages(1).files)

    // the paged listing() equals the one-shot enumeration
    val viaPages = FileStoreSync.listing(spark, store.toString, pageSize = 2)
      .collect().map(_.getString(0)).sorted.toSeq
    assert(viaPages == (1 to 7).map(i => f"f$i%02d.txt"))
  }

  test("ranged fetch: chunked + resumed downloads are byte-identical to a whole read") {
    val store = Files.createTempDirectory("fetch")
    val payload = Array.tabulate[Byte](10007)(i => (i * 31 % 251).toByte) // prime sizes: no chunk alignment
    val f = store.resolve("blob.bin")
    Files.write(f, payload)
    val whole = FileStoreSync.fetchAll(spark, f.toString, chunkSize = 1 << 20)
    assert(whole.toSeq == payload.toSeq)
    // small chunks tile the file exactly
    val chunked = FileStoreSync.fetchAll(spark, f.toString, chunkSize = 997)
    assert(chunked.toSeq == payload.toSeq)
    // interrupt after two chunks, resume from the returned offset
    val c1 = FileStoreSync.fetchChunk(spark, f.toString, 997)
    val c2 = FileStoreSync.fetchChunk(spark, f.toString, 997, c1.nextOffset.get)
    val rest = FileStoreSync.fetchAll(spark, f.toString, 997, c2.nextOffset.get)
    assert((c1.bytes ++ c2.bytes ++ rest).toSeq == payload.toSeq)
    // idempotent re-fetch of the same range
    val c1again = FileStoreSync.fetchChunk(spark, f.toString, 997)
    assert(c1again.bytes.toSeq == c1.bytes.toSeq)
    // past-EOF offset is an empty terminal chunk
    assert(FileStoreSync.fetchChunk(spark, f.toString, 997, payload.length.toLong).nextOffset.isEmpty)
  }

  test("connector contract is FileSystem-scheme-agnostic (memfs://, no java.io.File)") {
    // register the in-memory FS and seed a nested store
    spark.sparkContext.hadoopConfiguration.set("fs.memfs.impl", classOf[MemFs].getName)
    MemFs.clear()
    (1 to 5).foreach(i => MemFs.put(f"/store/f$i%02d.txt", s"payload $i".getBytes("UTF-8")))
    val payload = Array.tabulate[Byte](10007)(i => (i * 31 % 251).toByte)
    MemFs.put("/store/sub/deep.txt", payload)

    // recursive paginated listing over the foreign scheme
    val l = FileStoreSync.listing(spark, "memfs://mem/store", pageSize = 2).collect()
    assert(l.map(_.getString(0)).toSet ==
      (1 to 5).map(i => f"f$i%02d.txt").toSet + "deep.txt")
    // the listing's path column preserves the scheme — the listing→fetch
    // round trip must work without knowing which FileSystem served it
    val deepPath = l.find(_.getString(0) == "deep.txt").get.getString(1)
    assert(deepPath.startsWith("memfs://"), s"scheme lost: $deepPath")

    // ranged fetch + resume, byte-identical, all through memfs seek/read
    val whole = FileStoreSync.fetchAll(spark, deepPath, chunkSize = 1 << 20)
    assert(whole.toSeq == payload.toSeq)
    val c1 = FileStoreSync.fetchChunk(spark, deepPath, 997)
    val rest = FileStoreSync.fetchAll(spark, deepPath, 997, c1.nextOffset.get)
    assert((c1.bytes ++ rest).toSeq == payload.toSeq)

    // pagination tokens work against the foreign scheme too
    val p1 = FileStoreSync.listPage(spark, "memfs://mem/store", pageSize = 4)
    val p2 = FileStoreSync.listPage(spark, "memfs://mem/store", pageSize = 4,
      pageToken = p1.nextPageToken)
    assert((p1.files ++ p2.files).map(_._1).size == 6 && p2.nextPageToken.isEmpty)
    MemFs.clear()
  }

  test("cache swap is crash-recoverable: partial cache reads empty, interrupted rename finishes") {
    val store = Files.createTempDirectory("storecrash")
    val cache = store.resolve("cache.parquet").toString
    writeTxt(store, "a.txt", "2025-12-01", "90.0")
    val c1 = FileStoreSync.sync(spark, store.toString, cache)
    assert(c1.count() == 2)
    val fs = new org.apache.hadoop.fs.Path(cache)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash mid-swap: committed staging dir exists, cache was deleted —
    // the next read must finish the rename and lose nothing
    fs.rename(new org.apache.hadoop.fs.Path(cache), new org.apache.hadoop.fs.Path(cache + "_tmp"))
    assert(FileStoreSync.readCache(spark, cache).count() == 2)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(cache + "_tmp")), "recovery must complete the swap")
    // crash mid-write: a cache dir without _SUCCESS reads as absent
    // (conservative full re-parse), never as a silently-partial cache
    fs.delete(new org.apache.hadoop.fs.Path(cache, "_SUCCESS"), false)
    assert(FileStoreSync.readCache(spark, cache).count() == 0)
  }

  test("empty cache + empty store → empty frame with the EAV schema") {
    val store = Files.createTempDirectory("store2")
    val cache = store.resolve("cache.parquet").toString
    val c = FileStoreSync.sync(spark, store.toString, cache)
    assert(c.isEmpty)
    assert(c.columns.toSeq == Seq("day_name", "date", "time", "attribute",
      "value", "info_symbol", "info_txt", "source_file_id"))
  }
}
