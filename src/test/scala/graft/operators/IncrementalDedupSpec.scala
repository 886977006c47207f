package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The incremental-vs-recompute contract and the plan shapes that make
  * incremental ingests cheap at 100 TB. Cross-engine correctness of the
  * same pipeline is driver-proven by q69's DuckDB oracle. */
class IncrementalDedupSpec extends SparkSpec {

  private def tmpRoot(tag: String) =
    s"${System.getProperty("java.io.tmpdir")}/graft_incdedup_spec_$tag"

  test("incremental pairs ≡ full q30 recompute restricted to delta-involving pairs") {
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 =!= 7)
    val delta = all.filter(col("doc_id") % 10 === 7)
    val root = tmpRoot("equiv")
    IncrementalDedup.writeStore(spark, state, root)
    val inc = IncrementalDedup.dedupeDelta(spark, root, delta)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    val full = graft.queries.TextQueries.q30MinHashLsh(spark, sfDir)
      .filter(col("doc_a") % 10 === 7 || col("doc_b") % 10 === 7)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getDouble(3))).toSet
    assert(inc == full, s"incremental diverged: only-inc=${inc -- full}, only-full=${full -- inc}")
  }

  test("store scan is dynamically partition-pruned by the delta's band buckets") {
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 =!= 7)
    // a deliberately tiny delta: it cannot touch every band bucket, so
    // pruning must be visible in the plan
    val delta = all.filter(col("doc_id") % 100 === 7)
    val root = tmpRoot("dpp")
    IncrementalDedup.writeStore(spark, state, root)
    val df = IncrementalDedup.dedupeDelta(spark, root, delta)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("dynamicpruning"),
      s"store scan must carry a dynamic partition pruning filter:\n$p")
    assert(!p.contains("CartesianProduct"))
    // the state side must never be exchanged: the delta broadcasts
    val joinIdx = p.indexOf("BroadcastHashJoin")
    assert(joinIdx >= 0, "delta bands must broadcast against the store")
  }

  test("dedupeStream: each micro-batch dedupes against the store, then grows it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot("stream")
    val pairsOut = tmpRoot("stream_pairs")
    val ckpt = tmpRoot("stream_ckpt")
    Seq(root, pairsOut, ckpt).foreach { p =>
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p), true)
    }
    // state: one doc; batch 1 duplicates it; batch 2 duplicates batch 1
    val mk = (id: Long, t: String) => (id, t)
    val text = "the quick brown fox jumps over the lazy dog again and again and again"
    IncrementalDedup.writeStore(spark, Seq(mk(1L, text)).toDF("doc_id", "text"), root)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = IncrementalDedup.dedupeStream(in.toDF().toDF("doc_id", "text"), root, pairsOut, ckpt)
    try {
      in.addData(mk(2L, text)); q.processAllAvailable()          // batch 1: pairs with state
      in.addData(mk(3L, text)); q.processAllAvailable()          // batch 2: pairs with 1 AND 2
    } finally q.stop()
    val pairs = spark.read.parquet(pairsOut)
      .select("doc_a", "doc_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"batch 2 must see batch 1 via the store: $pairs")
  }

  test("ingestBatch replay (same batchId) is idempotent: no duplicated store or pair rows") {
    import spark.implicits._
    val root = tmpRoot("replay")
    val pairsOut = tmpRoot("replay_pairs")
    Seq(root, pairsOut).foreach { p =>
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p), true)
    }
    val text = "the quick brown fox jumps over the lazy dog again and again and again"
    IncrementalDedup.writeStore(spark, Seq((1L, text)).toDF("doc_id", "text"), root)
    val batch = Seq((2L, text)).toDF("doc_id", "text")
    IncrementalDedup.ingestBatch(spark, root, pairsOut, batch, batchId = 0L)
    val bandsOnce = spark.read.parquet(s"$root/bands").count()
    val pairsOnce = spark.read.parquet(pairsOut).count()
    // at-least-once replay of the SAME micro-batch (crash before the
    // checkpoint committed): dynamic partition overwrite must replace,
    // not append
    IncrementalDedup.ingestBatch(spark, root, pairsOut, batch, batchId = 0L)
    assert(spark.read.parquet(s"$root/bands").count() == bandsOnce,
      "replayed batch must not duplicate store band rows")
    assert(spark.read.parquet(s"$root/sets").count() == 2, "one state + one batch doc")
    assert(spark.read.parquet(pairsOut).count() == pairsOnce,
      "replayed batch must not duplicate pair rows")
  }

  test("maintained edge store over two ingests ≡ full-corpus edge recompute, and replay-safe") {
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 < 7)
    val d1 = all.filter(col("doc_id") % 10 === 7)
    val d2 = all.filter(col("doc_id") % 10 > 7)
    val root = tmpRoot("edges")
    val pairsOut = tmpRoot("edges_pairs")
    Seq(root, pairsOut).foreach { p =>
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p), true)
    }
    IncrementalDedup.writeEdgeStore(spark, state, root)
    IncrementalDedup.ingestBatchWithEdges(spark, root, pairsOut, d1, batchId = 1L)
    IncrementalDedup.ingestBatchWithEdges(spark, root, pairsOut, d2, batchId = 2L)
    def edgeSet = IncrementalDedup.edges(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val maintained = edgeSet
    // recompute: the snapshot edge build over the whole corpus
    val recomputed = graft.queries.TextQueries.q30MinHashLsh(spark, sfDir)
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(maintained == recomputed,
      s"edges(state ∪ d1 ∪ d2) must equal recompute: only-maintained=" +
        s"${maintained -- recomputed}, only-recomputed=${recomputed -- maintained}")
    // at-least-once replay of batch 2 must overwrite its own edge
    // partition, not append a second copy
    val rowsBefore = IncrementalDedup.edges(spark, root).count()
    IncrementalDedup.ingestBatchWithEdges(spark, root, pairsOut, d2, batchId = 2L)
    assert(IncrementalDedup.edges(spark, root).count() == rowsBefore)
    assert(edgeSet == recomputed)
    // downstream graph-tier parity: components over the maintained edges
    // equal components over the recomputed edges
    val verts = all.select(col("doc_id").as("id"))
    def comps(e: Set[(Long, Long)]) = {
      import spark.implicits._
      graft.ml.ConnectedComponents.components(
          verts, e.toSeq.toDF("src", "dst"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    }
    assert(comps(maintained) == comps(recomputed))
  }

  test("dedupeStreamWithEdges: the maintained edge table tracks the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val root = tmpRoot("streamedges")
    val pairsOut = tmpRoot("streamedges_pairs")
    val ckpt = tmpRoot("streamedges_ckpt")
    Seq(root, pairsOut, ckpt).foreach { p =>
      org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
        .delete(new org.apache.hadoop.fs.Path(p), true)
    }
    val text = "the quick brown fox jumps over the lazy dog again and again and again"
    val novel = "completely unrelated content about distributed query engines and parquet"
    IncrementalDedup.writeEdgeStore(spark, Seq((1L, text)).toDF("doc_id", "text"), root)
    // single-doc seed → the edge table starts EMPTY; reading it must give
    // an empty frame, not a schema-inference error
    assert(IncrementalDedup.edges(spark, root).count() == 0)
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val q = IncrementalDedup.dedupeStreamWithEdges(
      in.toDF().toDF("doc_id", "text"), root, pairsOut, ckpt)
    try {
      // batch 0 is all-novel: ZERO pairs — the write-then-read-back of an
      // empty pairs partition must not wedge the stream
      in.addData((9L, novel)); q.processAllAvailable()
      assert(q.isActive, "a zero-pair batch must not crash the stream")
      in.addData((2L, text)); q.processAllAvailable()
      in.addData((3L, text)); q.processAllAvailable()
    } finally q.stop()
    val edges = IncrementalDedup.edges(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edges == Set((1L, 2L), (1L, 3L), (2L, 3L)),
      s"edge table must contain every exact-dup pair across stream batches: $edges")
  }

  test("edge-store seed write spreads across >1 task on 10x data (no single-file funnel)") {
    // 10 shifted-id replicas of the corpus: identical texts across
    // replicas make every dup cluster 10× larger, so the seed edge set
    // grows ~100× — the regime where a coalesce(1) write would funnel a
    // corpus-sized table through one task. The seed's range repartition
    // carries an EXPLICIT partition count, so the parallelism must
    // survive AQE and show up as multiple data files.
    val d = graft.core.Tables.documents(spark, sfDir)
    val big = (0 until 10)
      .map(r => d.withColumn("doc_id", col("doc_id") + lit(r * 1000000L)))
      .reduce(_ unionByName _)
    val root = tmpRoot("seedpar")
    org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
      .delete(new org.apache.hadoop.fs.Path(root), true)
    IncrementalDedup.writeEdgeStore(spark, big, root)
    val seedDir = new java.io.File(s"$root/edges/ingest_batch=-1")
    val parts = Option(seedDir.listFiles()).getOrElse(Array.empty)
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts > 1, s"seed edge write must run with >1 task at 10x, got $parts file(s)")
    // and the maintained edge set still equals the snapshot recompute
    val maintained = IncrementalDedup.edges(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val sigs = graft.queries.TextQueries.minHashSignatures(spark, big)
    val recomputed = graft.queries.TextQueries.lshRerankedPairs(sigs)
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(maintained == recomputed)
  }

  test("restart recovery: crash after batch-1 store write, restart on the checkpoint — store ≡ uninterrupted ≡ recompute") {
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 < 7)
    val d1 = all.filter(col("doc_id") % 10 === 7).select("doc_id", "text")
    val d2 = all.filter(col("doc_id") % 10 > 7).select("doc_id", "text")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    def clean(ps: String*) = ps.foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    def edgeSet(root: String) = IncrementalDedup.edges(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    // twin A: the uninterrupted run (manual ingests, the proven path)
    val rootU = tmpRoot("restart_u"); val pairsU = tmpRoot("restart_u_pairs")
    clean(rootU, pairsU)
    IncrementalDedup.writeEdgeStore(spark, state, rootU)
    IncrementalDedup.ingestBatchWithEdges(spark, rootU, pairsU, d1, batchId = 0L)
    IncrementalDedup.ingestBatchWithEdges(spark, rootU, pairsU, d2, batchId = 1L)

    // twin B: a FILE-source stream (distributed data plane) that
    //  (a) "crashes" after batch 0's store writes but BEFORE the
    //      checkpoint commits — simulated by running the foreachBatch
    //      body manually with the id the stream will assign (0), then
    //      letting the stream replay it from offset zero;
    //  (b) is STOPPED after batch 0 and restarted on the same
    //      checkpoint for batch 1 — the restart-recovery boundary.
    val rootR = tmpRoot("restart_r"); val pairsR = tmpRoot("restart_r_pairs")
    val ckpt = tmpRoot("restart_ckpt"); val srcDir = tmpRoot("restart_src")
    clean(rootR, pairsR, ckpt, srcDir)
    IncrementalDedup.writeEdgeStore(spark, state, rootR)
    IncrementalDedup.ingestBatchWithEdges(spark, rootR, pairsR, d1, batchId = 0L)
    def stream() = IncrementalDedup.dedupeStreamWithEdges(
      spark.readStream.schema("doc_id BIGINT, text STRING").parquet(srcDir),
      rootR, pairsR, ckpt)
    d1.write.mode("append").parquet(srcDir)
    val q1 = stream()
    try q1.processAllAvailable() finally q1.stop() // replay of batch 0, then STOP
    d2.write.mode("append").parquet(srcDir)
    val q2 = stream() // restart on the SAME checkpoint
    try q2.processAllAvailable() finally q2.stop()

    val recomputed = graft.queries.TextQueries.q30MinHashLsh(spark, sfDir)
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(edgeSet(rootR) == edgeSet(rootU),
      "restarted-stream store must equal the uninterrupted run")
    assert(edgeSet(rootR) == recomputed,
      "restarted-stream store must equal the full recompute")
    // the crashed-then-replayed batch must not have duplicated any rows
    val pairKeys = spark.read.parquet(pairsR).select("doc_a", "doc_b", "batch_id").collect()
    assert(pairKeys.length == pairKeys.distinct.length,
      "batch-0 replay after the simulated crash must overwrite, not append")
  }

  test("compactStore mid-ingest: folded store reads identically, keeps DPP, and sheds batch partitions") {
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 < 7)
    val d1 = all.filter(col("doc_id") % 10 === 7)
    val d2 = all.filter(col("doc_id") % 10 > 7)
    val root = tmpRoot("compact"); val pairsOut = tmpRoot("compact_pairs")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq(root, pairsOut).foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    IncrementalDedup.writeEdgeStore(spark, state, root)
    IncrementalDedup.ingestBatchWithEdges(spark, root, pairsOut, d1, batchId = 0L)
    val filesBefore = Compaction.treeDataFileCount(spark, s"$root/bands")
    def snapshot() = (
      IncrementalDedup.edges(spark, root).collect().map(r => (r.getLong(0), r.getLong(1))).toSet,
      spark.read.parquet(s"$root/sets").select("doc_id").collect().map(_.getLong(0)).toSet,
      spark.read.parquet(s"$root/bands").count())
    val before = snapshot()
    // the maintenance pass, interleaved MID-INGEST (batch 0 committed,
    // batch 1 still to come)
    IncrementalDedup.compactStore(spark, root)
    assert(snapshot() == before, "compaction must not change what the store reads as")
    // every ingested partition folded into the base; only base remains
    val bandDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/bands"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(bandDirs == Set("ingest_batch=-1"),
      s"batch partitions must fold into the base: $bandDirs")
    assert(Compaction.treeDataFileCount(spark, s"$root/bands") < filesBefore,
      "the fold must consolidate files, not multiply them")
    // ingest continues on the compacted store, and DPP still fires
    IncrementalDedup.ingestBatchWithEdges(spark, root, pairsOut, d2, batchId = 1L)
    val probe = IncrementalDedup.dedupeDelta(spark, root, all.filter(col("doc_id") % 100 === 7))
    probe.collect()
    assert(probe.queryExecution.executedPlan.toString.contains("dynamicpruning"),
      "band_bucket DPP must survive compaction")
    val maintained = IncrementalDedup.edges(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recomputed = graft.queries.TextQueries.q30MinHashLsh(spark, sfDir)
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(maintained == recomputed,
      "edges after compact-then-ingest must equal the full recompute")
  }

  test("compactStore under LIVE load: fold between micro-batches of a running stream, stream finishes green") {
    // the r10 verdict's remaining compaction scenario: the fold runs
    // INSIDE a live dedupeStreamWithEdges — at the documented safe point
    // (stream idle, every ingested batch's offset committed in the
    // checkpoint: processAllAvailable() has returned), NOT between runs.
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 < 7)
    val d1 = all.filter(col("doc_id") % 10 === 7).select("doc_id", "text")
    val d2 = all.filter(col("doc_id") % 10 > 7).select("doc_id", "text")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val root = tmpRoot("livecompact"); val pairsOut = tmpRoot("livecompact_pairs")
    val ckpt = tmpRoot("livecompact_ckpt"); val srcDir = tmpRoot("livecompact_src")
    Seq(root, pairsOut, ckpt, srcDir)
      .foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    IncrementalDedup.writeEdgeStore(spark, state, root)
    d1.write.mode("append").parquet(srcDir) // file source needs an existing dir
    val q = IncrementalDedup.dedupeStreamWithEdges(
      spark.readStream.schema("doc_id BIGINT, text STRING").parquet(srcDir),
      root, pairsOut, ckpt)
    try {
      q.processAllAvailable() // batch 0 committed — the safe point
      assert(q.isActive)
      IncrementalDedup.compactStore(spark, root) // fold WHILE the stream runs
      // every pre-compaction partition folded into the base
      val bandDirs = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/bands"))
        .filter(_.isDirectory).map(_.getPath.getName).toSet
      assert(bandDirs == Set("ingest_batch=-1"), s"fold under live load: $bandDirs")
      // the stream keeps ingesting onto the folded store
      d2.write.mode("append").parquet(srcDir)
      q.processAllAvailable()
      assert(q.isActive, "the stream must survive a mid-run fold at the safe point")
    } finally q.stop()
    val maintained = IncrementalDedup.edges(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recomputed = graft.queries.TextQueries.q30MinHashLsh(spark, sfDir)
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(maintained == recomputed,
      "edges after a live-load fold + further ingest must equal the full recompute")
  }

  test("deleteBatch: live edges ≡ recompute on corpus − removed; compaction purges; stale tombstones no-op") {
    val all = graft.core.Tables.documents(spark, sfDir)
    val root = tmpRoot("delete"); val pairsOut = tmpRoot("delete_pairs")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq(root, pairsOut).foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    IncrementalDedup.writeEdgeStore(spark, all.filter(col("doc_id") % 10 =!= 7), root)
    IncrementalDedup.ingestBatchWithEdges(
      spark, root, pairsOut, all.filter(col("doc_id") % 10 === 7), batchId = 1L)
    val removedIds = all.filter(col("doc_id") % 7 === 3).select("doc_id")
    IncrementalDedup.deleteBatch(spark, root, removedIds, batchId = 2L)
    def liveSet = IncrementalDedup.liveEdges(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // recompute on the post-delete corpus
    val sigs = graft.queries.TextQueries.minHashSignatures(
      spark, all.filter(col("doc_id") % 7 =!= 3))
    val recomputed = graft.queries.TextQueries.lshRerankedPairs(sigs)
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val preCompact = liveSet
    assert(preCompact == recomputed,
      s"live view before compaction must equal recompute: only-live=" +
        s"${preCompact -- recomputed}, only-recompute=${recomputed -- preCompact}")
    // raw view still carries the dead edges (tombstones unapplied)
    assert(IncrementalDedup.edges(spark, root).count() > preCompact.size,
      "this corpus slice must actually retract some edges for the test to bite")
    // physical purge: raw view == live view == recompute, tombstones gone
    IncrementalDedup.compactStore(spark, root)
    assert(liveSet == recomputed)
    assert(IncrementalDedup.edges(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet == recomputed,
      "compaction must purge retracted edges from the raw store")
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/tombstones")),
      "applied tombstones must truncate")
    val deadSet = removedIds.collect().map(_.getLong(0)).toSet
    val setDocs = spark.read.parquet(s"$root/sets").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(setDocs.intersect(deadSet).isEmpty, "purge must drop dead signature rows")
    // STALE TOMBSTONE (the crash window between swap and truncation,
    // simulated by re-recording the already-applied delete): reads stay
    // correct and a re-run of the compaction is a no-op that truncates
    IncrementalDedup.deleteBatch(spark, root, removedIds, batchId = 2L)
    assert(liveSet == recomputed, "stale tombstone must re-apply as a no-op")
    IncrementalDedup.compactStore(spark, root)
    assert(liveSet == recomputed)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/tombstones")))
  }

  test("supersede (q105 composed): diff classes → delete/supersede/ingest ≡ recompute on the post-diff corpus") {
    // the q105 snapshot pair: old = all but %20=5; new = all but %20=11,
    // with %20=3 rewritten — so added = %20=5, removed = %20=11,
    // changed = %20=3, and each class drives its store operation
    val all = graft.core.Tables.documents(spark, sfDir).select("doc_id", "text")
    val oldCorpus = all.filter(col("doc_id") % 20 =!= 5)
    val newText = when(col("doc_id") % 20 === 3, concat(col("text"), lit(" [rev2]")))
      .otherwise(col("text"))
    val newCorpus = all.filter(col("doc_id") % 20 =!= 11)
      .select(col("doc_id"), newText.as("text"))
    val root = tmpRoot("supersede"); val pairsOut = tmpRoot("supersede_pairs")
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    Seq(root, pairsOut).foreach(p => fs.delete(new org.apache.hadoop.fs.Path(p), true))
    IncrementalDedup.writeEdgeStore(spark, oldCorpus, root)
    // apply the diff as ONE batch: removed ∪ changed-old tombstone at
    // batch 1, added ∪ changed-new ingest at the SAME batch 1 — the
    // supersede composition from deleteBatch's contract (tombstones kill
    // strictly-earlier rows, so the re-ingest survives its own delete)
    IncrementalDedup.deleteBatch(spark, root,
      all.filter(col("doc_id") % 20 === 11 || col("doc_id") % 20 === 3)
        .select("doc_id"), batchId = 1L)
    IncrementalDedup.ingestBatchWithEdges(spark, root, pairsOut,
      newCorpus.filter(col("doc_id") % 20 === 5 || col("doc_id") % 20 === 3),
      batchId = 1L)
    def liveSet = IncrementalDedup.liveEdges(spark, root)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recomputed = graft.queries.TextQueries.lshRerankedPairs(
        graft.queries.TextQueries.minHashSignatures(spark, newCorpus))
      .filter(col("jaccard") >= 0.5).select("doc_a", "doc_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(liveSet == recomputed,
      s"diff→apply must equal recompute on the new snapshot: only-live=" +
        s"${liveSet -- recomputed}, only-recompute=${recomputed -- liveSet}")
    // physical purge keeps the superseded docs' SURVIVING rows at their
    // original batch (NOT the base) while their tombstone could still be
    // on disk — the idempotence property that makes a crash between the
    // fold swaps and the truncation recoverable by just re-running
    IncrementalDedup.compactStore(spark, root)
    assert(liveSet == recomputed)
    assert(!fs.exists(new org.apache.hadoop.fs.Path(s"$root/tombstones")))
    val bandDirs1 = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/bands"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(bandDirs1 == Set("ingest_batch=-1", "ingest_batch=1"),
      s"superseded docs' surviving rows must keep their batch through a " +
        s"delete-aware fold: $bandDirs1")
    // the crash window itself: stale tombstones re-appear AFTER the fold
    // (as if truncation never ran) — reads stay correct because the kept
    // batch-1 rows still satisfy ingest_batch >= delete_batch, and the
    // re-run fold is a no-op purge that truncates and then folds clean
    IncrementalDedup.deleteBatch(spark, root,
      all.filter(col("doc_id") % 20 === 11 || col("doc_id") % 20 === 3)
        .select("doc_id"), batchId = 1L)
    assert(liveSet == recomputed,
      "stale supersede tombstone must not re-kill the re-ingested rows")
    IncrementalDedup.compactStore(spark, root)
    assert(liveSet == recomputed)
    IncrementalDedup.compactStore(spark, root) // tombstone-free: fold all to base
    val bandDirs2 = fs.listStatus(new org.apache.hadoop.fs.Path(s"$root/bands"))
      .filter(_.isDirectory).map(_.getPath.getName).toSet
    assert(bandDirs2 == Set("ingest_batch=-1"),
      s"once tombstones truncate, the next fold consolidates fully: $bandDirs2")
    assert(liveSet == recomputed)
    // and the store keeps composing: a further delta dedupes against the
    // post-diff state (live reads proven through the ingest path itself)
    val setDocs = spark.read.parquet(s"$root/sets").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val expectDocs = newCorpus.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(setDocs == expectDocs, "post-purge signature rows = exactly the new snapshot")
  }

  test("ingesting the delta's rows into the store makes the next delta see them") {
    // two-step ingest: store(state) + delta1, then store(state ∪ delta1)
    // + delta2 — a pair (delta1, delta2) must surface in step 2
    val all = graft.core.Tables.documents(spark, sfDir)
    val state = all.filter(col("doc_id") % 10 < 6)
    val d1 = all.filter(col("doc_id") % 10 === 6)
    val d2 = all.filter(col("doc_id") % 10 > 6)
    val root = tmpRoot("twostep")
    IncrementalDedup.writeStore(spark, state.unionByName(d1), root)
    val step2 = IncrementalDedup.dedupeDelta(spark, root, d2)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val expect = graft.queries.TextQueries.q30MinHashLsh(spark, sfDir)
      .filter(col("doc_a") % 10 > 6 || col("doc_b") % 10 > 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(step2 == expect)
  }
}
