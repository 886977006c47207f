package graft.tools

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.functions._

/** Per-PHASE spill attribution for the PQ store build (r15 verdict #7:
  * "measure whether the 18–51 GiB min_by spill is the encode argmin or
  * the store write"). Runs the writeIndex pipeline one phase at a time
  * under the probe heap — coarse k-means fit, PQ codebook train, the
  * encode argmin as a pure aggregation (count, no write), then the
  * partitioned store write — and reports each phase's spill total from
  * the stage listener, so the spilling stage lands unambiguously in one
  * named phase (SpillProbe's callsite attribution goes blind on
  * broadcast-thread jobs).
  *
  * usage: BuildSpillProbe <sfDir> [raw|residual]
  */
object BuildSpillProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/tmp/graft_sf10")
    val residual = args.lift(1).forall(_ == "residual")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = graft.core.Sessions.builder(s"local[$cpus]", cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.core.Sessions.deriveShuffle(spark, sfDir, cpus.toInt)

    val spill = new java.util.concurrent.atomic.AtomicLong()
    val stages = new ConcurrentHashMap[Int, Long]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val m = sc.stageInfo.taskMetrics
        if (m != null && m.memoryBytesSpilled > 0) {
          spill.addAndGet(m.memoryBytesSpilled)
          stages.put(sc.stageInfo.stageId, m.memoryBytesSpilled)
          ()
        }
      }
    })
    // operator-level attribution: after each query, walk the executed
    // plan (through AQE and shuffle-stage wrappers) and print every
    // node with a non-zero spill metric — the stage listener can say
    // only WHICH stage spilled, not which operator
    spark.listenerManager.register(new org.apache.spark.sql.util.QueryExecutionListener {
      private def walk(p: org.apache.spark.sql.execution.SparkPlan): Seq[(String, Long)] = {
        val here = p.metrics.toSeq.collect {
          case (k, m) if k.toLowerCase.contains("spill") && m.value > 0 =>
            (s"${p.nodeName}.$k", m.value)
        }
        val kids = p match {
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case q: org.apache.spark.sql.execution.adaptive.QueryStageExec => Seq(q.plan)
          case r: org.apache.spark.sql.execution.ReusedSubqueryExec => Seq(r.child)
          case _ => p.children
        }
        here ++ kids.flatMap(walk) ++ p.subqueries.flatMap(walk)
      }
      override def onSuccess(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit =
        walk(qe.executedPlan).groupBy(_._1).foreach { case (op, vs) =>
          println(f"[buildspill]   op=$op spill=${vs.map(_._2).sum / 1e9}%.2fGB")
        }
      override def onFailure(funcName: String, qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    })
    def phase[T](name: String)(f: => T): T = {
      val before = spill.get()
      val t0 = System.nanoTime()
      val r = f
      Thread.sleep(1500) // listener drain, best effort
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[buildspill] phase=$name%-14s memSpill=${(spill.get() - before) / 1e9}%8.2fGB sec=$dt%7.1f")
      r
    }

    val root = s"/tmp/graft_buildspill_${java.util.UUID.randomUUID().toString.take(8)}"
    val fs = org.apache.hadoop.fs.FileSystem.get(spark.sparkContext.hadoopConfiguration)
    val e = graft.core.Tables.embeddings(spark, sfDir).select("vec_id", "embedding")
    val n = e.count()
    val kk = graft.operators.IncrementalIvf.kFor(n)
    val kss = graft.ml.ProductQuantizer.ksFor(n)
    println(s"[buildspill] n=$n k=$kk ks=$kss residual=$residual heap=${Runtime.getRuntime.maxMemory() / (1 << 20)}MB")

    val cents = phase("coarse_fit") {
      val (c, _) = graft.ml.KMeans.fit(e, kk, 2); c
    }
    phase("coarse_write") {
      cents.coalesce(1).write.mode("overwrite").parquet(s"$root/centroids")
    }
    val trainSrc = if (residual) {
      val asg = graft.ml.KMeans.assign(e, cents).select(col("vec_id"), col("cid"))
      e.join(asg, Seq("vec_id"))
        .join(broadcast(cents.select(col("cid"), col("centroid"))), Seq("cid"))
        .select(col("vec_id"), col("cid"),
          zip_with(col("embedding"), col("centroid"), (x, c) => x.cast("double") - c)
            .as("embedding"))
    } else e
    val book = phase("pq_train") {
      graft.ml.ProductQuantizer.train(trainSrc.select("vec_id", "embedding"), 64, 8, kss, 2, denom = 4)
    }
    val codes = graft.ml.ProductQuantizer.encode(trainSrc.select("vec_id", "embedding"), book, 64, 8)
    phase("encode_agg") { codes.count() } // the min_by argmin alone, no write
    val asg2 = graft.ml.KMeans.assign(e, cents).select(col("vec_id"), col("cid"))
    phase("join_count") { codes.join(asg2, Seq("vec_id")).count() }
    phase("write_flat") {
      codes.join(asg2, Seq("vec_id")).withColumn("ingest_batch", lit(-1L))
        .write.mode("overwrite").parquet(s"$root/codes_flat")
    }
    phase("encode_write") {
      codes.join(asg2, Seq("vec_id")).withColumn("ingest_batch", lit(-1L))
        .write.mode("overwrite").partitionBy("ingest_batch", "cid")
        .parquet(s"$root/codes")
    }
    cents.unpersist()
    fs.delete(new org.apache.hadoop.fs.Path(root), true)
    println(s"[buildspill] total=${spill.get() / 1e9}GB stages=${stages.size()}")
    spark.stop()
  }
}
