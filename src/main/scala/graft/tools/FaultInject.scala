package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerExecutorRemoved}
import org.apache.spark.sql.functions._

/** Executor-loss fault injection — the failure mode the store-writing
  * queries' idempotence story (batch-keyed dynamic overwrite, two-rename
  * swaps, deterministic salts) must survive but a single-JVM run can
  * never exercise: a REAL task retry after a lost executor. Runs one
  * query on a standalone cluster, `kill -9`s one of this app's executor
  * JVMs `killAfterSec` into the run, lets Spark retry the lost tasks on
  * the surviving executors (standalone relaunches the executor slot),
  * and prints the same order-independent fingerprint as
  * [[ClusterParity]] — compare against the undisturbed run's hash.
  *
  * A SparkListener counts ExecutorRemoved events so the output PROVES
  * the fault landed mid-query (executors_removed ≥ 1) rather than after
  * the job finished.
  *
  * Usage: `FaultInject <masterUrl> <sfDir> <queryName> <killAfterSec>
  * [executor|worker]` — `worker` kills a standalone Worker DAEMON
  * instead: its executor dies with it (the executor's WorkerWatcher
  * exits when the worker connection drops), the master marks the worker
  * DEAD, and no replacement slot comes back — the surviving executors
  * must absorb the retried tasks AND the lost capacity, the harsher
  * variant of the same fault.
  * Env: same as ClusterParity (SPARK_GRAFT_EXEC_MEM/CORES/JAR).
  */
object FaultInject {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4,
      "usage: FaultInject <masterUrl> <sfDir> <queryName> <killAfterSec> [executor|worker]")
    val Array(master, sfDir, queryName, killAfter) = args.take(4)
    val killTarget = args.lift(4).getOrElse("executor")
    var b = graft.core.Sessions.builder(master, sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
    sys.env.get("SPARK_GRAFT_EXEC_MEM").foreach(m => b = b.config("spark.executor.memory", m))
    sys.env.get("SPARK_GRAFT_EXEC_CORES").foreach(c => b = b.config("spark.executor.cores", c))
    sys.env.get("SPARK_GRAFT_JAR").foreach(j => b = b.config("spark.jars", j))
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val removed = new java.util.concurrent.atomic.AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onExecutorRemoved(e: SparkListenerExecutorRemoved): Unit = {
        removed.incrementAndGet(); ()
      }
    })
    graft.core.Tables.lineitem(spark, sfDir).limit(1).count() // executors up
    val appId = spark.sparkContext.applicationId
    val killedPid = new java.util.concurrent.atomic.AtomicLong(-1L)

    val killer = new Thread(() => {
      Thread.sleep(killAfter.toLong * 1000L)
      import scala.jdk.CollectionConverters._
      // executor mode: one of THIS app's executor JVMs
      // (CoarseGrainedExecutorBackend --app-id <appId>); worker mode: a
      // standalone Worker daemon (its executor dies via WorkerWatcher)
      val victims = ProcessHandle.allProcesses().iterator().asScala.filter { p =>
        val cmd = p.info().commandLine().orElse("")
        if (killTarget == "worker") cmd.contains("deploy.worker.Worker")
        else cmd.contains("CoarseGrainedExecutorBackend") && cmd.contains(appId)
      }.toSeq.sortBy(_.pid())
      victims.lastOption.foreach { p =>
        killedPid.set(p.pid())
        System.err.println(s"[fault] kill -9 $killTarget pid=${p.pid()}")
        p.destroyForcibly()
        ()
      }
    }, "executor-killer")
    killer.setDaemon(true)
    killer.start()

    val t0 = System.nanoTime()
    val (h, n) = ClusterParity.fingerprint(
      graft.SparkEntry.queries(queryName)(spark, sfDir))
    val dt = (System.nanoTime() - t0) / 1e9
    println(s"""{"query":"$queryName","master":"$master","sf":"$sfDir",""" +
      s""""killed_pid":${killedPid.get()},"executors_removed":${removed.get()},""" +
      s""""hash":"$h","rows":$n,"sec":${f"$dt%.3f"}}""")
    spark.stop()
  }
}
