package graft.tools

import org.apache.spark.scheduler._
import scala.collection.concurrent.TrieMap

/** Diagnostic main (NOT part of the driver contract): run ONE registry
  * query with a SparkListener and decompose its wall time into Spark jobs
  * and the engine's internal phases (graft.lake.Timing counters around
  * merge probe / write / stats / commit / log reads) — the measure-first
  * step of the optimization guide (§1) for the micro-batch lifecycle
  * gates whose cost is fixed per-operation overhead rather than data
  * volume.
  *
  *   sbt "runMain graft.tools.Profile st29_neardup_clusters [iters]"
  */
object Profile {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.timing", "true")
    val name = args(0)
    val iters = if (args.length > 1) args(1).toInt else 1
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.builder(cpus).getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.queries.Registry.cleanStaleScratch()
    val fn = graft.SparkEntry.queries(name)

    // warm-up (JIT + codegen + page cache), untimed
    fn(spark, sfDir).count()

    case class J(id: Int, t0: Long, t1: Long, tasks: Int, execRunMs: Long)
    val done = new java.util.concurrent.ConcurrentLinkedQueue[J]()
    val starts = TrieMap.empty[Int, (Long, Int)]
    val stageRun = TrieMap.empty[Int, Long]
    val stageOfJob = TrieMap.empty[Int, Seq[Int]]
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        starts(e.jobId) = (e.time, e.stageInfos.map(_.numTasks).sum)
        stageOfJob(e.jobId) = e.stageInfos.map(_.stageId)
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stageRun(e.stageInfo.stageId) = e.stageInfo.taskMetrics.executorRunTime
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        starts.remove(e.jobId).foreach { case (t0, nt) =>
          val run = stageOfJob.getOrElse(e.jobId, Nil).flatMap(stageRun.get).sum
          done.add(J(e.jobId, t0, e.time, nt, run))
        }
    }
    spark.sparkContext.addSparkListener(listener)

    // Catalyst phase accounting: parsing/analysis/optimization/planning ms
    // summed over every executed query (QueryPlanningTracker)
    val phases = TrieMap.empty[String, Long].withDefaultValue(0L)
    @volatile var nExec = 0L
    @volatile var execNs = 0L
    val qel = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             durationNs: Long): Unit = {
        nExec += 1; execNs += durationNs
        qe.tracker.phases.foreach { case (p, s) =>
          phases.synchronized {
            phases(p) = phases(p) + (s.endTimeMs - s.startTimeMs) }
        }
      }
      override def onFailure(funcName: String,
                             qe: org.apache.spark.sql.execution.QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(qel)

    (1 to iters).foreach { it =>
      done.clear()
      phases.clear(); nExec = 0L; execNs = 0L
      graft.lake.Timing.reset()
      val w0 = System.currentTimeMillis()
      fn(spark, sfDir).count()
      val w1 = System.currentTimeMillis()
      Thread.sleep(500) // let the listener bus drain (no public wait API)
      import scala.jdk.CollectionConverters._
      val js = done.asScala.toSeq.sortBy(_.t0)
      var covered = 0L; var cursor = w0
      js.foreach { j =>
        val s = math.max(j.t0, cursor); val e = math.max(s, j.t1)
        if (e > s) { covered += e - s; cursor = e }
      }
      val wall = w1 - w0
      println(f"== $name iter $it: wall ${wall / 1000.0}%.2f s, " +
        f"jobs ${js.size}, job-covered ${covered / 1000.0}%.2f s, " +
        f"driver gaps ${(wall - covered) / 1000.0}%.2f s, " +
        f"tasks ${js.map(_.tasks).sum}, execRun ${js.map(_.execRunMs).sum / 1000.0}%.1f s")
      println(f"-- catalyst: nExec=$nExec execNs=${execNs / 1e9}%.1f s, phases(ms): " +
        phases.toSeq.sortBy(-_._2).map { case (p, ms) => s"$p=$ms" }.mkString(" "))
      println("-- top jobs by duration (ms, tasks, execRunMs):")
      js.sortBy(j => -(j.t1 - j.t0)).take(25).foreach { j =>
        println(f"  job ${j.id}%4d  ${j.t1 - j.t0}%6d ms  tasks=${j.tasks}%5d  execRun=${j.execRunMs}%6d")
      }
      val hist = js.groupBy(j => j.tasks).toSeq.sortBy(_._1)
      println("-- jobs by task count: " + hist.map { case (t, g) =>
        s"$t:${g.size}" }.mkString(" "))
      println("-- engine phases (wall ms, count) — nested keys overlap:")
      graft.lake.Timing.report().foreach { case (k, ms, n) =>
        println(f"$ms%9.0f ms  n=$n%-5d $k")
      }
    }
    spark.stop()
  }
}
