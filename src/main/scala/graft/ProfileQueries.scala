package graft

import org.apache.spark.scheduler._
import java.util.concurrent.ConcurrentHashMap
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Throwaway per-query cost profiler (not part of the driver contract; run
  * by hand while optimizing). For each named query: two warm-up runs, then
  * a measured run that decomposes wall time into scheduled-task time vs
  * everything else (planning, job submission gaps, driver-side work).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... java ... graft.ProfileQueries q1 q2 ...
  * (no args = every registered query, sorted by name).
  */
object ProfileQueries {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local("profile-queries")
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong    // sum of executor task run time
    val cpuMs = new AtomicLong     // sum of executor task CPU time
    val deserMs = new AtomicLong   // sum of task deserialize time
    val gcMs = new AtomicLong
    val stageWallMs = new AtomicLong // sum of per-stage wall (submit->complete)
    val verbose = sys.env.contains("PROFILE_JOBS")
    val jobStart = new ConcurrentHashMap[Int, (Long, String)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        if (verbose) jobStart.put(e.jobId,
          (System.nanoTime(),
            Option(e.properties).map(_.getProperty("spark.job.description", ""))
              .getOrElse("").take(90)))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        if (verbose) Option(jobStart.get(e.jobId)).foreach { case (t0, desc) =>
          println(f"    job ${e.jobId}%4d ${(System.nanoTime() - t0) / 1e6}%8.1f ms  $desc")
        }
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        val si = e.stageInfo
        for (s <- si.submissionTime; c <- si.completionTime)
          stageWallMs.addAndGet(c - s)
        if (verbose) {
          val m = si.taskMetrics
          println(f"    stage ${si.stageId}%4d tasks=${si.numTasks}%3d " +
            f"run=${if (m != null) m.executorRunTime else -1}%6d ms " +
            f"cpu=${if (m != null) m.executorCpuTime / 1000000 else -1}%6d ms  " +
            si.name.take(70))
        }
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        if (e.taskMetrics != null) {
          taskMs.addAndGet(e.taskMetrics.executorRunTime)
          cpuMs.addAndGet(e.taskMetrics.executorCpuTime / 1000000)
          deserMs.addAndGet(e.taskMetrics.executorDeserializeTime)
          gcMs.addAndGet(e.taskMetrics.jvmGCTime)
        }
      }
    })

    val names: Seq[String] =
      if (args.nonEmpty) args.toSeq
      else SparkEntry.queries.keys.toSeq.sorted
    println(f"${"query"}%-28s ${"wall"}%7s ${"jobs"}%5s ${"stage"}%6s ${"tasks"}%6s ${"taskS"}%7s ${"cpuS"}%6s ${"deserS"}%7s ${"stgWall"}%8s ${"gcS"}%6s")
    names.foreach { n =>
      val q = SparkEntry.queries(n)
      q(spark, sfDir).count(); q(spark, sfDir).count() // warm
      Seq(jobs, stages, tasks).foreach(_.set(0))
      Seq(taskMs, cpuMs, deserMs, gcMs, stageWallMs).foreach(_.set(0))
      val t0 = System.nanoTime()
      q(spark, sfDir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      // listener bus is async — give it a beat before reading counters
      Thread.sleep(150)
      println(f"$n%-28s $wall%7.3f ${jobs.get}%5d ${stages.get}%6d ${tasks.get}%6d ${taskMs.get / 1e3}%7.2f ${cpuMs.get / 1e3}%6.2f ${deserMs.get / 1e3}%7.2f ${stageWallMs.get / 1e3}%8.2f ${gcMs.get / 1e3}%6.2f")
    }
    spark.stop()
  }
}
