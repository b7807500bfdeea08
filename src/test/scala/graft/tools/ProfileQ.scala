package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerJobStart}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

/** Per-query runtime profile for bench forensics: run each named registry
  * query twice (cold then warm) and report, for the WARM run, the number
  * of jobs/stages/tasks, summed executor task time, shuffle bytes and
  * records, and wall time. Distinguishes overhead-bound queries (wall >>
  * task time / cores) from compute-bound ones, which the formatted plan
  * alone cannot (guide §1/§7.1 without a UI).
  */
object ProfileQ {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskTimeMs = new AtomicLong
    val shufReadB = new AtomicLong
    val shufWriteB = new AtomicLong
    val inputB = new AtomicLong
    val stageRows =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long, Long, Long)]
    val listener = new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        tasks.addAndGet(s.stageInfo.numTasks)
        val m = s.stageInfo.taskMetrics
        if (m != null) {
          taskTimeMs.addAndGet(m.executorRunTime)
          shufReadB.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufWriteB.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          inputB.addAndGet(m.inputMetrics.bytesRead)
          stageRows.add((s.stageInfo.name.takeWhile(_ != '\n').take(90),
            s.stageInfo.numTasks, m.executorRunTime,
            m.shuffleReadMetrics.recordsRead,
            m.shuffleWriteMetrics.recordsWritten))
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    def reset(): Unit = {
      jobs.set(0); stages.set(0); tasks.set(0); taskTimeMs.set(0)
      shufReadB.set(0); shufWriteB.set(0); inputB.set(0)
      stageRows.clear()
    }
    val verbose = sys.env.get("PROFQ_STAGES").contains("1")
    for (name <- args) {
      val fn = graft.SparkEntry.queries(name)
      // cold run to absorb codegen/JIT, then one profiled warm run
      graft.ops.CacheScope.withCaches(spark) { fn(spark, dir).count() }
      Thread.sleep(300) // drain the listener bus
      reset()
      val t0 = System.nanoTime()
      graft.ops.CacheScope.withCaches(spark) { fn(spark, dir).count() }
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300)
      println(f"PROFQ $name%-36s wall=$wall%6.2fs jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%4d tasks=${tasks.get}%5d " +
        f"taskTime=${taskTimeMs.get / 1e3}%7.2fs " +
        f"shufR=${shufReadB.get / 1e6}%8.1fMB shufW=${shufWriteB.get / 1e6}%8.1fMB " +
        f"input=${inputB.get / 1e6}%8.1fMB")
      if (verbose) {
        import scala.jdk.CollectionConverters._
        stageRows.asScala.toSeq.sortBy(-_._3).take(14).foreach {
          case (n, t, ms, rr, rw) =>
            println(f"  STAGE ${ms / 1e3}%7.2fs tasks=$t%4d recR=$rr%9d recW=$rw%9d  $n")
        }
      }
      if (sys.env.get("PROFQ_PLAN").contains("1")) {
        // executed plan AFTER the action: AQE final plan with runtime stats
        val df = fn(spark, dir)
        graft.ops.CacheScope.withCaches(spark) {
          df.count()
          println(s"==== EXECUTED $name ====")
          println(df.queryExecution.executedPlan.toString)
        }
      }
    }
    spark.stop()
  }
}
