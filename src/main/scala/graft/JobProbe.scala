package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}

/** Dev-only: run one query and print every Spark JOB it schedules with
  * wall duration and description — the fixed-job-latency attribution
  * tool for lifecycle queries (they are job-count-bound at test SFs).
  * Usage: runMain graft.JobProbe <sfDir> <query> [runs]
  */
object JobProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val name = args(1)
    val runs = if (args.length > 2) args(2).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Engine.configure(spark)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    val stageJob = new java.util.concurrent.ConcurrentHashMap[Int, Int]()
    val taskMs = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    val taskN = new java.util.concurrent.ConcurrentHashMap[Int, java.util.concurrent.atomic.AtomicLong]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = {
        val desc = Option(js.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(js.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("?")
        js.stageIds.foreach(sid => stageJob.put(sid, js.jobId))
        jobs.put(js.jobId, (js.time, desc))
      }
      override def onTaskEnd(te: org.apache.spark.scheduler.SparkListenerTaskEnd): Unit = {
        Option(stageJob.get(te.stageId)).foreach { jid =>
          taskMs.computeIfAbsent(jid, _ => new java.util.concurrent.atomic.AtomicLong)
            .addAndGet(Option(te.taskMetrics).map(_.executorRunTime).getOrElse(0L))
          taskN.computeIfAbsent(jid, _ => new java.util.concurrent.atomic.AtomicLong)
            .incrementAndGet()
        }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = {
        Option(jobs.remove(je.jobId)).foreach { case (t0, desc) =>
          done.add((je.jobId, je.time - t0, desc))
        }
      }
    })
    def force(df: org.apache.spark.sql.DataFrame): Unit = {
      import org.apache.spark.sql.functions._
      df.agg(sum(xxhash64(struct(df.columns.map(col): _*)))).collect(); ()
    }
    // warm
    try force(SparkEntry.queries(name)(spark, "/root/testdata/sf0.001"))
    catch { case _: Throwable => () }
    try force(SparkEntry.queries(name)(spark, sfDir))
    catch { case _: Throwable => () }
    (1 to runs).foreach { r =>
      done.clear()
      val t0 = System.nanoTime()
      force(SparkEntry.queries(name)(spark, sfDir))
      val total = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // let the listener bus drain
      import scala.jdk.CollectionConverters._
      val ds = done.asScala.toSeq.sortBy(_._1)
      println(f"JOBPROBE run=$r total=$total%.2fs jobs=${ds.size} " +
        f"jobTime=${ds.map(_._2).sum / 1000.0}%.2fs")
      ds.foreach { case (id, ms, desc) =>
        val tms = Option(taskMs.get(id)).map(_.get).getOrElse(0L)
        val tn = Option(taskN.get(id)).map(_.get).getOrElse(0L)
        println(f"  job#$id%-4d wall=${ms / 1000.0}%6.3fs " +
          f"task=${tms / 1000.0}%6.3fs n=$tn%-3d ${desc.take(90)}")
      }
    }
    spark.stop()
  }
}
