package graft.tools

import scala.collection.mutable

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** r18 per-gate profiler (guide §1/§7): run named SparkEntry queries once
  * with a SparkListener attached and print every JOB's wall ms, stage
  * count, task time, shuffle bytes and description — the local[n] stand-in
  * for the Spark UI's Jobs/Stages pages (the bench runs with the UI off).
  * Streaming gates profile fine: their inner actions are jobs too.
  *
  * Usage: runMain graft.tools.Profile <name> [more names]
  *   SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32) */
object Profile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    final case class Job(id: Int, var desc: String, var t0: Long = 0L,
      var wallMs: Long = 0L, var stages: Int = 0, var tasks: Int = 0,
      var taskMs: Long = 0L, var shufR: Long = 0L, var shufW: Long = 0L,
      var input: Long = 0L)
    val jobs = mutable.LinkedHashMap[Int, Job]()
    val stageToJob = mutable.Map[Int, Int]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val d = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.short"))))
          .getOrElse("")
        jobs.synchronized {
          jobs(e.jobId) = Job(e.jobId, d, t0 = e.time,
            stages = e.stageIds.size)
          e.stageIds.foreach(sid => stageToJob(sid) = e.jobId)
        }
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit =
        jobs.synchronized {
          jobs.get(e.jobId).foreach(j => j.wallMs = e.time - j.t0)
        }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit =
        jobs.synchronized {
          stageToJob.get(e.stageId).flatMap(jobs.get).foreach { j =>
            j.tasks += 1
            val m = e.taskMetrics
            if (m != null) {
              j.taskMs += m.executorRunTime
              j.shufR += m.shuffleReadMetrics.totalBytesRead
              j.shufW += m.shuffleWriteMetrics.bytesWritten
              j.input += m.inputMetrics.bytesRead
            }
          }
        }
    }
    spark.sparkContext.addSparkListener(listener)

    args.foreach { name =>
      jobs.synchronized { jobs.clear(); stageToJob.clear() }
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val tBuild = (System.nanoTime() - t0) / 1e9
      df.write.format("noop").mode("overwrite").save()
      val tAll = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // let the listener bus drain (private API otherwise)
      println(f"\n==== $name total=$tAll%.2f s (build=$tBuild%.2f s, " +
        f"jobs=${jobs.size}) $dir")
      val snap = jobs.synchronized(jobs.values.toVector)
      val totalWall = snap.map(_.wallMs).sum
      println(f"  sum(job wall)=${totalWall / 1000.0}%.2f s")
      snap.sortBy(-_.wallMs).take(40).foreach { j =>
        println(f"  job=${j.id}%4d wall=${j.wallMs}%6d ms stages=${j.stages}%2d " +
          f"tasks=${j.tasks}%4d taskTime=${j.taskMs}%7d ms in=${j.input / 1024}%8d KiB " +
          f"shufR=${j.shufR / 1024}%6d KiB shufW=${j.shufW / 1024}%6d KiB  ${j.desc.take(90)}")
      }
    }
    spark.stop()
  }
}
