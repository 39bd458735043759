package graft

import scala.collection.mutable

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Round-12 optimization instrument: run named queries with a
  * stage-metrics listener and print, per query, every completed stage's
  * wall time, task count, shuffle read/write bytes and row counts — the
  * Spark-UI stage table for a UI-less sandbox (guide §1/§7).
  *
  * Usage:
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.ProfileSome <sfDir> q1,q2,..."
  *
  * Measurement-only tool: never run by the driver, writes nothing.
  */
object ProfileSome {
  def main(args: Array[String]): Unit = {
    val Array(dir, names) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Tables.sessionDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_AQE", "true"))
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    case class St(name: String, ms: Long, tasks: Int, shRead: Long,
        shWrite: Long, inRows: Long, outRows: Long, spill: Long)
    val stages = mutable.ArrayBuffer[St]()
    val stageJob = mutable.Map[Int, String]() // stageId -> job callsite
    var jobs = 0
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = synchronized {
        jobs += 1
        val site = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        js.stageIds.foreach(id => stageJob(id) = s"job#${js.jobId} $site")
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = synchronized {
        val i = sc.stageInfo
        val m = i.taskMetrics
        val ms = (for {s <- i.submissionTime; c <- i.completionTime} yield c - s).getOrElse(-1L)
        stages += St(stageJob.getOrElse(i.stageId, "?") + " | " +
          i.name.takeWhile(_ != '\n').take(40), ms, i.numTasks,
          m.shuffleReadMetrics.totalBytesRead, m.shuffleWriteMetrics.bytesWritten,
          m.inputMetrics.recordsRead, m.outputMetrics.recordsWritten,
          m.memoryBytesSpilled)
      }
    }
    spark.sparkContext.addSparkListener(listener)

    // Bench-equivalent warmup
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Tables.names.foreach(n => Tables(spark, dir, n).count())
    graft.ts.TrendFit.fitSeries(
      (0 until 30).map(_.toDouble).toArray,
      (0 until 30).map(i => math.sin(i.toDouble)).toArray)
    locally {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      (1 to 512).map(i => s"warm up the shingle kernel number $i of many")
        .toDF("text")
        .select(array_distinct(graft.functions.TextFunctions.shingles($"text")))
        .write.format("noop").mode("overwrite").save()
    }
    graft.queries.KgPipeline.kg(spark, dir)
    graft.queries.Relational.graphBuild(spark, dir).count()
    val keep = Caches.persistentIds(spark)

    names.split(',').map(_.trim).filter(_.nonEmpty).foreach { name =>
      if (name == "@graph_build") {
        // special probe: time the session graph-index build itself by
        // sweeping EVERYTHING (including the keep-set) so blocksAlive
        // forces a rebuild
        (1 to 2).foreach { r =>
          Caches.sweep(spark, Set.empty)
          stages.synchronized(stages.clear()); jobs = 0
          val t0 = System.nanoTime()
          graft.queries.Relational.graphBuild(spark, dir).count()
          val sec = (System.nanoTime() - t0) / 1e9
          println(f"== @graph_build run $r: $sec%.3f s, $jobs jobs, ${stages.size} stages")
          stages.sortBy(-_.ms).take(10).foreach { s =>
            println(f"   ${s.ms}%6d ms  tasks=${s.tasks}%3d  shR=${s.shRead}%9d shW=${s.shWrite}%9d inRows=${s.inRows}%9d  ${s.name}")
          }
        }
      } else {
      // one untimed run to warm codegen/JIT for this query, then measure
      val runs = sys.env.getOrElse("SPARK_GRAFT_PROFILE_RUNS", "2").toInt
      var best = Double.MaxValue
      (1 to runs).foreach { r =>
        Caches.sweep(spark, keep)
        spark.sparkContext.setJobDescription(s"$name run $r")
        stages.synchronized(stages.clear()); jobs = 0
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val stageMs = stages.map(_.ms.max(0)).sum
        println(f"== $name run $r: $sec%.3f s, $jobs jobs, ${stages.size} stages, sum(stage ms)=$stageMs")
        if (r == runs || sec < best) {
          best = best.min(sec)
          val top = stages.sortBy(-_.ms).take(14)
          top.foreach { s =>
            println(f"   ${s.ms}%6d ms  tasks=${s.tasks}%3d  shR=${s.shRead}%9d shW=${s.shWrite}%9d inRows=${s.inRows}%9d spill=${s.spill}%8d  ${s.name}")
          }
        }
      }
      Caches.sweep(spark, keep)
      }
    }
    spark.stop()
  }
}
