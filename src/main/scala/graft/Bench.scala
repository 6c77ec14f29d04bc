package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs the declared query inventory on
  * `SPARK_GRAFT_SF_DIR`, prints ONE JSON line with per-query seconds.
  *
  * Each query is forced through the `noop` sink — unlike `count()`, which
  * lets Catalyst prune the projections away, noop executes the full plan
  * including result expression evaluation, so timings reflect real work.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      // local[32] single-JVM: default page size scales with heap and makes
      // every sort/agg task zero out ~64MB pages — GC storms that tax
      // random later queries (profiled). Rows here are small; 2m is ample.
      .config("spark.buffer.pageSize", "2m")
      // async ref cleanup: the cleaner's blocking removeBroadcast/removeRDD
      // RPCs serialize through the BlockManagerMaster endpoint and stall
      // task-side block ops for seconds after GC bursts
      .config("spark.cleaner.referenceTracking.blocking", "false")
      // shuffle/broadcast scratch on tmpfs: the sandbox VM's disk has
      // multi-second write-burst stalls that surface as random query spikes
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm the session (codegen paths, parquet footer cache, scheduler) so
    // the alphabetically-first query doesn't absorb one-time costs. NB: a
    // full-inventory warm-up pass at sf0.001 was tried and made things
    // WORSE (doubles codegen/JIT churn -> more compile-queue stalls).
    spark.range(1000).selectExpr("md5(cast(id as string)) m")
      .write.format("noop").mode("overwrite").save()
    Tables.all.foreach { t =>
      val df = if (t == "events") Tables.events(spark, sfDir)
               else Tables.load(spark, sfDir, t)
      df.write.format("noop").mode("overwrite").save()
    }

    import scala.jdk.CollectionConverters._
    def gcMs: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum
    // watchdog: if a query stalls >10s, dump thread stacks once (debug aid
    // for the sporadic zero-GC stalls; remove once diagnosed)
    @volatile var current = ""
    @volatile var started = 0L
    val watchdog = new Thread(() => {
      var dumped = ""
      while (true) {
        Thread.sleep(1000)
        val name = current
        if (name.nonEmpty && name != dumped &&
            (System.nanoTime() - started) / 1e9 > 10) {
          dumped = name
          System.err.println(s"[watchdog] $name stalled >10s; stacks:")
          Thread.getAllStackTraces.forEach { (t, st) =>
            if (st.nonEmpty && !t.getName.contains("watchdog")) {
              val top = st.take(6).mkString(" <- ")
              if (!top.contains("Unsafe.park") && !top.contains("Object.wait"))
                System.err.println(s"[watchdog]   ${t.getName} (${t.getState}): $top")
            }
          }
        }
      }
    })
    watchdog.setDaemon(true)
    watchdog.setName("graft-watchdog")
    watchdog.start()

    val results = SparkEntry.defs.sortBy(_.name).map { q =>
      val g0 = gcMs
      val t0 = System.nanoTime()
      current = q.name; started = t0
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] ${q.name} failed: ${e.getMessage}")
      }
      val sec = (System.nanoTime() - t0) / 1e9
      if (sec > 3) System.err.println(
        f"[bench-slow] ${q.name} ${sec}%.1fs gc=${gcMs - g0}ms")
      q.name -> sec
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
