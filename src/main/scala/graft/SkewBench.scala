package graft

import org.apache.spark.sql.functions._

/** Reproducible skew-join experiment (PERF_NOTES round 12): on a
  * genuinely skewed key distribution, compare
  *
  *   (a) plain shuffle join, AQE skew-splitting OFF — the naive plan whose
  *       hot partition serializes the stage;
  *   (b) plain join with `spark.sql.adaptive.skewJoin` ON — Spark's
  *       idiomatic production answer (zero code change, runtime split);
  *   (c) `Skew.saltedJoin` — the manual override, paying deliberate ×B dim
  *       replication for a deterministic split that works even where AQE
  *       can't see the skew (e.g. non-last-stage joins or stats-blind
  *       sources).
  *
  * The fact side derives from lineitem replicated `REP`× with l_suppkey
  * remapped so ~50% of rows land on one key (the verdict-prescribed
  * distribution); the dim side is supplier. All three variants compute the
  * same per-supplier aggregate; results are asserted identical before any
  * timing is trusted.
  *
  * Run: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.SkewBench"
  */
object SkewBench {
  def main(args: Array[String]): Unit = {
    val cfg = GraftConfig.load(args, defaults = GraftConfig.Default.copy(parallelism = 32))
    val spark = cfg.sessionBuilder("graft-skewbench")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.buffer.pageSize", "2m")
      .config("spark.cleaner.referenceTracking.blocking", "false")
      .config("spark.local.dir",
        sys.env.getOrElse("SPARK_LOCAL_DIRS", "/dev/shm/spark-graft"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val rep = sys.env.getOrElse("GRAFT_SKEW_REP", "20").toInt
    // ~50% of fact rows on suppkey 7, the rest uniform over the dim keys
    val fact = Tables.lineitem(spark, cfg.sfDir)
      .select(col("l_suppkey"), col("l_quantity"), col("l_orderkey"))
      .crossJoin(spark.range(rep).select(col("id").as("r")))
      .select(
        when(pmod(col("l_orderkey") + col("r"), lit(2)) === 0, lit(7L))
          .otherwise(col("l_suppkey")).as("k"),
        col("l_quantity"))
      .persist()
    val dim = Tables.supplier(spark, cfg.sfDir)
      .select(col("s_suppkey").as("k"), col("s_name"))
    val nFact = fact.count() // materialize outside the timed region
    System.err.println(s"[skewbench] fact rows = $nFact (rep=$rep)")

    def agg(joined: org.apache.spark.sql.DataFrame) =
      joined.groupBy("k", "s_name").agg(
        count(lit(1)).as("n"), sum("l_quantity").as("qty"))

    def time(label: String, confs: Map[String, String])(
        mk: () => org.apache.spark.sql.DataFrame): (String, Double, Long) = {
      val saved = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
      confs.foreach { case (k, v) => spark.conf.set(k, v) }
      try {
        // one warm pass (codegen), then the timed median of 3
        mk().write.format("noop").mode("overwrite").save()
        val secs = (1 to 3).map { _ =>
          val t0 = System.nanoTime()
          mk().write.format("noop").mode("overwrite").save()
          (System.nanoTime() - t0) / 1e9
        }.sorted
        // canonical digest of the aggregated rows (they are group-level,
        // small): count-only comparison would miss a variant that
        // duplicates/drops fact rows within existing groups
        val digest = mk().collect()
          .map(_.toSeq.map(String.valueOf(_)).mkString("|"))
          .sorted.mkString("\n").hashCode
        (label, secs(1), digest)
      } finally saved.foreach {
        case (k, Some(v)) => spark.conf.set(k, v)
        case (k, None) => spark.conf.unset(k)
      }
    }

    val base = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force shuffle joins
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8MB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "8MB")
    val results = Seq(
      time("plain_no_aqe_split", base + ("spark.sql.adaptive.skewJoin.enabled" -> "false"))(
        () => agg(fact.join(dim, "k"))),
      time("plain_aqe_skewjoin", base + ("spark.sql.adaptive.skewJoin.enabled" -> "true"))(
        () => agg(fact.join(dim, "k"))),
      time("salted_b16", base + ("spark.sql.adaptive.skewJoin.enabled" -> "false"))(
        () => agg(graft.api.Skew.saltedJoin(fact, dim, "k", buckets = 16))))

    // identical results or the timings are meaningless
    val digests = results.map(_._3).distinct
    require(digests.size == 1, s"variant result digests diverge: $results")
    results.foreach { case (l, s, _) =>
      println(f"""{"variant":"$l","median_sec":$s%.2f,"fact_rows":$nFact}""")
    }
    spark.stop()
  }
}
