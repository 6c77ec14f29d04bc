package graft

/** Partitioning-invariance sweep: every declared query must produce the
  * SAME result multiset regardless of how the data is split — different
  * reducer counts (shuffle partitions) and different input-split
  * boundaries (tiny maxPartitionBytes ⇒ many map tasks).
  *
  * Why this is a load-bearing pin: the whole oracle strategy replays each
  * query in single-threaded DuckDB and hash-compares — that only works if
  * the Spark answer does not depend on partition count, accumulation
  * order, or merge order. The engine claims this by construction (DECIMAL
  * partial sums for every float-bearing aggregate, integer/hash forms,
  * full tie-breaks before every limit), and at 100 TB it is the property
  * that makes results reproducible across cluster sizes and AQE re-plans.
  * Here the claim is exercised directly: two identical byte-copies of the
  * data (distinct dirs, so fingerprint-keyed model fits genuinely REFIT
  * rather than serve from cache) run under deliberately different
  * physical configurations, and every query must agree exactly.
  */
class PartitionInvarianceSpec extends SparkSpec {

  /** Byte-identical copy of the sf dir under a fresh temp path. */
  private def copyFixture(): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-pinv")
    Tables.all.foreach { t =>
      val src = java.nio.file.Paths.get(sf(), s"$t.parquet")
      val dst = dir.resolve(s"$t.parquet")
      if (java.nio.file.Files.isDirectory(src)) {
        java.nio.file.Files.createDirectories(dst)
        java.nio.file.Files.list(src).forEach { f =>
          java.nio.file.Files.copy(f, dst.resolve(f.getFileName.toString))
        }
      } else java.nio.file.Files.copy(src, dst)
    }
    dir.toString
  }

  /** Collected result as a sorted multiset of JSON rows (binary → base64,
    * maps/arrays/structs rendered; orderBy ties must not matter). */
  private def resultSet(name: String, dir: String): Seq[String] =
    SparkEntry.queries(name)(spark, dir).toJSON.collect().toSeq.sorted

  private def withConf(pairs: (String, String)*)(body: => Unit): Unit = {
    val prev = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    try { pairs.foreach { case (k, v) => spark.conf.set(k, v) }; body }
    finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }

  test("all queries are invariant to shuffle partitioning and input splits") {
    val dirA = copyFixture()
    val dirB = copyFixture()
    val names = SparkEntry.defs.map(_.name).sorted
    // pass A: the suite's defaults (shuffle=4, default splits)
    val base = names.map(n => n -> resultSet(n, dirA)).toMap
    // pass B: prime reducer count + forced-tiny input splits + AQE off —
    // different map-task boundaries, different reducer routing, different
    // merge orders for every partial aggregate and model fit, and none of
    // AQE's runtime coalescing/join re-planning to paper over any of it
    val diffs = withConfCollect(names, dirB, base)
    assert(diffs.isEmpty,
      s"\n${diffs.size} queries changed results under repartitioning:\n  " +
        diffs.mkString("\n  "))
  }

  private def withConfCollect(names: Seq[String], dirB: String,
      base: Map[String, Seq[String]]): Seq[String] = {
    var out = Seq.empty[String]
    withConf(
      "spark.sql.shuffle.partitions" -> "13",
      "spark.sql.files.maxPartitionBytes" -> "65536",
      "spark.sql.files.openCostInBytes" -> "0",
      "spark.sql.adaptive.enabled" -> "false") {
      out = names.flatMap { n =>
        val b = try Right(resultSet(n, dirB)) catch {
          case e: Throwable => Left(s"$n: threw ${e.getClass.getSimpleName}: " +
            s"${Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString}")
        }
        b match {
          case Left(err) => Some(err)
          case Right(r) if r == base(n) => None
          case Right(r) =>
            val firstDiff = base(n).zipAll(r, "<missing>", "<missing>")
              .find { case (x, y) => x != y }
            Some(s"$n: ${base(n).size} vs ${r.size} rows; first diff: $firstDiff")
        }
      }
    }
    out
  }
}
