package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared session: one per suite-classloader, local[4], UTC. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSpec.session
  def sf(dir: String = "sf0.001"): String = s"/root/testdata/$dir"

  /** Resident state-store rows of the most recent progress event that
    * carried state operators — the metric behind every "state bounded by
    * watermark, not history" pin (StreamingSpec per-pair bounds,
    * StateScaleSpec flatness-under-growth). Summed across state operators
    * (multi-stage pipelines) and state variables (incl. timers). */
  def stateRowsNow(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.reverseIterator
      .find(_.stateOperators.nonEmpty)
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .getOrElse(0L)

  /** Max state rows over the query's whole recorded progress history. */
  def maxStateRows(q: org.apache.spark.sql.streaming.StreamingQuery): Long =
    q.recentProgress.iterator
      .map(_.stateOperators.map(_.numRowsTotal).sum)
      .foldLeft(0L)(math.max)
}

object SparkSpec {
  lazy val session: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      // nanos-generation events.ts (see Tables.events) — session-build conf
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // bucketed-table tests (LayoutSpec) write managed tables; keep the
      // warehouse + metastore out of the repo working tree
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft-wh").toString)
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
