package graft

import org.apache.spark.sql.{DataFrame, SaveMode}

/** Degenerate-input sweep: every declared query must run to completion —
  * returning a well-formed (possibly empty) result — over EMPTY tables and
  * over ONE-ROW tables.
  *
  * Why this matters at 100 TB: empty inputs are not an edge case in a
  * production pipeline, they are a daily occurrence — a new day-partition
  * before any ingest, a tenant with no data yet, a filter that matched
  * nothing upstream, a backfill window with a gap. An engine whose
  * dashboard query NPEs on an empty partition (instead of rendering an
  * empty result) fails its first week of operation. The one-row fixture
  * additionally catches divide-by-count-minus-one, variance-of-one-point,
  * and model-fit-needs-k-points crashes; referential integrity between the
  * single rows is NOT guaranteed (joins legitimately go empty mid-query),
  * which is exactly the stress.
  *
  * Contract pinned here: no query may throw on degenerate input. Queries
  * whose contract is to THROW when a physical-plan property fails to hold
  * (q_smb_join / q_partition_prune / q_dpp_join) instead return an empty
  * result when the property is vacuous (no data ⇒ nothing to prune).
  */
class DegenerateInputSpec extends SparkSpec {

  /** Writes a fixture dir where each table is `transform(source)`. */
  private def buildFixture(tag: String)(transform: DataFrame => DataFrame): String = {
    val dir = java.nio.file.Files.createTempDirectory(s"graft-degen-$tag").toString
    Tables.all.foreach { t =>
      val src =
        if (t == "events") Tables.events(spark, sf()) // normalize ts type
        else Tables.load(spark, sf(), t)
      transform(src).write.mode(SaveMode.Overwrite).parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private def sweep(label: String, dir: String): Unit = {
    val failures = SparkEntry.defs.sortBy(_.name).flatMap { q =>
      try {
        q.fn(spark, dir).collect() // force full execution, not just planning
        None
      } catch {
        case e: Throwable =>
          val root = Iterator.iterate(e: Throwable)(_.getCause)
            .takeWhile(_ != null).toSeq.last
          Some(s"${q.name}: ${root.getClass.getSimpleName}: " +
            s"${Option(root.getMessage).getOrElse("").linesIterator.take(1).mkString}")
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} queries failed on $label input:\n  " +
        failures.mkString("\n  "))
  }

  test("all queries survive empty tables") {
    sweep("empty", buildFixture("empty")(_.limit(0)))
  }

  test("all queries survive one-row tables") {
    sweep("one-row", buildFixture("onerow")(_.limit(1)))
  }

  test("all queries survive all-null rows") {
    // malformed ingest records arrive with missing fields; the all-null
    // row is the adversarial superset of every per-field-null shape. A
    // query may legitimately produce nothing from such rows — it may not
    // crash on them.
    sweep("all-null", buildFixture("nulled") { df =>
      df.limit(5).select(df.schema.fields.map(f =>
        org.apache.spark.sql.functions.lit(null).cast(f.dataType).as(f.name)).toSeq: _*)
    })
  }
}
