package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Physical-layout operators: Z-order (Morton) clustering for
  * multi-dimensional data skipping.
  *
  * A table range-partitioned and sorted by ONE column prunes scans on that
  * column only; a 100 TB fact table queried by (part, supplier) boxes
  * wants BOTH dimensions tight per file. Interleaving the key bits gives
  * every file a small axis-aligned bounding box in (x, y) space, so
  * parquet min/max (file- and row-group-level) skip on either predicate.
  *
  * The z-value is pure integer arithmetic — shift, mask, add — identical
  * in every engine (and codegen'd in Spark: no UDF, no HOF), so the
  * computation itself is oracle-verifiable bit-for-bit.
  */
object Layout {

  /** Morton-interleave the low `bits` bits of two non-negative integer
    * columns: bit i of `x` lands at position 2i, bit i of `y` at 2i+1.
    * `bits` ≤ 31 keeps the result in a positive long. */
  def zValue2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be 1..31, got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        shiftright(x.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i)),
        shiftright(y.cast("long"), i).bitwiseAND(lit(1L)) * lit(1L << (2 * i + 1)))
    }
    terms.reduce(_ + _)
  }

  /** DuckDB rendering of [[zValue2]] over SQL fragments `x`, `y`. */
  def zValue2Sql(x: String, y: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($x >> $i) & 1) * ${1L << (2 * i)})",
        s"((($y >> $i) & 1) * ${1L << (2 * i + 1)})")
    }.mkString(" + ")

  /** Cluster `df` for (x, y) box queries: range-partition on the z-value
    * into `numFiles` output partitions, sort within each — every written
    * file then covers a compact Morton range, i.e. a small (x, y) bounding
    * box for parquet min/max skipping. One range-exchange (sampled
    * boundaries), one local sort: the standard OPTIMIZE ZORDER shape. */
  def zOrder2(df: DataFrame, x: Column, y: Column, numFiles: Int,
      bits: Int = 16): DataFrame = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.withColumn("__z", zValue2(x, y, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
  }

  /** Small-file compaction: rewrite a fragmented parquet directory into
    * ⌈rows / targetRowsPerFile⌉ range-clustered files sorted by `key`.
    *
    * The streaming-ingest failure mode: thousands of KB-sized files per
    * day make every scan pay one footer+seek per file and starve the
    * scheduler with tiny splits. Compaction is the standard maintenance
    * pass (OPTIMIZE in lakehouse formats). Range-partitioning on `key`
    * (sampled boundaries, one exchange) + a local sort gives each output
    * file a disjoint key range — so the rewrite also buys min/max skipping
    * on `key`, not just fewer files. Sizing note: `df.count()` plans an
    * empty-schema scan (cheap — no column data decoded, but still a
    * distributed job over the files, not a driver-only footer read), and
    * because `repartitionByRange` SAMPLES range boundaries, output files
    * are only approximately `targetRowsPerFile` — some may exceed it.
    *
    * Returns the number of files written. Output goes to a NEW directory:
    * swap-by-rename (or a table format's atomic commit) is the caller's
    * final step, never an in-place overwrite of live data.
    */
  def compact(spark: org.apache.spark.sql.SparkSession, inDir: String,
      outDir: String, key: Column, targetRowsPerFile: Long): Int = {
    require(targetRowsPerFile >= 1, s"targetRowsPerFile $targetRowsPerFile")
    val df = spark.read.parquet(inDir)
    val rows = df.count() // empty-schema scan: no column data decoded
    val nFiles = math.max(1, math.ceil(rows.toDouble / targetRowsPerFile).toInt)
    df.repartitionByRange(nFiles, key)
      .sortWithinPartitions(key)
      .write.mode("error").parquet(outDir)
    nFiles
  }

  /** Write `df` as a bucketed+sorted managed table: rows hash to
    * `buckets` files by `key`, sorted by `key` within each.
    *
    * This is the co-located join layout: two tables bucketed on the same
    * key with the same bucket count join with NO exchange on either side
    * (and no sort, since files are pre-sorted) — at 100 TB the dominant
    * shuffle of a fact-fact join disappears entirely, paid once at write
    * time instead of on every query. `LayoutSpec` proves the plan shape:
    * the bucketed join contains zero `Exchange` nodes where the same join
    * over plain tables shuffles both sides. */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit = {
    require(buckets >= 1, s"buckets $buckets")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** [[writeBucketed]] with an explicit external location, for callers
    * that manage their own state directory instead of the session
    * warehouse (e.g. the oracle-gated `q_smb_join` transaction). */
  def writeBucketedAt(df: DataFrame, table: String, path: String,
      key: String, buckets: Int): Unit = {
    require(buckets >= 1, s"buckets $buckets")
    df.write
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .option("path", path)
      .mode("overwrite")
      .saveAsTable(table)
  }

  /** Hive-style partitioned layout (`outDir/col=value/...`): the
    * directory-level pruning primitive every date-partitioned 100 TB fact
    * table relies on — a query filtering on the partition column never
    * LISTS the other directories, so scan cost tracks the queried window,
    * not table size (cheaper than any file-level min/max skip, which still
    * reads footers). Keep partition columns low-cardinality (days, not
    * user ids): each value is a directory. `LayoutSpec` proves a
    * partition-filtered read plans `PartitionFilters` and touches only the
    * matching directory's files. */
  def writePartitioned(df: DataFrame, outDir: String, partCols: String*): Unit = {
    require(partCols.nonEmpty, "at least one partition column")
    df.write.partitionBy(partCols: _*).mode("overwrite").parquet(outDir)
  }
}
