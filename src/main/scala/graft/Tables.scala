package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * Every query goes through these so scans stay uniform: plain
  * `spark.read.parquet` hands Catalyst the parquet footer schema, and any
  * downstream `select`/`filter` is pushed into the scan (column pruning +
  * predicate pushdown) — verified in `ScanSpec` via `.explain`.
  *
  * At cluster scale the same loaders work unchanged: parquet scans split by
  * row-group, so a 100 TB `lineitem` fans out across executors with no code
  * change here.
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Thread-local table-source override (bench/spec harness only): routes
    * named tables to an alternative physical LAYOUT — e.g. the bucketed
    * catalog tables of the TPC-H bucketed leg — while running the
    * UNCHANGED query definitions, so a layout experiment can never drift
    * from the query it prices. Overrides apply during plan CONSTRUCTION on
    * the calling thread; never set on the query path itself. */
  private val overrides = new ThreadLocal[Map[String, () => DataFrame]] {
    override def initialValue: Map[String, () => DataFrame] = Map.empty
  }

  def withTableOverrides[T](m: Map[String, () => DataFrame])(body: => T): T = {
    val prev = overrides.get()
    overrides.set(prev ++ m)
    try body finally overrides.set(prev)
  }

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    overrides.get().get(name).map(_())
      .getOrElse(spark.read.parquet(s"$sfDir/$name.parquet"))

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `events.ts` has shifted physical type across testdata generations:
    * TIMESTAMP(NANOS) originally (Spark 4 reads it only via the
    * nanos-as-long legacy conf), TIMESTAMP(MICROS) since the round-10
    * regeneration (arrives as TIMESTAMP_NTZ — no isAdjustedToUTC flag).
    * Dispatch on the loaded schema so every generation yields the same
    * session-UTC `TimestampType` column the queries and DuckDB oracles
    * assume; all sessions here run with spark.sql.session.timeZone=UTC, so
    * the NTZ→timestamp cast preserves the wall-clock micros exactly.
    *
    * Reading the NANOS generation requires
    * `spark.sql.legacy.parquet.nanosAsLong=true` at session build (set in
    * `GraftConfig.sessionBuilder` and the test/verify sessions) — this
    * loader never mutates session conf. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val raw = load(s, d, "events")
    raw.schema("ts").dataType match {
      case LongType => // nanos-as-long: rebuild, truncating ns → µs
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType => raw
      case _ => // TimestampNTZType (or future drift): cast, keep UTC wall clock
        raw.withColumn("ts", col("ts").cast(TimestampType))
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
