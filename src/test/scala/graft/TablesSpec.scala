package graft

import org.apache.spark.sql.types._

/** Drift guard for the driver-generated testdata (TESTDATA.md).
  *
  * The driver regenerates `/root/testdata` between rounds and has already
  * shifted physical types once (round 10: `events.ts` TIMESTAMP(NANOS) →
  * TIMESTAMP(MICROS)), which silently broke 24 queries and the bench. This
  * spec loads every table through `Tables` at every SF and pins the
  * POST-loader logical schema the rest of the engine assumes — so the next
  * regeneration fails here in seconds with an exact message instead of
  * crashing a whole round.
  */
class TablesSpec extends SparkSpec {
  private val sfDirs = Seq("sf0.001", "sf0.01", "sf0.1")
    .map(d => s"/root/testdata/$d")
    .filter(d => new java.io.File(d).isDirectory)

  // missing testdata must cancel loudly, not pass the for-loops vacuously
  // while the .head tests crash with an opaque NoSuchElementException
  private def requireTestdata(): Unit =
    assume(sfDirs.nonEmpty, "no /root/testdata/sf* directories — drift guard cannot run")

  test("all tables load from every sf dir") {
    requireTestdata()
    for (d <- sfDirs; t <- Tables.all) {
      val df =
        if (t == "events") Tables.events(spark, d)
        else Tables.load(spark, d, t)
      assert(df.schema.nonEmpty, s"$d/$t: empty schema")
      assert(df.limit(1).count() == 1, s"$d/$t: no rows")
    }
  }

  test("events loader yields session-UTC TimestampType ts at every sf") {
    requireTestdata()
    for (d <- sfDirs) {
      val schema = Tables.events(spark, d).schema
      val byName = schema.fields.map(f => f.name -> f.dataType).toMap
      assert(byName("ts") == TimestampType,
        s"$d: events.ts is ${byName("ts")}, engine assumes TimestampType")
      assert(byName("event_id") == LongType, s"$d: event_id ${byName("event_id")}")
      assert(byName("user_id") == LongType, s"$d: user_id ${byName("user_id")}")
      assert(byName("event_type") == StringType, s"$d: event_type ${byName("event_type")}")
      assert(byName("value") == DoubleType, s"$d: value ${byName("value")}")
      assert(byName("props") == StringType, s"$d: props ${byName("props")}")
    }
  }

  test("ts filter pushes into the events parquet scan through the loader cast") {
    // the NTZ->timestamp cast must not block predicate pushdown: Catalyst
    // rewrites `cast(ts) > lit` to an NTZ-side comparison, so the filter
    // reaches the scan (PushedFilters) — strictly better than the old
    // nanos-as-long rebuild, which never pushed. At 100 TB this is the
    // difference between reading one time slice and reading the table.
    requireTestdata()
    import org.apache.spark.sql.functions.col
    val q = Tables.events(spark, sfDirs.head)
      .filter(col("ts") > java.sql.Timestamp.valueOf("2024-03-01 00:00:00"))
      .select("event_id", "ts")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters: [IsNotNull(ts), GreaterThan(ts,"),
      s"ts predicate not pushed to parquet:\n${plan.take(2000)}")
  }

  test("loaders are read-only w.r.t. session conf") {
    // Tables.events used to set spark.sql.legacy.parquet.nanosAsLong on
    // every call — a loader mutating session state. The conf now lives at
    // session build (GraftConfig.sessionBuilder / SparkSpec); pin that
    // loading every table leaves the session conf map bit-identical.
    requireTestdata()
    val before = spark.conf.getAll
    for (t <- Tables.all) {
      val df = if (t == "events") Tables.events(spark, sfDirs.head)
               else Tables.load(spark, sfDirs.head, t)
      df.limit(1).count()
    }
    val after = spark.conf.getAll
    assert(after == before,
      s"loaders mutated session conf: ${(after.toSet -- before.toSet).toMap.keys}")
  }

  test("key columns keep the types the query inventory assumes") {
    requireTestdata()
    val d = sfDirs.head
    def types(t: String): Map[String, DataType] =
      Tables.load(spark, d, t).schema.fields.map(f => f.name -> f.dataType).toMap
    val li = types("lineitem")
    assert(li("l_orderkey") == LongType && li("l_quantity").isInstanceOf[NumericType])
    // driver writes timestamp[us] with no tz flag → Spark 4 reads NTZ;
    // the inventory's date functions accept either timestamp flavor
    assert(Set[DataType](TimestampType, TimestampNTZType, DateType)
             .contains(types("orders")("o_orderdate")),
      s"o_orderdate drifted to ${types("orders")("o_orderdate")}")
    val docs = types("documents")
    assert(docs.contains("doc_id") && docs.contains("text"), s"documents cols: ${docs.keys}")
    val emb = types("embeddings")
    assert(emb.values.exists(_.isInstanceOf[ArrayType]),
      s"embeddings has no array column: $emb")
  }
}
