package graft

import org.apache.spark.sql.SparkSession

/** The SQL surface of the custom expressions via SparkSessionExtensions. */
class ExtensionsSpec extends SparkSpec {

  test("dot_product and md5long56 callable from SQL via extensions") {
    // Builder.create() makes a fresh session (getOrCreate would return the
    // shared one, silently dropping extensions); SparkContext is reused.
    // Do NOT close() this session: SparkSession.close() stops the SHARED
    // SparkContext and kills every suite that runs afterwards (sessions
    // have no context-preserving close). One leaked session per run is
    // harmless; a stopped context is not.
    val s: SparkSession = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .create()
    val r = s.sql(
      """SELECT dot_product(array(1d, 2d), array(3d, 4d)) AS d,
        |       md5long56('hello') AS h""".stripMargin).head()
    assert(r.getDouble(0) == 11.0)
    // same value the conv(substr(md5)) formulation yields
    val md = java.security.MessageDigest.getInstance("MD5")
    assert(r.getLong(1) ==
      graft.functions.Md5Long56.first56Bits(md.digest("hello".getBytes("UTF-8"))))

    // custom aggregates from SQL, equal to the Column-API formulation
    s.range(0, 100).selectExpr("id % 3 AS g", "id", "cast(id as double) AS sc")
      .createOrReplaceTempView("ext_t")
    val tk = s.sql(
      """SELECT g, top_k_agg(sc, id, 2) AS tk FROM ext_t GROUP BY g ORDER BY g""")
      .collect().map(r => r.getLong(0) -> r.getSeq[org.apache.spark.sql.Row](1).map(_.getLong(0)))
    assert(tk.toMap == Map(0L -> Seq(99L, 96L), 1L -> Seq(97L, 94L), 2L -> Seq(98L, 95L)))
    val sh = s.sql(
      """SELECT simhash_agg(id, 1 + id % 2, 16) AS f FROM ext_t""").head().getLong(0)
    import org.apache.spark.sql.functions._
    val shCol = s.table("ext_t")
      .agg(graft.functions.SimhashAgg.simhash_agg(col("id"), lit(1) + col("id") % 2, 16))
      .head().getLong(0)
    assert(sh == shCol, "SQL and Column API must produce the identical fingerprint")
    // shape params must be literals — loud analysis-time failure otherwise
    val err = intercept[Exception] { s.sql("SELECT top_k_agg(sc, id, g) FROM ext_t").head() }
    assert(err.getMessage.contains("INTEGER literal") ||
      Option(err.getCause).exists(_.getMessage.contains("INTEGER literal")))

    // subword tokenizer from SQL == host function
    val sw = s.sql("SELECT subword_count('customer') AS c").head().getInt(0)
    assert(sw == graft.functions.SubwordCount.countWord("customer"))
    val si = s.sql(
      "SELECT sorted_intersect(array(1L, 3L, 5L, 7L), array(3L, 4L, 5L)) AS v")
      .head().getSeq[Long](0)
    assert(si == Seq(3L, 5L))
  }

  test("mv rewrite rule active in an extensions-built session") {
    import graft.api.MaterializedView
    import org.apache.spark.sql.functions._
    // the --conf spark.sql.extensions path: the injected optimizer rule
    // (not the experimental-batch fallback) must route a matching query
    val s: SparkSession = SparkSession.builder()
      .master("local[4]")
      .withExtensions(new GraftExtensions)
      .create()
    val li = Tables.lineitem(s, sf())
    def defn = li.groupBy("l_linestatus").agg(count(lit(1)).as("cnt"))
    val dir = java.nio.file.Files.createTempDirectory("mv-ext").toString
    val read = MaterializedView.refresh(s, defn, s"$dir/state")
    // register WITHOUT ensureRule side effects mattering: the injected
    // rule consults the same registry
    assert(MaterializedView.register(s, "mv_ext", defn, read))
    try {
      val q = defn
      val scans = q.queryExecution.optimizedPlan.exists {
        case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          lr.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.exists(_.toString.contains("mv-ext"))
            case _ => false
          }
        case _ => false
      }
      assert(scans, "extensions-built session did not rewrite to mv state")
      assert(q.collect().map(r => r.getString(0) -> r.getLong(1)).toMap ==
        read().collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    } finally MaterializedView.unregister(s, "mv_ext")
  }

  test("sliding windows over the delay stream (batch analog)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // 10s windows sliding by 5s: each event lands in exactly two windows
    val df = Seq((new java.sql.Timestamp(12000L), 4.0), (new java.sql.Timestamp(17000L), 8.0))
      .toDF("event_time", "delay_ms")
      .groupBy(window(col("event_time"), "10 seconds", "5 seconds"))
      .agg(count(lit(1)).as("n"), avg("delay_ms").as("avg_d"))
      .select(col("window.start").cast("long").as("start_s"), col("n"), col("avg_d"))
      .orderBy("start_s")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(df.toSeq == Seq((5L, 1L, 4.0), (10L, 2L, 6.0), (15L, 1L, 8.0)))
  }
}
