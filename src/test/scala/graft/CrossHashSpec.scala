package graft

import graft.functions.{CrossHash, Md5Long56}
import org.apache.spark.sql.functions._

/** Pins the codegen'd Md5Long56 to the reference formulation it replaced —
  * the DuckDB oracles depend on exact equality. */
class CrossHashSpec extends SparkSpec {
  import spark.implicits._

  test("Md5Long56 == conv(substr(md5(x),1,14),16,10) on corpus words") {
    val words = Tables.documents(spark, sf())
      .select(explode(split(col("text"), " ")).as("w"))
      .limit(5000)
    val mism = words.select(
      CrossHash.md5Long(col("w")).as("fast"),
      conv(substring(md5(col("w").cast("string")), 1, 14), 16, 10)
        .cast("long").as("ref"))
      .where(col("fast") =!= col("ref"))
      .count()
    assert(mism == 0)
  }

  test("Md5Long56: interpreted and codegen paths agree; host-side too") {
    val df = Seq("a", "", "hello world", "日本語", "x" * 1000).toDF("s")
      .select(col("s"), CrossHash.md5Long(col("s")).as("h"))
    val viaSpark = df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val codegenOff = spark.conf.get("spark.sql.codegen.wholeStage", "true")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      assert(df.collect().map(r => r.getString(0) -> r.getLong(1)).toMap == viaSpark)
    } finally spark.conf.set("spark.sql.codegen.wholeStage", codegenOff)
    // host-side MessageDigest path (used for LSH hyperplane constants)
    viaSpark.foreach { case (s, h) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      assert(Md5Long56.first56Bits(md.digest(s.getBytes("UTF-8"))) == h)
    }
  }

  test("property: perm maps [0, P) into [0, P) for every permutation") {
    import graft.functions.CrossHash
    val rng = new scala.util.Random(8128L)
    val hs = Seq(0L, 1L, CrossHash.P - 1) ++ (1 to 50).map(_ => rng.nextLong().abs % CrossHash.P)
    (0 until 16).foreach { j =>
      val (a, b) = CrossHash.Perms(j)
      hs.foreach { h =>
        val v = (h * a + b) % CrossHash.P
        assert(v >= 0 && v < CrossHash.P, s"perm $j out of range for h=$h: $v")
        // no Long overflow en route: h·a must stay under 2^62
        assert(h <= (Long.MaxValue - b) / a, s"perm $j would overflow at h=$h")
      }
    }
  }

  test("permutation constants stay within overflow-safe bounds") {
    CrossHash.Perms.foreach { case (a, b) =>
      assert(a > 0 && a < (1L << 21), s"a=$a")
      assert(b >= 0 && b < CrossHash.P, s"b=$b")
    }
  }
}
