package graft

import org.apache.spark.sql.functions._

import graft.api.BucketCap

/** The banding flood guard under every MinHash/SimHash dedup path: buckets
  * larger than the cap are excluded wholesale (conservative: dedup goes
  * blind on them, never quadratic), everything else passes untouched. The
  * distinct-census mode must make exact duplicate rows — the incremental
  * index after a crash-window double-append — invisible to the census.
  */
class BucketCapSpec extends SparkSpec {
  import spark.implicits._

  // 3 buckets: a=5 members, b=3, c=1
  private def frame = Seq(
    ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 5L),
    ("b", 10L), ("b", 11L), ("b", 12L),
    ("c", 20L)).toDF("bv", "id")

  test("oversized census reports exactly the buckets past the cap") {
    val over = BucketCap.oversized(frame, Seq("bv"), maxBucket = 3)
      .as[(String, Long)].collect().toMap
    assert(over == Map("a" -> 5L))
    assert(BucketCap.oversized(frame, Seq("bv"), maxBucket = 5).count() == 0)
  }

  test("cap drops oversized buckets wholesale, keeps the rest untouched") {
    val kept = BucketCap.cap(frame, Seq("bv"), maxBucket = 3)
      .as[(String, Long)].collect().toSet
    assert(kept.map(_._1) == Set("b", "c"), "only the a-bucket is past the cap")
    assert(kept == frame.as[(String, Long)].collect().toSet.filter(_._1 != "a"),
      "surviving rows must pass through unmodified")
  }

  test("distinct census is blind to exact duplicate rows; row census is not") {
    // b doubled: 6 rows but still 3 distinct ids — a crash-window replay
    val doubledB = frame.unionAll(frame.where($"bv" === "b"))
    // row census: b crosses the cap early and is (conservatively) excluded
    assert(BucketCap.cap(doubledB, Seq("bv"), maxBucket = 3)
      .as[(String, Long)].collect().forall(_._1 == "c"))
    // distinct census: b stays under the cap, duplicates and all
    val kept = BucketCap.cap(doubledB, Seq("bv"), maxBucket = 3,
      distinctOn = Some("id")).as[(String, Long)].collect()
    assert(kept.map(_._1).toSet == Set("b", "c"))
    assert(kept.count(_._1 == "b") == 6, "cap filters buckets, not rows: " +
      "the duplicate rows themselves survive (compaction reclaims them)")
  }
}
