package graft

import graft.functions.{Bloom, PqMicro}
import org.apache.spark.sql.functions.col

/** Property tests (seeded-random draws, like `CrossHashSpec`) for the
  * round-7c primitives: the bloom filter's no-false-negative contract
  * under arbitrary key sets, the two-pointer intersection against the
  * set-theoretic reference, and PqMicro's micro-unit conversion against
  * Spark's own double→decimal cast (the parity the PQ oracle rests on). */
class FunctionPropSpec extends SparkSpec {
  import spark.implicits._

  test("property: bloom never false-negatives; fpp stays near theory") {
    val rng = new scala.util.Random(424242L)
    (1 to 20).foreach { _ =>
      val ks = Seq.fill(500)(rng.nextLong())
      val words = new Array[Long]((1 << 14) / 64)
      ks.foreach(k => Bloom.set(words, k, 5))
      assert(ks.forall(k => Bloom.contains(words, k, 5)), "false negative")
    }
    // fpp sanity: 500 keys in 2^14 bits, k=5 → theoretical fpp ≈ 0.06 %;
    // allow a generous 10× before calling the hash spread broken
    val words = new Array[Long]((1 << 14) / 64)
    (0L until 500L).foreach(k => Bloom.set(words, k * 2654435761L + 17, 5))
    val fp = (1L to 100000L).map(_ * 0x9E3779B97F4A7C15L + 3)
      .count(p => Bloom.contains(words, p, 5))
    assert(fp <= 600, s"false-positive rate implausibly high: $fp / 100000")
  }

  test("property: sorted_intersect equals the set intersection") {
    val rng = new scala.util.Random(31337L)
    val cases = (1 to 30).map { _ =>
      def arr() = Seq.fill(rng.nextInt(40))(rng.nextLong().abs % 1000).distinct.sorted
      (arr(), arr())
    } ++ Seq((Seq.empty[Long], Seq(1L, 2L)), (Seq(5L), Seq(5L)), (Seq.empty[Long], Seq.empty[Long]))
    val got = cases.toDF("a", "b")
      .select(graft.functions.SortedIntersect.sorted_intersect(col("a"), col("b")).as("i"))
      .collect().map(_.getSeq[Long](0))
    cases.zip(got).foreach { case ((a, b), g) =>
      assert(g == a.toSet.intersect(b.toSet).toSeq.sorted, s"intersect($a, $b) = $g")
    }
  }

  test("property: PqMicro.micros == Spark's double→DECIMAL(12,6) cast") {
    val rng = new scala.util.Random(271828L)
    val xs = Seq(0.0, -0.0, 0.0000005, -0.0000005, 0.1234565, 999.999999) ++
      Seq.fill(200)((rng.nextDouble() - 0.5) * 1998)
    val viaCast = xs.toDF("x")
      .selectExpr("CAST(x AS DECIMAL(12,6)) AS d")
      .collect().map(_.getDecimal(0).unscaledValue().longValueExact())
    xs.zip(viaCast).foreach { case (x, expect) =>
      assert(PqMicro.micros(x) == expect, s"micro mismatch for $x")
    }
  }
}
