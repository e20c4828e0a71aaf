package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark
import graft.sources.Tables

/** Error-bounds the approx_percentile sketch sheet of q60 against the
  * exact discrete percentiles (the exact columns oracle-check as q60;
  * the sketch is engine-specific so it is bounded here instead).
  *
  * The bound checked is the sketch's REAL contract — rank error ≤
  * n/accuracy — not value error, which approx_percentile does not
  * guarantee on skewed value distributions. */
class QuantileSpec extends AnyFunSuite {
  import TestSpark._

  test("multi-column-group multiQuantileDisc matches percentile_disc on the compound key") {
    import spark.implicits._
    val df = (for { a <- 1 to 5; b <- 1 to 4; i <- 1 to (a * b + 3) }
      yield (s"s$a", s"l$b", ((i * 7) % 23 - 5).toLong)).toDF("src", "lng", "v")
    val got = graft.operators.Quantiles
      .multiQuantileDisc(df, Seq("src", "lng"), "v",
        Seq("p50" -> 0.50, "p95" -> 0.95))
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    val want = df.groupBy(col("src"), col("lng")).agg(
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY v)").as("p50"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY v)").as("p95"),
      count(lit(1)).as("n_rows")).collect()
      .map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    got.foreach { case (k, g) =>
      val w = want(k)
      // Spark's percentile_disc aggregate returns DOUBLE; the kernel
      // SELECTS the original long values — compare on the double axis
      Seq("p50", "p95").foreach { c =>
        assert(g.getAs[Long](c).toDouble == w.getAs[Double](c), s"$k $c")
      }
      assert(g.getAs[Long]("n_rows") == w.getAs[Long]("n_rows"), s"$k n_rows")
    }
  }

  test("multiQuantileDisc matches percentile_disc exactly across group sizes and duplicates") {
    import spark.implicits._
    // groups of every size 1..60, values deliberately duplicate-heavy
    // (v = i*i % 17) so rank boundaries land on plateaus, plus negative
    // and zero values; group sizes cover every ceil(q*n) boundary for
    // the shipped percentile family
    val df = (1 to 60).flatMap(g => (1 to g).map(i => (g, ((i * i) % 17 - 4).toDouble)))
      .toDF("g", "v")
    val qs = Seq("p25" -> 0.25, "p50" -> 0.50, "p75" -> 0.75, "p95" -> 0.95, "p100" -> 1.0)
    val got = graft.operators.Quantiles.multiQuantileDisc(df, "g", "v", qs)
      .collect().map(r => r.getInt(0) -> r).toMap
    val want = df.groupBy(col("g")).agg(
      expr("percentile_disc(0.25) WITHIN GROUP (ORDER BY v)").as("p25"),
      expr("percentile_disc(0.50) WITHIN GROUP (ORDER BY v)").as("p50"),
      expr("percentile_disc(0.75) WITHIN GROUP (ORDER BY v)").as("p75"),
      expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY v)").as("p95"),
      expr("percentile_disc(1.00) WITHIN GROUP (ORDER BY v)").as("p100"),
      count(lit(1)).as("n_rows")).collect().map(r => r.getInt(0) -> r).toMap
    assert(got.keySet == want.keySet)
    got.foreach { case (g, gr) =>
      val wr = want(g)
      qs.map(_._1).foreach { c =>
        assert(gr.getAs[Double](c) == wr.getAs[Double](c), s"group $g column $c")
      }
      assert(gr.getAs[Long]("n_rows") == wr.getAs[Long]("n_rows"), s"group $g n_rows")
    }
  }

  test("rank selection is decimal-exact on adversarial (q, n) pairs") {
    import spark.implicits._
    // values are 1..n, so the value at 1-based rank k IS k — the exact
    // percentile_disc answer is max(1, ceil(q·n)) computed rationally.
    // Each pair below makes double arithmetic overshoot (q·n lands just
    // ABOVE the integer: 0.07*100 = 7.000000000000001 → double-ceil
    // picks rank 8) or exercises an exact-integer boundary
    val adversarial = Seq(
      0.07 -> 100, 0.07 -> 300, 0.21 -> 100, 0.655 -> 200, 0.001 -> 7000,
      0.29 -> 100, 0.1 -> 10, 0.3 -> 10, 1.0 -> 37, 0.5 -> 1)
    val rnd = new scala.util.Random(11)
    val randomized = Seq.fill(40)(((rnd.nextInt(9999) + 1) / 10000.0, rnd.nextInt(400) + 1))
    // one Spark job: case i becomes group i with values 1..n_i, and all
    // 50 qs are picked in a single multiQuantileDisc call — we check
    // column p_i only against its own group i
    val cases = (adversarial ++ randomized).zipWithIndex
    val df = cases.flatMap { case ((_, n), i) => (1 to n).map(v => (i, v.toDouble)) }
      .toDF("g", "v")
    val qs = cases.map { case ((q, _), i) => s"p$i" -> q }
    val got = graft.operators.Quantiles.multiQuantileDisc(df, "g", "v", qs)
      .collect().map(r => r.getInt(0) -> r).toMap
    cases.foreach { case ((q, n), i) =>
      val exactRank = (BigDecimal(q) * n).setScale(0, BigDecimal.RoundingMode.CEILING).toInt.max(1)
      assert(got(i).getAs[Double](s"p$i") == exactRank.toDouble,
        s"q=$q n=$n: expected rank $exactRank, got value ${got(i).getAs[Double](s"p$i")}")
    }
  }

  test("non-representable percentiles are rejected, not silently rounded") {
    import spark.implicits._
    val df = Seq((1, 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      graft.operators.Quantiles.multiQuantileDisc(df, "g", "v", Seq("p" -> (1.0 / 3.0)))
    }
  }

  test("multiQuantileDisc excludes NULL values from ranks and counts") {
    import spark.implicits._
    val df = Seq((1, Some(3.0)), (1, None), (1, Some(1.0)), (1, Some(2.0)), (2, None))
      .toDF("g", "v")
    val r = graft.operators.Quantiles.multiQuantileDisc(df, "g", "v", Seq("p50" -> 0.5))
      .collect().map(x => x.getInt(0) -> x).toMap
    assert(r.keySet == Set(1)) // group 2 has no non-null values at all
    assert(r(1).getAs[Double]("p50") == 2.0 && r(1).getAs[Long]("n_rows") == 3L)
  }

  test("globalQuantileDisc is bitwise multiQuantileDisc on ties, negatives and 64-bit extremes") {
    import spark.implicits._
    // duplicate-heavy plateau values, negatives, zero, and the four
    // corners of the BIGINT domain — the sign-bit XOR image and the
    // per-digit carries must survive all of them
    val base: Seq[Long] = (1 to 300).map(i => ((i * i) % 19 - 6).toLong) ++
      Seq(Long.MinValue, Long.MinValue + 1, Long.MaxValue, Long.MaxValue - 1,
        -1L, 0L, 1L, 1L << 62, -(1L << 62), 1L << 31, -(1L << 31))
    val qs = Seq("p01" -> 0.01, "p25" -> 0.25, "p50" -> 0.50,
      "p75" -> 0.75, "p95" -> 0.95, "p100" -> 1.0, "p07" -> 0.07)
    // sweep prefix sizes so every ceil(q·n) boundary class is hit,
    // including n = 1
    Seq(1, 2, 3, 7, 100, base.size).foreach { n =>
      val df = base.take(n).toDF("v")
      val got = graft.operators.Quantiles.globalQuantileDisc(df, "v", qs)
        .collect()
      assert(got.length == 1, s"n=$n: must be exactly one row")
      val want = graft.operators.Quantiles
        .multiQuantileDisc(df.withColumn("__g", lit(0L)), "__g", "v", qs)
        .collect()(0)
      qs.map(_._1).foreach { c =>
        assert(got(0).getAs[Long](c) == want.getAs[Long](c),
          s"n=$n column $c: ${got(0).getAs[Long](c)} != ${want.getAs[Long](c)}")
      }
    }
  }

  test("groupQuantileDisc is bitwise multiQuantileDisc per group on ties, negatives and 64-bit extremes") {
    import spark.implicits._
    // per-group variants of the global pin's adversarial sets: plateau
    // duplicates, negatives, the BIGINT corners, group sizes 1..n —
    // every group must locate independently through the shared
    // broadcast rounds, and all-NULL groups must be ABSENT (the
    // multiQuantileDisc convention)
    val data: Seq[(String, Option[Long])] =
      (1 to 7).flatMap(g => (1 to g * g).map(i =>
        s"g$g" -> Some(((i * 13) % 23 - 8).toLong))) ++
      Seq("gx" -> Some(Long.MinValue), "gx" -> Some(Long.MaxValue),
        "gx" -> Some(0L), "gx" -> Some(-1L),
        "g1" -> None, "gnull" -> None, "gnull" -> None)
    val df = data.toDF("g", "v")
    val qs = Seq("p07" -> 0.07, "p33" -> 0.33, "p50" -> 0.50,
      "p67" -> 0.67, "p100" -> 1.0)
    val got = graft.operators.Quantiles.groupQuantileDisc(df, "g", "v", qs)
      .collect().map(r => r.getString(0) -> r).toMap
    val want = graft.operators.Quantiles
      .multiQuantileDisc(df, "g", "v", qs)
      .collect().map(r => r.getString(0) -> r).toMap
    assert(got.keySet == want.keySet && got.nonEmpty)
    assert(!got.keySet.contains("gnull"), "all-NULL groups are absent")
    got.foreach { case (k, g) =>
      qs.map(_._1).foreach { c =>
        assert(g.getAs[Long](c) == want(k).getAs[Long](c),
          s"group $k column $c: ${g.getAs[Long](c)} != ${want(k).getAs[Long](c)}")
      }
    }
  }

  test("globalQuantileDisc returns one all-NULL row on empty and all-NULL input") {
    import spark.implicits._
    val qs = Seq("p50" -> 0.5, "p95" -> 0.95)
    Seq(Seq.empty[Option[Long]], Seq(None, None): Seq[Option[Long]]).foreach { data =>
      val rows = graft.operators.Quantiles
        .globalQuantileDisc(data.toDF("v"), "v", qs).collect()
      assert(rows.length == 1 && rows(0).isNullAt(0) && rows(0).isNullAt(1))
    }
  }

  test("globalQuantileDisc rejects non-BIGINT value columns") {
    import spark.implicits._
    intercept[IllegalArgumentException] {
      graft.operators.Quantiles.globalQuantileDisc(
        Seq(1.0).toDF("v"), "v", Seq("p50" -> 0.5))
    }
  }

  test("radixLocate finds the weighted overflow boundary a local scan finds") {
    import spark.implicits._
    // weighted rows with deliberate ties in __u, spanning the sign
    // boundary (the locate's digit order must agree with SIGNED key
    // order); targets at every interesting budget: 0-ish, mid-group,
    // group boundary, beyond-total
    val rows: Seq[(Long, Long)] = Seq(
      Long.MinValue -> 2L, -10L -> 3L, 10L -> 5L, 10L -> 3L, 20L -> 7L,
      30L -> 1L, 30L -> 1L, 30L -> 4L, Long.MaxValue -> 2L)
    val total = rows.map(_._2).sum // 29
    val tw = rows.toDF("__u", "__w")
    val targets = (1L to (total + 2)).map(rr => (s"t$rr", rr))
    val tf = targets.toDF("qn", "rr")
    val got = graft.operators.Quantiles.radixLocate(tw, tf)
      .collect().map(r => r.getString(0) ->
        (if (r.isNullAt(1)) None else Some((r.getLong(1), r.getLong(2), r.getLong(3)))))
      .toMap
    // local oracle: ascending u, running mass; first u where cum >= rr
    val byU = rows.groupBy(_._1).view.mapValues(_.map(_._2).sum).toSeq.sortBy(_._1)
    targets.foreach { case (qn, rr) =>
      var cum = 0L
      val hit = byU.find { case (_, w) => cum += w; cum >= rr }
      val want = hit.map { case (u, w) => (u, rr - (cum - w), cum - w) }
      assert(got(qn) == want, s"$qn rr=$rr: got ${got(qn)} want $want")
    }
  }

  test("approx_percentile rank error stays within the accuracy bound of the exact quantiles") {
    val targets = Seq(0.25, 0.50, 0.75, 0.95)
    Seq(sf001, sf01).foreach { sf =>
      val rows = ExtensionQueries.approxQuantiles(spark, sf).collect()
      assert(rows.nonEmpty)
      // per-group sorted values for local rank computation (bounded:
      // test scale only — the operator itself never collects)
      val byFlag = Tables.lineitem(spark, sf)
        .select(col("l_returnflag"), col("l_extendedprice"))
        .collect()
        .groupBy(_.getString(0))
        .map { case (k, rs) => k -> rs.map(_.getDouble(1)).sorted }
      rows.foreach { r =>
        val flag = r.getString(0)
        val vals = byFlag(flag)
        val n = vals.length.toDouble
        val approx = r.getSeq[Double](1)
        val exact = Seq(r.getDouble(2), r.getDouble(3), r.getDouble(4), r.getDouble(5))
        assert(r.getAs[Long]("n_rows") == vals.length.toLong)
        targets.indices.foreach { i =>
          // cdf of the approx value must sit within rank tolerance of
          // the target quantile; accuracy=10000 → 1e-4, widened 5× for
          // duplicate-value plateaus at the boundary
          val cdfLo = vals.count(_ < approx(i)) / n
          val cdfHi = vals.count(_ <= approx(i)) / n
          val tol = 5.0 / 10000.0
          assert(cdfLo - tol <= targets(i) && targets(i) <= cdfHi + tol,
            s"$sf $flag q=${targets(i)}: approx=${approx(i)} cdf=[$cdfLo,$cdfHi]")
          // and the approx value can never cross a neighboring exact quantile badly
          assert(approx(i) >= exact.head - math.abs(exact.head) &&
            approx(i) <= exact.last + math.abs(exact.last))
        }
      }
    }
  }
}
