package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.TestSpark

/** [[SpaceSaving.TopKAgg]], bounded against q51-style exact term
  * counts (the sketch-sheet pattern of q32/HLL and q60/GK: the sketch
  * is arrival-order-dependent, so it is error-bounded, not
  * oracle-compared). The same corpus is aggregated under several
  * partitionings to exercise different merge orders. */
class SpaceSavingSpec extends AnyFunSuite {
  import TestSpark._
  import spark.implicits._

  private def tokens = graft.sources.Tables.documents(spark, sf01)
    .select(explode(TextFunctions.tokens(col("text"))).as("w"))

  test("heavy terms present and estimates within N/m across merge orders") {
    val exact = tokens.groupBy("w").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = exact.values.sum
    val m = 64
    Seq(1, 7, 32).foreach { parts =>
      val approx = tokens.repartition(parts).as[String]
        .select(SpaceSaving.TopKAgg(m).toColumn).head()
      // presence: every term with true frequency > 2N/m is in the summary
      exact.filter(_._2 > 2 * n / m).keys.foreach { hh =>
        assert(approx.contains(hh), s"parts=$parts heavy term $hh missing")
      }
      // accuracy: every reported count within N/m of its exact count
      approx.foreach { case (w, est) =>
        val truth = exact.getOrElse(w, 0L)
        assert(math.abs(est - truth) <= n / m,
          s"parts=$parts $w est=$est exact=$truth bound=${n / m}")
      }
      assert(approx.size <= m)
    }
  }

  test("capacity-1 degenerates to a majority-candidate summary") {
    val approx = Seq("a", "b", "a", "c", "a", "a").toDS()
      .select(SpaceSaving.TopKAgg(1).toColumn).head()
    assert(approx.size == 1) // Boyer-Moore-like: one surviving candidate
  }

  test("summary survives a kryo round-trip mid-stream (lazy bucket rebuild)") {
    val agg = SpaceSaving.TopKAgg(4)
    var s = agg.zero
    Seq("a", "a", "b", "c", "d", "e").foreach { x => s = agg.reduce(s, x) } // e evicted into the summary
    val ser = new org.apache.spark.serializer.KryoSerializer(spark.sparkContext.getConf).newInstance()
    val back = ser.deserialize[SpaceSaving.Summary](ser.serialize(s))
    Seq("f", "g", "a").foreach(back.add) // evictions after deserialize rebuild buckets
    assert(back.entries.size == 4)
    assert(back.toCounts.contains("a")) // the heavy key survives
  }

  test("reduce throughput micro-bench at m=64 and m=1024 (adversarial distinct tail)") {
    // worst-case for eviction: 3/4 of the stream is never-seen keys, so
    // once the summary fills, most rows evict. Driver-side loop — this
    // measures the buffer itself, not Spark plumbing.
    val n = 1000000
    def run(m: Int): Double = {
      val agg = SpaceSaving.TopKAgg(m)
      var s = agg.zero
      var i = 0
      val t0 = System.nanoTime()
      while (i < n) {
        val key = if (i % 4 == 0) "hot" + (i % 64) else "tail" + i
        s = agg.reduce(s, key)
        i += 1
      }
      val sec = (System.nanoTime() - t0) / 1e9
      assert(s.entries.size == m)
      n / sec
    }
    run(64) // JIT warmup
    // best-of-3: a GC pause or a concurrent suite's spike inflates one
    // trial, rarely all three — the max is the buffer's own speed (the
    // 1-min loadavg gate below lags a freshly-ramped parallel suite,
    // so it alone can't keep this from flaking mid-`sbt test`)
    val r64 = (1 to 3).map(_ => run(64)).max
    val r1024 = (1 to 3).map(_ => run(1024)).max
    info(f"reduce throughput: m=64 → ${r64 / 1e6}%.1f M rows/s, m=1024 → ${r1024 / 1e6}%.1f M rows/s")
    // Wall-clock floors only bind on a quiet machine: this repo's own
    // bench history shows ~13x inflation under load, which would turn
    // a floor into a flake. Same contention line as Bench.main.
    val cpus = Runtime.getRuntime.availableProcessors()
    val load = try java.nio.file.Files.readString(java.nio.file.Paths.get("/proc/loadavg"))
      .split("\\s+")(0).toDouble catch { case _: Throwable => 0.0 }
    assume(load <= cpus * 0.15,
      f"loadavg $load%.2f exceeds ${cpus * 0.15}%.1f — throughput floors skipped on a contended machine")
    // floor far below expectations — guards regressions to per-row O(m)
    // scans or per-row allocation storms (10-100x slower) without being
    // machine-flaky: the loadavg gate is a start-of-test snapshot, so
    // leave headroom for load arriving mid-test
    assert(r64 > 250000, f"m=64 throughput $r64%.0f rows/s")
    assert(r1024 > 250000, f"m=1024 throughput $r1024%.0f rows/s")
  }
}
