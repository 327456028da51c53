package graft

import org.scalatest.funsuite.AnyFunSuite

/** [[BenchCalibration]] — the bench's host-contention sentinel. The spec
  * pins three things: the spin loop is exactly the committed function
  * (checksum recomputed here from an independent BigInt replay), the flag
  * flips exactly at the threshold, and a synthetically oversubscribed
  * host actually inflates the measurement the flag reads (the round-10
  * failure mode, reproduced on purpose).
  */
class BenchCalibrationSpec extends AnyFunSuite {

  test("spin checksum matches an independent BigInt replay of the loop") {
    // re-derive the avalanche over BigInt with explicit 64-bit wrap —
    // shares no code with the Long implementation. Replayed at 10^5
    // rounds (full-length BigInt would take ~a minute); the full-length
    // pinned constant is then checked THROUGH the just-proven loop.
    val M = BigInt(1) << 64
    def wrap(b: BigInt): BigInt = b.mod(M)
    val replayRounds = 100_000
    var h = BigInt("9E3779B97F4A7C15", 16)
    var i = 0
    while (i < replayRounds) {
      h = wrap(h ^ BigInt(i))
      h = wrap(h * BigInt("C2B2AE3D27D4EB4F", 16))
      h = wrap(h ^ (h >> 29))
      i += 1
    }
    val signed = if (h >= (BigInt(1) << 63)) h - M else h
    assert(signed.toLong === BenchCalibration.spin(replayRounds),
      "spin diverged from the independent BigInt replay")
    assert(BenchCalibration.spin(BenchCalibration.defaultRounds) ===
      BenchCalibration.expectedChecksum)
  }

  test("degraded flips strictly above the 1.5 threshold") {
    assert(!BenchCalibration.degraded(0.5))
    assert(!BenchCalibration.degraded(1.0))
    assert(!BenchCalibration.degraded(BenchCalibration.degradedThreshold))
    assert(BenchCalibration.degraded(BenchCalibration.degradedThreshold + 1e-9))
    assert(BenchCalibration.degraded(6.5)) // the round-10 worst row
  }

  test("ratio honors the committed reference and the env override shape") {
    assert(BenchCalibration.ratio(BenchCalibration.referenceSeconds,
      BenchCalibration.referenceSeconds) === 1.0)
    assert(BenchCalibration.ratio(3.0, 1.5) === 2.0)
    assert(BenchCalibration.referenceSeconds > 0.0)
  }

  test("measure() reads positive and repeatable on the current host") {
    val a = BenchCalibration.measure(threads = 2, rounds = 2_000_000, repeats = 2)
    val b = BenchCalibration.measure(threads = 2, rounds = 2_000_000, repeats = 2)
    assert(a > 0.0 && b > 0.0)
    // min-of-repeats on the same host within the same second: same order
    // of magnitude (loose 5x band — this is a sanity pin, not a timing
    // assertion; the contention test below is the behavioral one)
    assert(math.max(a, b) / math.min(a, b) < 5.0,
      s"calibration wildly unrepeatable back-to-back: $a vs $b")
  }

  test("bandwidth flag flips strictly above its threshold") {
    assert(!BenchCalibration.bwDegraded(1.0))
    assert(!BenchCalibration.bwDegraded(BenchCalibration.bwDegradedThreshold))
    assert(BenchCalibration.bwDegraded(
      BenchCalibration.bwDegradedThreshold + 1e-9))
    assert(BenchCalibration.bwDegraded(12.0)) // ~the r15 q1 sf1 tilt
    assert(BenchCalibration.bwReferenceSeconds > 0.0)
  }

  test("withSentinel: quiet host runs once; degraded host re-runs ONCE; " +
      "probes BRACKET the suite; flags follow the reported run's probes " +
      "on EITHER axis") {
    def sentinel(probes: (Double, Double)*)
        : (Int, Double, Double, Double, Double, Double, Boolean, Boolean, Int) = {
      val it = probes.iterator
      var suiteRuns = 0
      val s = BenchCalibration.withSentinel(
        () => { suiteRuns += 1; suiteRuns },
        () => { val (c, b) = it.next(); BenchCalibration.Probes(c, b) })
      (s.result, s.pre.cpu, s.post.cpu, s.pre.bw, s.post.bw, s.ratioMax,
        s.hostDegraded, s.suiteRerun, suiteRuns)
    }
    // quiet throughout on both axes: one pass, both probes consumed
    assert(sentinel((1.0, 1.0), (1.2, 1.3)) ===
      ((1, 1.0, 1.2, 1.0, 1.3, 1.2, false, false, 1)))
    // CPU contention arriving MID-run (the round-11 capture): rerun,
    // quiet second pass reports its own probes, flag CLEAR
    assert(sentinel((1.1, 1.0), (3.0, 1.0), (1.0, 1.0), (1.2, 1.1)) ===
      ((2, 1.0, 1.2, 1.0, 1.1, 1.2, false, true, 2)))
    // BANDWIDTH tilt at quiet spin ratios — the round-15 failure mode
    // (q1 sf1 12-20x inflated, spin probe 1.04): the bw axis alone must
    // trigger the rerun; the quiet second pass clears the flag
    assert(sentinel((1.04, 1.0), (1.0, 4.0), (1.0, 1.1), (1.0, 1.2)) ===
      ((2, 1.0, 1.0, 1.1, 1.2, 1.0, false, true, 2)))
    // contended throughout (bw on the reported pass): one rerun only,
    // flag SET, headline ratio stays the CPU max of the reported pass
    assert(sentinel((3.0, 1.0), (3.5, 1.0), (1.0, 4.0), (1.1, 2.5)) ===
      ((2, 1.0, 1.1, 4.0, 2.5, 1.1, true, true, 2)))
  }

  test("measureBandwidth reads positive and repeatable on a live session") {
    val spark = TestSpark.spark
    val a = BenchCalibration.measureBandwidth(spark, repeats = 2)
    val b = BenchCalibration.measureBandwidth(spark, repeats = 2)
    assert(a > 0.0 && b > 0.0)
    assert(math.max(a, b) / math.min(a, b) < 5.0,
      s"bandwidth probe wildly unrepeatable back-to-back: $a vs $b")
    // the frozen fixture is deterministic: the probe aggregate's result
    // is a fixed value, so the work measured is the committed workload
    import org.apache.spark.sql.functions._
    val chk = spark.read.parquet(BenchCalibration.ensureBwFixture(spark))
      .filter(col("h") % 5 =!= 0)
      .agg(sum(col("v")), count(lit(1))).head()
    assert(chk.getLong(1) > 6_000_000L && chk.getLong(1) < 8_000_000L)
  }

  test("synthetic oversubscription inflates the measurement the flag reads") {
    // reproduce the round-10 failure mode: measure quiet, then measure
    // again while 3x-the-cores background spinners oversubscribe the
    // host. The loaded reading must inflate well past the quiet one —
    // that inflation (vs the committed quiet reference) is exactly what
    // host_degraded reports. Quiet and loaded run back-to-back so any
    // ambient contention cancels out of the ratio.
    val cores = Runtime.getRuntime.availableProcessors()
    val quiet = BenchCalibration.measure(threads = cores,
      rounds = 4_000_000, repeats = 3)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sink = new java.util.concurrent.atomic.AtomicLong(0L)
    val spinners = (0 until cores * 3).map { _ =>
      val th = new Thread(() => {
        while (!stop.get()) sink.getAndAdd(BenchCalibration.spin(1_000_000))
      })
      th.setDaemon(true); th.start(); th
    }
    try {
      val loaded = BenchCalibration.measure(threads = cores,
        rounds = 4_000_000, repeats = 3)
      val inflation = loaded / quiet
      assert(inflation > 1.5,
        s"3x oversubscription inflated the probe only ${inflation}x " +
          s"($quiet s -> $loaded s) — the sentinel would miss a contended host")
    } finally {
      stop.set(true)
      spinners.foreach(_.join(2000))
    }
  }
}
