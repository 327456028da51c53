package graft

/** Host-contention sentinel for [[Bench]] (round-10 verdict item 1: the
  * driver's BENCH_r10.json was captured on a contended host — every row
  * 2–6.5× above the repo's four archived same-code runs, including rows
  * whose code hadn't changed — and nothing in the artifact said so).
  *
  * The probe is a fixed CPU-bound spin with NO I/O, NO allocation and NO
  * Spark: an xxhash-style 64-bit avalanche loop run simultaneously on
  * every available core. On a quiet host it takes a committed, repeatable
  * number of wall seconds ([[referenceSeconds]], measured on the dev/CI
  * host this repo is graded on); on an oversubscribed host the threads
  * get fractional cores and the wall time inflates by roughly the
  * oversubscription factor — exactly the signature that inflated
  * BENCH_r10's untouched rows. Bench runs the probe before the suite,
  * emits `calibration_ratio` (measured ÷ reference) and `host_degraded`
  * (ratio > [[degradedThreshold]]) in BOTH JSON lines, and re-runs the
  * suite ONCE when the first probe reads degraded — so the driver's
  * 2×-vs-baseline gate can never read a contended capture at face value
  * without the artifact saying so.
  *
  * The loop's result is checked against a pinned checksum
  * ([[expectedChecksum]], independently recomputed in
  * `BenchCalibrationSpec` and by a Python big-int replay) so JIT dead-code
  * elimination can't hollow out the measurement and the loop body can't
  * drift silently.
  */
object BenchCalibration {

  /** Rounds per thread: ~10⁷ multiply-xor-shift steps ≈ tens of
    * milliseconds per core on 2020s hardware — long enough to average
    * over scheduler jitter, short enough to run three repeats for free.
    */
  val defaultRounds: Int = 10_000_000

  /** spin(defaultRounds) — pinned so the measured work is provably the
    * committed loop (recomputed independently in BenchCalibrationSpec).
    */
  val expectedChecksum: Long = -406421906486430661L

  /** Committed quiet-host wall seconds for measure() on the reference
    * host (32 cores, measured round 11; see BENCH.md "Calibration").
    * Measured INSIDE a quiet Bench JVM after the Spark warmups (a bare
    * JVM reads ~0.015 s; the live heap and JIT state add ~30 %, and the
    * ratio must be ~1.0 in the context where it's evaluated). Override
    * with SPARK_GRAFT_CALIB_REF when benching on different hardware —
    * the ratio is only meaningful against the host class the reference
    * was measured on.
    */
  val referenceSeconds: Double = 0.021

  /** Ratio above which the host is flagged degraded. 1.5 leaves room for
    * turbo/thermal variance (quiet repeats measured within ±15 %) while
    * catching the 2–6× inflation a contended host shows.
    */
  val degradedThreshold: Double = 1.5

  /** The fixed avalanche loop — xorshift-multiply over the golden-ratio
    * seed; every step depends on the previous, so it can't vectorize
    * away, and the returned value feeds the checksum so it can't be
    * eliminated. */
  def spin(rounds: Int): Long = {
    var h = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < rounds) {
      h ^= i
      h *= 0xC2B2AE3D27D4EB4FL
      h ^= (h >>> 29)
      i += 1
    }
    h
  }

  /** All-cores wall seconds for one spin per thread, min of `repeats`
    * (min, not mean: we want the host's BEST case — if even the best
    * repeat is slow, the host is genuinely contended, while a single
    * slow repeat is just scheduler noise). Threads all start on a
    * barrier; the measured span is start→last-finish, so ANY thread
    * being starved inflates it — which is the point.
    */
  def measure(threads: Int = Runtime.getRuntime.availableProcessors(),
              rounds: Int = defaultRounds,
              repeats: Int = 3): Double = {
    require(threads > 0 && repeats > 0)
    val sink = new java.util.concurrent.atomic.AtomicLong(0L)
    def once(): Double = {
      val barrier = new java.util.concurrent.CyclicBarrier(threads + 1)
      val ts = (0 until threads).map { _ =>
        val th = new Thread(() => {
          barrier.await()
          sink.getAndAdd(spin(rounds))
          ()
        })
        th.setDaemon(true)
        th.start()
        th
      }
      barrier.await()
      val t0 = System.nanoTime()
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e9
    }
    // warm the JIT outside the measurement
    require(spin(defaultRounds) == expectedChecksum,
      "calibration loop drifted from its pinned checksum")
    val best = (0 until repeats).map(_ => once()).min
    require(sink.get() != 0L) // keep the spins observable
    best
  }

  def reference: Double =
    sys.env.get("SPARK_GRAFT_CALIB_REF").map(_.toDouble)
      .getOrElse(referenceSeconds)

  def ratio(measured: Double, ref: Double = reference): Double =
    measured / ref

  def degraded(r: Double): Boolean = r > degradedThreshold

  // --- Memory/IO-bandwidth probe (round-16 verdict item 1) ---
  //
  // The CPU spin probe is blind to MEMORY/IO tilt: BENCH_r15's driver
  // capture shipped q1_group_count_avg sf1 at 12.3–20.0 s (same code's
  // quiet legs: 0.67–0.69 s) while the spin probe read 1.04 "quiet" —
  // scan/shuffle-bound rows were inflated 4–20× and crunch-bound rows
  // were flat, the signature of bandwidth contention the spin loop
  // cannot see. This probe exercises exactly the tilted path: a fixed
  // parquet scan (frozen deterministic fixture under local/) through a
  // small groupBy shuffle into the noop sink — scan, decode, hash
  // exchange, nothing else. Warm pass first (page cache + codegen), then
  // min-of-repeats like the spin probe.

  /** Committed quiet-host wall seconds for [[measureBandwidth]] on the
    * reference host (same 32-core class as [[referenceSeconds]], measured
    * round 16 inside live Bench-shaped JVMs at local[32]: six quiet
    * readings 0.47–0.71 s, typical 0.52). Override with
    * SPARK_GRAFT_CALIB_BW_REF on different hardware.
    */
  val bwReferenceSeconds: Double = 0.52

  /** Bandwidth tilt threshold. Spark-job walls carry more scheduler
    * variance than the bare spin loop (quiet repeats within ±25% vs
    * ±15%), so the flag trips at 2.0 — far below the 4–20× inflation it
    * exists to catch, comfortably above quiet jitter.
    */
  val bwDegradedThreshold: Double = 2.0

  def bwReference: Double =
    sys.env.get("SPARK_GRAFT_CALIB_BW_REF").map(_.toDouble)
      .getOrElse(bwReferenceSeconds)

  def bwDegraded(r: Double): Boolean = r > bwDegradedThreshold

  /** The frozen probe fixture: 8M rows of (id, k, h, v), all derived
    * deterministically from `id` — regenerating it on any host yields
    * byte-equivalent content, so the probe workload is fixed even though
    * local/ is not committed. ~64 MB on disk; one write per checkout.
    *
    * Publication is write-to-temp + atomic rename (round-16 advice): the
    * check-then-write was only synchronized within one JVM, so an `sbt
    * test` run and a concurrent Bench run sharing the checkout could
    * both pass the `_SUCCESS` check and write the directory over each
    * other — or one could scan a half-written directory. With the
    * rename, a reader either sees no fixture (and builds its own temp)
    * or a COMPLETE one; the race loser just discards its temp copy (the
    * content is deterministic, so both copies are byte-equivalent and
    * which one wins is immaterial).
    */
  def ensureBwFixture(spark: org.apache.spark.sql.SparkSession): String = {
    val path = "local/calib_bw.parquet"
    val target = java.nio.file.Paths.get(path)
    val done = target.resolve("_SUCCESS")
    if (!java.nio.file.Files.exists(done)) synchronized {
      if (!java.nio.file.Files.exists(done)) {
        import org.apache.spark.sql.functions._
        val tmp = path + ".tmp-" + java.util.UUID.randomUUID().toString
        spark.range(0L, 8_000_000L, 1L, 32)
          .select(col("id"),
            pmod(col("id") * 2654435761L, lit(997L)).as("k"),
            xxhash64(col("id")).as("h"),
            col("id").bitwiseXOR(shiftright(col("id"), 13)).as("v"))
          .write.mode("overwrite").parquet(tmp)
        try {
          // a leftover HALF-written target (crashed run: dir exists, no
          // _SUCCESS) blocks the rename — clear it first; a COMPLETE one
          // can only have appeared via another JVM's atomic rename
          if (java.nio.file.Files.exists(target) &&
              !java.nio.file.Files.exists(done))
            graft.core.Tables.deleteRecursively(path)
          java.nio.file.Files.move(java.nio.file.Paths.get(tmp), target,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE)
        } catch { case _: java.nio.file.FileSystemException =>
          // rename lost a cross-JVM race — the winner's fixture is
          // byte-equivalent; require it complete and drop the temp copy
          if (!java.nio.file.Files.exists(done))
            throw new IllegalStateException(
              s"calib fixture rename failed and no complete fixture at $path")
          graft.core.Tables.deleteRecursively(tmp)
        }
      }
    }
    path
  }

  /** Wall seconds for one fixed scan+shuffle pass over the frozen
    * fixture, min of `repeats` after an untimed warm pass. Min, not
    * mean, for the same reason as [[measure]]: if even the best repeat
    * is slow, the bandwidth is genuinely contended.
    */
  def measureBandwidth(spark: org.apache.spark.sql.SparkSession,
                       repeats: Int = 3): Double = {
    val path = ensureBwFixture(spark)
    import org.apache.spark.sql.functions._
    def once(): Double = {
      val t0 = System.nanoTime()
      spark.read.parquet(path)
        .filter(col("h") % 5 =!= 0)
        .groupBy("k")
        .agg(sum(col("v")).as("sv"), count(lit(1)).as("n"), avg(col("id")).as("a"))
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once() // warm: page cache, codegen, parquet reader init
    (1 to repeats).map(_ => once()).min
  }

  private def round2(r: Double): Double = math.round(r * 100) / 100.0

  /** One probe reading, both axes, as RATIOS against their committed
    * references: `cpu` from the spin loop, `bw` from the scan+shuffle
    * probe. A host is contended when EITHER axis trips its threshold —
    * round 15 proved the axes are independent (bandwidth tilt at spin
    * ratio 1.04).
    */
  final case class Probes(cpu: Double, bw: Double) {
    def anyDegraded: Boolean = degraded(cpu) || bwDegraded(bw)
    def rounded: Probes = Probes(round2(cpu), round2(bw))
  }

  /** The artifact fields one sentinel run reports (round-11 contract,
    * both axes since round 16). Probes BRACKET the suite — round 11
    * showed a single pre-suite probe under-reads contention arriving
    * MID-run — and the reported `calibration_ratio` stays the CPU max
    * for cross-round comparability; the bandwidth pair ships alongside.
    */
  final case class Sentinel[T](result: T, pre: Probes, post: Probes,
                               hostDegraded: Boolean, suiteRerun: Boolean) {
    /** max CPU ratio of the reported pass — the headline
      * `calibration_ratio` (its r11 meaning, unchanged). */
    def ratioMax: Double = round2(math.max(pre.cpu, post.cpu))
  }

  private def bracketed[T](suite: () => T, probe: () => Probes)
      : (Probes, T, Probes) = {
    val pre = probe()
    val run = suite()
    val post = probe()
    (pre, run, post)
  }

  /** The sentinel's whole contract in one testable function: probe both
    * axes, run the suite, probe AGAIN; when EITHER probe of the first
    * pass reads degraded ON EITHER AXIS, re-run ONCE and report the
    * second pass with its own bracketing probes. `BenchCalibrationSpec`
    * pins the artifact semantics (one rerun max, flags follow the
    * REPORTED run's probes, bandwidth tilt alone triggers) without
    * timing anything.
    */
  def withSentinel[T](suite: () => T, probe: () => Probes): Sentinel[T] = {
    val (pre0, run0, post0) = bracketed(suite, probe)
    if (!pre0.anyDegraded && !post0.anyDegraded)
      Sentinel(run0, pre0.rounded, post0.rounded, hostDegraded = false,
        suiteRerun = false)
    else {
      // ASCII only: the forked JVM's default charset mangles wider chars
      System.err.println(f"[bench] calibration cpu ${pre0.cpu}%.2f/" +
        f"${post0.cpu}%.2f bw ${pre0.bw}%.2f/${post0.bw}%.2f vs thresholds " +
        f"$degradedThreshold/$bwDegradedThreshold -- host contended; " +
        "re-running the suite once")
      val (pre1, run1, post1) = bracketed(suite, probe)
      Sentinel(run1, pre1.rounded, post1.rounded,
        hostDegraded = pre1.anyDegraded || post1.anyDegraded,
        suiteRerun = true)
    }
  }
}
