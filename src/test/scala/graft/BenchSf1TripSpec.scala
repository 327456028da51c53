package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins [[Bench.resolveSf1Leg]] — the sf1 leg's tilt-handling contract
  * (round-16 verdict item 1: when a headline row tripped the 3×-median
  * rule on BOTH passes, the artifact shipped the tilted wall with only a
  * flag; dedup_minhash r16 read 79.9 s against 9.0–9.6 s quiet legs).
  * The function is pure over injected leg/re-measure thunks, so every
  * branch — clean pass, probe-tilt rerun, forced trip with a quiet
  * re-measure adopted, forced trip surviving the re-measure — is driven
  * synthetically without timing anything. Also pins the generated
  * quiet-median resource against a fresh recompute from the archived
  * legs it names (round-16 verdict item 2: the previous hand-edited map
  * drifted 7.0 vs 9.3 without anything failing).
  */
class BenchSf1TripSpec extends AnyFunSuite {

  private val quiet = BenchCalibration.Probes(1.0, 1.0)
  private def pass(rows: Seq[(String, Double)],
                   pre: BenchCalibration.Probes = quiet,
                   post: BenchCalibration.Probes = quiet): Bench.LegPass =
    Bench.LegPass(rows,
      rows.map { case (n, v) => n -> (v, v + 0.1) },
      pre, post,
      rows.map { case (n, _) => s"sf1:$n" -> 50.0 },
      rows.map { case (n, _) => s"sf1:$n" -> 0.05 })

  private val medians = Map("qa" -> 1.0, "qb" -> 2.0)

  /** runLeg thunk serving a fixed sequence of passes; fails the test if
    * the resolver asks for more passes than the scenario scripted.
    */
  private def legs(passes: Bench.LegPass*): () => Bench.LegPass = {
    val it = passes.iterator
    () => { assert(it.hasNext, "resolver ran more legs than scripted"); it.next() }
  }

  private def noRemeasure: String => (Double, Double) =
    n => fail(s"resolver re-measured $n in a scenario with no trips")

  test("clean leg: one pass, no rerun, no trips, no re-measure") {
    val out = Bench.resolveSf1Leg(
      legs(pass(Seq("qa" -> 0.9, "qb" -> 1.8))), noRemeasure, medians)
    assert(!out.rerun && out.trips.isEmpty && out.remeasured.isEmpty)
    assert(out.rows == Seq("qa" -> 0.9, "qb" -> 1.8))
    assert(out.probes.size == 1)
  }

  test("exactly 3x the median does not trip (the rule is strictly above)") {
    val out = Bench.resolveSf1Leg(
      legs(pass(Seq("qa" -> 3.0, "qb" -> 1.0))), noRemeasure, medians)
    assert(!out.rerun && out.trips.isEmpty)
  }

  test("probe tilt alone reruns once and keeps the quieter pass") {
    val loud = BenchCalibration.Probes(1.4, 1.0) // > 1.15 cpu leg threshold
    val out = Bench.resolveSf1Leg(
      legs(pass(Seq("qa" -> 0.9), pre = loud),
        pass(Seq("qa" -> 0.8))),
      noRemeasure, medians)
    assert(out.rerun && out.probes.size == 2)
    assert(out.rows == Seq("qa" -> 0.8), "quieter second pass must be kept")
    assert(out.trips.isEmpty && out.remeasured.isEmpty)
    assert(out.cpu == Seq("sf1:qa" -> 50.0) && out.gc == Seq("sf1:qa" -> 0.05),
      "the chosen pass's cpu AND gc slices must ship, not the mix")
  }

  test("gcTotalSec is non-negative and never decreases") {
    val g0 = Bench.gcTotalSec()
    assert(g0 >= 0.0)
    // provoke collection work; explicit gc may be a no-op on some JVMs,
    // so the assertion is monotonicity, not a strict increase
    var junk: Array[Byte] = null
    (1 to 50).foreach { _ => junk = new Array[Byte](4 << 20) }
    require(junk != null)
    System.gc()
    assert(Bench.gcTotalSec() >= g0, "cumulative GC time must not go backwards")
  }

  test("row tripping both passes gets a targeted re-measure; a quiet " +
      "re-measure is adopted and clears the trip") {
    val remeasured = scala.collection.mutable.ArrayBuffer[String]()
    val out = Bench.resolveSf1Leg(
      legs(pass(Seq("qa" -> 0.9, "qb" -> 79.9)),
        pass(Seq("qa" -> 0.9, "qb" -> 142.2))),
      n => { remeasured += n; (2.3, 2.1) },
      medians)
    assert(out.rerun)
    assert(remeasured.toSeq == Seq("qb"), "only the tripped row is re-measured")
    assert(out.rows.toMap.apply("qb") == 2.1,
      "the reported wall is the min over leg + re-measure")
    assert(out.adopted == Set("qb"))
    assert(out.trips.isEmpty,
      "a quiet re-measure self-adjudicates the row — no residual flag")
    assert(out.remeasured == Seq("qb" -> ((2.3, 2.1))),
      "the re-measure's raw walls ship for the artifact")
  }

  test("re-measure that still trips leaves the row flagged with the min wall") {
    val out = Bench.resolveSf1Leg(
      legs(pass(Seq("qb" -> 79.9)), pass(Seq("qb" -> 142.2))),
      _ => (60.0, 71.0),
      medians)
    assert(out.rows == Seq("qb" -> 60.0))
    assert(out.trips == Seq("qb"),
      "three tilted measurements: the row must stay flagged")
    assert(out.adopted == Set("qb"))
  }

  test("failed re-measure walls (-1 sentinel) never win the min") {
    val out = Bench.resolveSf1Leg(
      legs(pass(Seq("qb" -> 79.9)), pass(Seq("qb" -> 142.2))),
      _ => (-1.0, -1.0),
      medians)
    assert(out.rows == Seq("qb" -> 79.9) && out.trips == Seq("qb"))
    assert(out.adopted.isEmpty)
  }

  test("failed leg rows (-1 sentinel) never trip") {
    val out = Bench.resolveSf1Leg(
      legs(pass(Seq("qa" -> -1.0, "qb" -> 1.0))), noRemeasure, medians)
    assert(!out.rerun && out.trips.isEmpty)
  }

  test("pass with fewer trips wins even when its probes are louder") {
    val loud = BenchCalibration.Probes(1.1, 1.4) // under leg thresholds
    val out = Bench.resolveSf1Leg(
      legs(pass(Seq("qa" -> 5.0, "qb" -> 1.0)), // qa trips (median 1.0)
        pass(Seq("qa" -> 0.9, "qb" -> 1.0), pre = loud, post = loud)),
      noRemeasure, medians)
    assert(out.rerun && out.rows.toMap.apply("qa") == 0.9 && out.trips.isEmpty)
  }

  test("generated medians resource matches a recompute from its archived legs") {
    mediansResourceMatchesLegs("/graft/sf1_quiet_medians.tsv", Bench.sf1QuietMedians)
  }

  test("generated sf0.1 medians resource matches a recompute from its archived legs") {
    // round-18 verdict item 7: the sf0.1 row tilt flag's baseline gets the
    // same provenance check as the sf1 one — the committed medians must be
    // recomputable from the archived legs named in the resource header
    mediansResourceMatchesLegs("/graft/sf01_quiet_medians.tsv", Bench.sf01QuietMedians)
  }

  private def mediansResourceMatchesLegs(
      resource: String, loaded: Map[String, Double]): Unit = {
    import org.json4s.jackson.JsonMethods
    val srcLines = {
      val in = getClass.getResourceAsStream(resource)
      assert(in != null, "resource missing — run scripts/gen_sf1_medians.py")
      val s = scala.io.Source.fromInputStream(in, "UTF-8")
      try s.getLines().toVector finally s.close()
    }
    val legFiles = srcLines.find(_.startsWith("# legs: "))
      .map(_.stripPrefix("# legs: ").split(",").toSeq)
      .getOrElse(fail("resource lost its provenance header"))
    assert(legFiles.size >= 2, s"need at least two quiet legs: $legFiles")
    val walls: Map[String, Seq[Double]] = legFiles.map { f =>
      val path = java.nio.file.Paths.get(f)
      assert(java.nio.file.Files.isRegularFile(path), s"archived leg $f missing")
      val json = JsonMethods.parse(new String(
        java.nio.file.Files.readAllBytes(path), "UTF-8"))
      (json \ "queries") match {
        case org.json4s.JObject(fields) =>
          fields.collect { case (k, org.json4s.JDouble(v)) => k -> v }.toMap
        case other => fail(s"$f queries object unreadable: $other")
      }
    }.foldLeft(Map.empty[String, Seq[Double]]) { (acc, m) =>
      m.foldLeft(acc) { case (a, (k, v)) => a.updated(k, a.getOrElse(k, Seq()) :+ v) }
    }
    def median(xs: Seq[Double]): Double = {
      val s = xs.sorted
      val mid = if (s.size % 2 == 1) s(s.size / 2)
        else (s(s.size / 2 - 1) + s(s.size / 2)) / 2
      math.round(mid * 1000) / 1000.0
    }
    Bench.headline.foreach { n =>
      val expected = median(walls.getOrElse(n,
        fail(s"archived legs lack headline row $n")))
      assert(loaded.get(n).contains(expected),
        s"median for $n drifted: resource ${loaded.get(n)} " +
          s"vs recomputed $expected — rerun scripts/gen_sf1_medians.py")
    }
    assert(loaded.keySet == Bench.headline.toSet,
      "every headline row (and only those) carries a quiet median")
  }
}
