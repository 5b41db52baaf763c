package graft

import org.scalatest.funsuite.AnyFunSuite

/** Laws for the bench RECORD itself (no Spark session needed).
  *
  * The r20 driver's official BENCH record shipped `parsed: null`: the
  * trailer line — added precisely so a truncated-stdout record still
  * parses — embedded the FULL `band_breaches` map, and a co-load window
  * naming 20+ breaches pushed it past the harness's ~2000-char stdout
  * window. These laws pin the fix: every variable-size field on the
  * trailer is capped, so the worst-case trailer always fits intact and
  * always parses. */
class BenchSpec extends AnyFunSuite {
  // longest name in the inventory is 29 chars (stream_dedup_within_watermark);
  // use 30-char names so the law holds with margin for future rows
  private def longName(i: Int) = f"stream_dedup_watermark_row_$i%03d".take(30)

  private def worstReport(nBreaches: Int) = BenchBands.Report(
    loadFactor = 12.345,
    bandRows = 219,
    breaches = (0 until nBreaches).map { i =>
      BenchBands.Breach(longName(i), 1234.567, 987.654, 876.543, 99.99 - i)
    })

  // a ~1000-query inventory's worth of mid spins (one per 50 queries):
  // the trailer copy must stay capped however many fire (r21 ADVICE —
  // the old hardcoded 4-entry literal silently assumed today's inventory)
  private val manyMidSpins = (1 to 20).map(i => (i * 50, 10000.0 + i))

  private def worstTrailer(nBreaches: Int, nFailed: Int): String = {
    val calib = Bench.calibFragment(12345.6, 23456.7, manyMidSpins, capped = true)
    val topQs = (0 until 10)
      .map(i => "\"" + longName(i) + "\":" + f"${1234.567}%.3f")
      .mkString("{", ",", "}")
    Bench.trailerLine(
      total = 99999.999, nQueries = 219, calib = calib,
      bandTrailer = worstReport(nBreaches).trailerFragment,
      failed = (0 until nFailed).map(longName),
      topQs = topQs, sfDir = "/root/testdata/sf0.1")
  }

  test("worst-case trailer fits the ~2000-char stdout window and parses") {
    val line = worstTrailer(nBreaches = 40, nFailed = 12)
    assert(line.length < 1900,
      s"trailer is ${line.length} chars — it would not survive the stdout window intact")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(line)
    assert(root.get("metric").asText() == "total")
    assert(root.get("band_breaches_n").asInt() == 40)
    assert(root.get("band_breaches").size() == BenchBands.TrailerTopK)
    assert(root.get("failed_n").asInt() == 12)
    assert(root.get("failed").size() == 5)
    assert(root.get("queries").size() == 10)
  }

  test("trailer calib fragment caps mid spins (top-K by ms + count), main keeps all") {
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val capped = om.readTree(
      "{" + Bench.calibFragment(1.0, 2.0, manyMidSpins, capped = true) + "}")
    assert(capped.get("calib_mid_ms").size() == Bench.MidSpinTopK)
    assert(capped.get("calib_mid_n").asInt() == manyMidSpins.size)
    // the kept spins are the K largest by ms (the burst evidence), in
    // index order — here the last K constructed
    assert(capped.get("calib_mid_ms").get(0).get(0).asInt() ==
      manyMidSpins(manyMidSpins.size - Bench.MidSpinTopK)._1)
    val full = om.readTree(
      "{" + Bench.calibFragment(1.0, 2.0, manyMidSpins, capped = false) + "}")
    assert(full.get("calib_mid_ms").size() == manyMidSpins.size)
    assert(!full.has("calib_mid_n"))
  }

  test("trailer keeps the WORST breaches (top-5 by x), main line keeps all") {
    val r = worstReport(40)
    val trailer = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("{" + r.trailerFragment.drop(1) + "}")
    val kept = trailer.get("band_breaches").fieldNames()
    var worstX = Double.MaxValue
    while (kept.hasNext) {
      val x = trailer.get("band_breaches").get(kept.next()).get("x").asDouble()
      assert(x <= worstX); worstX = x
    }
    // the top-5 by x are exactly the first 5 constructed (x descending)
    assert(trailer.get("band_breaches").has(longName(0)))
    assert(trailer.get("band_breaches").has(longName(4)))
    assert(!trailer.get("band_breaches").has(longName(5)))
    val main = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree("{" + r.mainFragment.drop(1) + "}")
    assert(main.get("band_breaches").size() == 40)
  }

  test("rowSpin corrects each row by its bracketing spins (burst localization)") {
    // start idle, burst at the index-50 mid spin, idle again by 100 and on
    val spins = Seq((-1, 250.0), (50, 800.0), (100, 260.0), (150, 255.0), (219, 250.0))
    // rows bracketed by the burst spin are corrected by it…
    assert(BenchBands.rowSpin(spins, 10) == 800.0)
    assert(BenchBands.rowSpin(spins, 50) == 800.0)
    assert(BenchBands.rowSpin(spins, 99) == 800.0)
    // …rows whose brackets are both idle are NOT (the r20 failure mode:
    // endpoint-max correction smeared one burst over the whole record —
    // or, one-sided, named every row outside the burst a breach)
    assert(BenchBands.rowSpin(spins, 120) == 260.0)
    assert(BenchBands.rowSpin(spins, 180) == 255.0)
  }
}
