package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the COMMITTED band file (bench_detail.json) to the live retry
  * defense's expectations. BenchRetrySpec proves the pure logic on
  * synthetic lines; nothing until this spec proved the artifact the
  * driver-run Bench actually reads. The failure modes this catches are
  * all silent at runtime BY DESIGN (Bench must run on band-less hosts,
  * so an unreadable/mismatched band just disables retries):
  *   - a band refresh that wrote a truncated or malformed file
  *     → parseBand comes back partial/empty, defense quietly off;
  *   - a query rename without a band refresh
  *     → orphaned band entries + a band-less query (over_band loses its
  *       denominator for it);
  *   - a refresh sampled at the wrong scale dir
  *     → parseBandSf mismatch disables the defense at the driver's sf0.1.
  */
object BandFileSpec {
  /** Nearest ancestor of `start` (inclusive) containing build.sbt — the
    * repo root under sbt's single-module layout. Factored out of the band
    * lookup so the walk-up itself is testable from a nested start dir
    * (the exact fork-cwd scenario the anchoring exists to protect).
    */
  def findRepoRoot(start: java.nio.file.Path): Option[java.nio.file.Path] =
    Iterator.iterate(start.toAbsolutePath)(_.getParent).takeWhile(_ != null)
      .find(d => java.nio.file.Files.exists(d.resolve("build.sbt")))
}

class BandFileSpec extends AnyFunSuite {

  /** Lazy + root-anchored so a missing/unreadable band surfaces as each
    * test's own assertion message, not a suite-abort in the constructor
    * (r11 ADVICE). Root-anchoring is real (r12 ADVICE): walk up from
    * user.dir until a directory containing build.sbt is found, so a
    * different sbt fork cwd (or a future nested-module layout) still
    * resolves the REPO ROOT's committed band, not some other
    * bench_detail.json that happens to sit in the fork cwd.
    */
  private lazy val text: String = {
    val start = java.nio.file.Paths.get(sys.props("user.dir"))
    val root = BandFileSpec.findRepoRoot(start)
    root.map(_.resolve("bench_detail.json")) match {
      case Some(p) if java.nio.file.Files.isReadable(p) =>
        new String(java.nio.file.Files.readAllBytes(p))
      case other =>
        fail(s"bench_detail.json not readable at ${other.orNull} " +
          "(walked up from cwd=" + sys.props("user.dir") + " looking for " +
          "build.sbt) — the committed band file must live at the repo " +
          "root; re-run dev/band_median.py per BASELINE.md")
    }
  }

  test("committed band parses to exactly the declared query set") {
    val band = Bench.parseBand(text)
    val declared = SparkEntry.queries.keySet
    val orphaned = band.keySet -- declared
    val bandless = declared -- band.keySet
    assert(orphaned.isEmpty,
      s"band entries for undeclared queries (stale after a rename?): $orphaned")
    assert(bandless.isEmpty,
      s"declared queries with no band entry (refresh the band per " +
        s"BASELINE.md before round end): $bandless")
  }

  test("committed band entries are all positive seconds") {
    val band = Bench.parseBand(text)
    assert(band.nonEmpty)
    val bad = band.filter(_._2 <= 0)
    assert(bad.isEmpty, s"non-positive band entries (retryPlan skips them): $bad")
    // parseBand's [0-9.]+ entry regex never matches a minus sign, so a
    // negative band value is dropped by the parser and would otherwise
    // surface only as a 'bandless' key in the first test (r11 ADVICE).
    // Scan the raw text so the failure names the actual defect — scoped
    // to the SAME "queries" object capture parseBand uses (r12 ADVICE:
    // the old whole-file q-prefix scan missed non-q keys inside queries
    // and could false-positive on q-keys outside it).
    val queriesObj = """"queries"\s*:\s*\{([^}]*)\}""".r
    val negative = queriesObj.findFirstMatchIn(text).toList.flatMap { m =>
      """"([^"]+)"\s*:\s*-[0-9.]+""".r
        .findAllMatchIn(m.group(1)).map(_.group(1)).toList
    }
    assert(negative.isEmpty,
      s"negative band entries in raw bench_detail.json: $negative")
  }

  test("committed band has no duplicate query keys") {
    // parseBand ends in .toMap, which silently keeps the LAST entry for a
    // duplicated key — a malformed band_median.py merge would surface as
    // a band whose retry thresholds are whichever duplicate came last,
    // with no parse error anywhere. Count raw entries against the map.
    val queriesObj = """"queries"\s*:\s*\{([^}]*)\}""".r
    val rawKeys = queriesObj.findFirstMatchIn(text).toList.flatMap { m =>
      """"([^"]+)"\s*:""".r.findAllMatchIn(m.group(1)).map(_.group(1)).toList
    }
    val dupes = rawKeys.groupBy(identity).collect { case (k, vs) if vs.size > 1 => k }
    assert(dupes.isEmpty, s"duplicate band entries (last-wins silently): $dupes")
    assert(rawKeys.size === Bench.parseBand(text).size)
  }

  test("committed band was sampled at the driver's scale dir") {
    // A mismatch here means the driver-run Bench at sf0.1 silently
    // disables every retry — exactly the state this spec exists to catch.
    assert(Bench.parseBandSf(text) === Some("/root/testdata/sf0.1"))
  }

  test("committed band records the 3+ samples the protocol requires") {
    val n = """"band_samples"\s*:\s*(\d+)""".r
      .findFirstMatchIn(text).map(_.group(1).toInt)
    assert(n.exists(_ >= 3),
      s"band_samples=$n — the band must come from dev/band_median.py over 3+ idle samples")
  }

  test("root walk-up finds the repo root from a nested start dir") {
    // The fork-cwd scenario the anchoring protects against: a start dir
    // BELOW the repo root must resolve to the build.sbt directory, not to
    // the start dir itself (which, pre-fix, is where both candidates of
    // the old two-entry lookup resolved).
    import java.nio.file.{Files, Paths}
    val cwd = Paths.get(sys.props("user.dir")).toAbsolutePath
    val expectedRoot = BandFileSpec.findRepoRoot(cwd)
      .getOrElse(fail(s"no build.sbt above $cwd"))
    val nested = Files.createTempDirectory(
      expectedRoot.resolve("target"), "bandspec-nested")
    try {
      assert(BandFileSpec.findRepoRoot(nested) === Some(expectedRoot),
        "walk-up from a nested dir must land on the repo root")
      // And from a dir OUTSIDE any sbt project (no build.sbt ancestor up
      // to /tmp's root), the walk-up must report None, not a wrong root.
      val outside = Files.createTempDirectory("bandspec-outside")
      try assert(BandFileSpec.findRepoRoot(outside).forall(
        r => Files.exists(r.resolve("build.sbt"))),
        "a found root must actually contain build.sbt")
      finally Files.deleteIfExists(outside)
    } finally Files.deleteIfExists(nested)
  }
}
