package graft

/** Round-10 alias, kept so `sbt "Test/runMain graft.ProfileQ33"` and the
  * BASELINE/BUILDLOG references to it keep working — since round 11 it
  * simply delegates to the generic [[ProfileQuery]] with its original
  * query pair and defaults (10 warm reps, sf0.1, shared session). See
  * ProfileQuery's scaladoc for the min-vs-median rationale and the
  * q133/q78 session-cache caveat that originated here. */
object ProfileQ33 {
  // Extra args (e.g. --fresh, --reps=N) forward to the generic main —
  // silently dropping them would let a --fresh A/B run the cached path.
  def main(a: Array[String]): Unit =
    ProfileQuery.main(Array("q33_neardup_pairs", "q133_dedup_roi") ++ a)
}
