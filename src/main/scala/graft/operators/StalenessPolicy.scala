package graft.operators

/** The ONE staleness rule both maintained artifacts share (VERDICT
  * r19 item 5 — [[Similarity.needsRefit]] and [[KnnGraph.needsRebuild]]
  * previously duplicated this predicate, and two copies of a policy
  * threshold drift apart the first time one changes): an artifact is
  * stale when the rows appended since the build exceed
  * `maxAppendFraction` of the rows the build actually saw.
  *
  * This is staleness ACCOUNTING, not a measured recall cliff — it
  * bounds how much of the artifact went through the bounded
  * incremental update (code append / NN-Descent edge merge) instead
  * of a full fit; the PROBES `refit:*` curve documents what a refit
  * buys at each fraction. An artifact with no appends is never stale
  * by this policy, whatever its base count says.
  */
object StalenessPolicy {

  def exceeded(nBase: Long, nAppended: Long,
      maxAppendFraction: Double): Boolean = {
    require(maxAppendFraction > 0.0,
      s"StalenessPolicy: maxAppendFraction must be > 0, got $maxAppendFraction")
    nAppended > 0L &&
      (nBase <= 0L || nAppended.toDouble / nBase > maxAppendFraction)
  }
}
