package graft

/** Per-advance wall-clock receipts for multi-commit LIFECYCLE queries
  * (seed + N advances): the slowest bench entries are lifecycles
  * whose one total can mask a regression in a single advance — a
  * 12-second query that got 4 s slower in exactly one of its five
  * commits looks like uniform noise from the outside. A query's body
  * wraps each advance in [[Phases.timed]]; [[Bench]] resets before
  * and drains after every timed rep and emits the per-advance minima
  * as an `"advances"` object in BENCH_SELF, so the next regression
  * names its advance. Always-on cost is one map put per advance
  * (microseconds); Verify runs simply never drain.
  *
  * Single-threaded by design: Bench runs queries sequentially on the
  * driver, so a plain var-map under synchronization suffices — no
  * thread-local plumbing.
  */
object Phases {

  private val samples =
    scala.collection.mutable.LinkedHashMap.empty[String, Double]

  def timed[T](label: String)(body: => T): T = {
    val t0 = System.nanoTime()
    try body
    finally synchronized {
      samples.update(label, (System.nanoTime() - t0) / 1e9)
    }
  }

  private[graft] def reset(): Unit = synchronized(samples.clear())

  /** The labels and seconds recorded since the last [[reset]], in
    * first-recorded order.
    */
  private[graft] def drain(): Seq[(String, Double)] = synchronized {
    val out = samples.toSeq
    samples.clear()
    out
  }
}
