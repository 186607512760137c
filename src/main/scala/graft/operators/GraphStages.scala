package graft.operators

/** Bench-drive stage attribution for the graph-index ingest path
  * (r15 verdict #3: a streamingGraphIngest batch costs ~10 s at bench
  * scale and its split across frozen-graph serve / within-batch kNN /
  * partitioned writes / commit record was design knowledge, not a
  * measurement). The ingest kernels bracket their stages with
  * [[time]]; with no capture active the bracket is one volatile read
  * — the production path pays nothing. [[GraphIngestDrive]] runs the
  * bench's own ingest harness under [[capture]] and prints the
  * per-stage table PERF.md carries.
  *
  * Single-capturer by design (the sink is one global slot): captures
  * must not overlap — fine for its only callers, sequential drives.
  * The sink is written from the streaming micro-batch thread and read
  * by the drive thread; TrieMap + the volatile slot make that safe.
  * Stages are chosen NON-OVERLAPPING so their sum is attributable
  * wall time, not double-counted nesting.
  */
private[graft] object GraphStages {
  @volatile private var sink: scala.collection.concurrent.TrieMap[String, Double] = null

  /** Run `f` with stage capture enabled; returns (result, stage →
    * summed seconds across every bracket hit while `f` ran). */
  private[graft] def capture[A](f: => A): (A, Map[String, Double]) = {
    val buf = scala.collection.concurrent.TrieMap[String, Double]()
    sink = buf
    try { val a = f; (a, buf.toMap) } finally sink = null
  }

  /** Bracket one stage of `f`'s wall time into the active capture;
    * a plain passthrough when none is active. */
  private[graft] def time[A](stage: String)(f: => A): A = {
    val s = sink
    if (s == null) f
    else {
      val t0 = System.nanoTime()
      try f
      finally add(s, stage, (System.nanoTime() - t0) / 1e9)
    }
  }

  /** Accumulate a bare counter (reported in the same map; the value
    * is a COUNT, not seconds — names end in `_n` by convention). */
  private[graft] def count(stage: String): Unit = {
    val s = sink
    if (s != null) add(s, stage, 1.0)
  }

  private def add(s: scala.collection.concurrent.TrieMap[String, Double],
                  stage: String, v: Double): Unit = {
    s.updateWith(stage) {
      case Some(x) => Some(x + v)
      case None => Some(v)
    }: Unit
  }
}
