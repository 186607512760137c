package graft.operators

/** Run INDEPENDENT Spark actions concurrently from the driver
  * (optimization guide §2.6: actions are only sequential because
  * driver code calls them sequentially — submitting independent jobs
  * from a small pool lets the next job's tasks back-fill executors
  * freed by the current job's straggler tail, instead of paying each
  * job's fixed scheduling + tail latency end-to-end).
  *
  * Contract: the thunks must be independent — no thunk may read
  * state another thunk writes (the callers here overlap writes to
  * DISJOINT directories, or serves whose per-page state is local by
  * construction). Results come back in input order, so a caller's
  * downstream composition is deterministic regardless of completion
  * order. The first failure is rethrown (its cause, not the
  * ExecutionException wrapper) after every thunk has been submitted;
  * outstanding thunks still complete on the pool before it dies —
  * a failed sibling never half-cancels a write mid-file.
  *
  * The pool is per-call and sized min(maxConcurrent, thunks) — a few
  * concurrent jobs is enough to fill a scheduling gap or a stage
  * tail (guide: "2-3 jobs in flight is plenty"), and the bound keeps
  * the driver's concurrent footprint (page states, committer
  * buffers) a small constant independent of cluster size. */
private[graft] object Par {

  /** Serializes the (getPersistentRDDs snapshot → localCheckpoint
    * registration → snapshot delta) window of the operators'
    * `checkpointPinned` helpers: the delta-capture reads GLOBAL
    * SparkContext state, so two concurrent checkpoints could each
    * capture the other's pinned RDDs and later unpersist blocks a
    * sibling loop still needs — fatal for locally-checkpointed RDDs,
    * whose lineage is truncated. The lock covers only the lazy
    * REGISTRATION (no job runs under it — registration is a few map
    * inserts), so concurrent iterative operators serialize
    * microseconds, not their materialization jobs. */
  private[graft] val checkpointRegistration = new Object

  def run[A](thunks: Seq[() => A], maxConcurrent: Int = 4): Seq[A] = {
    require(maxConcurrent > 0, s"maxConcurrent=$maxConcurrent must be positive")
    if (thunks.lengthCompare(2) < 0) return thunks.map(_())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(maxConcurrent, thunks.length))
    try {
      val futs = thunks.map { t =>
        pool.submit(new java.util.concurrent.Callable[A] {
          def call(): A = t()
        })
      }
      futs.map { f =>
        try f.get()
        catch {
          case e: java.util.concurrent.ExecutionException =>
            throw Option(e.getCause).getOrElse(e)
        }
      }
    } finally pool.shutdown()
  }
}
