package graft.sources

/** Arrival sensing for batch inputs — the reference's
  * `is_netcdf_ready.sh` runs from cron and checks the day's upload
  * directory before launching the pusher, so a half-uploaded netCDF is
  * never processed. Same contract here: poll a fixed set of expected
  * paths with a per-file readiness predicate until all pass or a
  * deadline expires.
  *
  * This is driver-side coordination (a handful of stat + header reads
  * per poll — no data movement), which is exactly where it belongs: at
  * 100 TB the gate's cost is O(#files) metadata operations,
  * independent of data volume. The always-on flavor of arrival
  * handling is [[graft.streaming.EventStream]]; this gate covers the
  * reference's scheduled-batch flavor where a run must not start
  * until its inputs are whole.
  */
object ArrivalGate {

  /** Outcome of one gate: either everything became ready, or the
    * deadline passed with `notReady` still pending (the caller decides
    * — skip the run, alert, retry next cron tick, like the reference). */
  final case class GateResult(ready: Boolean, waitedMs: Long, notReady: Seq[String])

  /** Poll until every path satisfies `isReady`, at `pollMs` intervals,
    * up to `timeoutMs`. Already-ready files are never re-checked —
    * each poll only re-tests the stragglers. `sleep`/`clock` are
    * injectable for deterministic specs. */
  def awaitReady(paths: Seq[String],
                 timeoutMs: Long,
                 pollMs: Long = 5000L,
                 isReady: String => Boolean = NetCdfClassic.isReady,
                 sleep: Long => Unit = Thread.sleep,
                 clock: () => Long = () => System.nanoTime() / 1000000L): GateResult = {
    val t0 = clock()
    var pending = paths.filterNot(isReady)
    while (pending.nonEmpty && clock() - t0 < timeoutMs) {
      sleep(math.min(pollMs, math.max(1L, timeoutMs - (clock() - t0))))
      pending = pending.filterNot(isReady)
    }
    GateResult(pending.isEmpty, clock() - t0, pending)
  }
}
