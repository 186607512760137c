package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE spelling of the compaction dir-swap state machine, shared
  * by [[Similarity.compactIvfIndex]] and
  * [[TextAnalysis.compactBm25Index]] (r11 review: two hand-copied
  * protocols would have to be kept bit-equivalent by review alone).
  *
  * Protocol: take the [[withLock maintenance lock]], write the
  * compacted data to `tmp`, then [[swap]] — move `live` aside to
  * `old`, move `tmp` in, delete `old`. A crash between the renames is
  * healed by [[heal]] on the next call: `live` missing next to a
  * complete `tmp` (the caller only ever swaps AFTER the tmp write
  * finished) resumes the swap forward; missing next to only `old`
  * rolls back. Under the swap's own ordering the rollback branch is
  * unreachable (tmp always exists once live has been moved) — it is
  * kept as a defensive recovery for states produced OUTSIDE the
  * protocol, e.g. an operator deleting a tmp dir they judged corrupt.
  *
  * Concurrency enforcement (r11 ADVICE): appends and compactions on
  * the same index MUST NOT overlap — an append that recreates `live`
  * between swap's two renames strands the pre-compaction segments in
  * `old`, where a delete would be permanent silent data loss. Two
  * independent guards close that window:
  *
  *   1. the LOCK: compaction holds a sentinel file for its whole
  *      run ([[withLock]]) and every append calls
  *      [[assertUnlocked]] first, so a mis-scheduled overlap dies
  *      loudly at the append instead of racing the renames;
  *   2. REFUSE-LOUD recovery: even if a writer slips past the lock
  *      (the assert-then-write window, or a hand-run job), [[heal]]
  *      recognizes the poison state — `live`, `old` AND `tmp` all
  *      present — and throws instead of deleting `old`, so the
  *      stranded segments survive for a manual merge. The only
  *      state where `old` is deleted next to a live dir is the
  *      completed swap's unfinished tail (`tmp` already renamed
  *      away), where `old` is a stale pre-compaction copy by
  *      construction.
  */
private[operators] object IndexMaintenance {

  /** The compaction-in-progress sentinel for an index rooted at
    * `root` (underscore-prefixed: parquet readers ignore it). */
  def lockFile(root: Path): Path = new Path(root, "_maintenance_lock")

  /** Append-side guard: refuse to write into an index a compaction
    * is rewriting. Checked at append ENTRY — a compaction that
    * starts after the check is the residual race [[heal]]'s
    * refuse-loud branch covers. */
  def assertUnlocked(fs: FileSystem, lock: Path, what: String): Unit =
    require(!fs.exists(lock),
      s"$what refused: maintenance lock $lock is held — a compaction " +
        "is rewriting this index, and an append landing mid-swap " +
        "would recreate the live dir and strand the pre-compaction " +
        "segments (silent data loss). Retry after the compaction " +
        "finishes, or delete the lock file if its owner crashed.")

  /** Compaction-side guard: hold the sentinel for the body's whole
    * run. Creation is atomic (createNewFile) — a second concurrent
    * compaction, or one crashed holding the lock, fails loudly here
    * instead of double-swapping. A crashed owner's lock is released
    * by the operator deleting the file after verifying nothing is
    * live; the next compaction's [[heal]] then repairs any
    * half-swapped state. */
  def withLock[A](fs: FileSystem, lock: Path)(body: => A): A = {
    require(fs.createNewFile(lock),
      s"maintenance lock $lock already held — another compaction is " +
        "running (or one crashed holding it: verify no compaction is " +
        "live, then delete the lock file and re-run)")
    try body
    finally { fs.delete(lock, false); () }
  }

  def heal(fs: FileSystem, live: Path, tmp: Path, old: Path): Unit =
    if (!fs.exists(live)) {
      if (fs.exists(tmp)) {
        require(fs.rename(tmp, live), s"recovery rename $tmp -> $live failed")
        if (fs.exists(old)) require(fs.delete(old, true),
          s"recovered but could not delete $old")
      } else if (fs.exists(old))
        require(fs.rename(old, live), s"recovery rename $old -> $live failed")
    } else if (fs.exists(old)) {
      if (fs.exists(tmp))
        // live + old + tmp: a writer recreated `live` after swap moved
        // it to `old` (the rename(tmp, live) then failed, which is why
        // tmp survives). `old` holds every pre-compaction segment the
        // recreated `live` does NOT — deleting it here (or letting
        // swap() clear it) would be PERMANENT silent data loss.
        sys.error(s"refusing to heal: $live, $old and $tmp all exist — " +
          s"a writer recreated $live mid-swap, so $old holds segments " +
          s"$live does not. Merge $old's batch partitions back into " +
          s"$live (or run a full rebuild), delete $old and $tmp " +
          "manually, then re-run the compaction")
      else
        // live + old, no tmp: the previous swap COMPLETED its renames
        // and crashed before the final delete — old is a stale
        // pre-compaction copy, safe to clear
        require(fs.delete(old, true),
          s"could not delete completed-swap leftover $old")
    }

  def swap(fs: FileSystem, live: Path, tmp: Path, old: Path): Unit = {
    // heal() ran first: old absent, or heal threw / cleared it. An
    // old dir appearing here means the protocol was bypassed — refuse
    // rather than delete what might be the only copy of its segments.
    require(!fs.exists(old),
      s"$old exists at swap time — run heal() (and resolve what it " +
        "refuses) before swapping")
    require(fs.rename(live, old), s"rename $live -> $old failed")
    require(fs.rename(tmp, live), s"rename $tmp -> $live failed")
    require(fs.delete(old, true), s"compacted but could not delete $old")
  }
}
