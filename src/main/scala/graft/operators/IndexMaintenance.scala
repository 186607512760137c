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
  * rolls back.
  *
  * Concurrency enforcement (r11 ADVICE): appends and compactions on
  * the same index MUST NOT overlap — an append that recreates `live`
  * between swap's two renames strands the pre-compaction segments in
  * `old`, where a delete would be permanent silent data loss. Three
  * independent guards close that window:
  *
  *   1. the LOCK: compaction holds a sentinel file for its whole run
  *      ([[withLock]]) and every append calls [[assertUnlocked]]
  *      first, so a mis-scheduled overlap dies loudly at the append
  *      instead of racing the renames. A compaction that FAILS keeps
  *      the lock (the index needs attention — releasing would let
  *      appends write into a half-swapped layout);
  *   2. NEST DETECTION in the swap itself: on HDFS-semantics
  *      filesystems `rename(tmp, live)` with a recreated `live` does
  *      not fail — it moves tmp INSIDE live (r12 review: the
  *      "rename fails, tmp survives" assumption was wrong there).
  *      [[renameIntoPlace]] checks for the nested dir, un-nests it
  *      back to `tmp`, and refuses — `old` survives;
  *   3. REFUSE-LOUD recovery: [[heal]] never deletes `old` next to a
  *      live dir. The completed-swap tail (old stale, live good) is
  *      indistinguishable from an operator who deleted only `tmp`
  *      out of the poison state (old = the ONLY copy of the stranded
  *      segments), so both read as "operator must look": delete
  *      `old` by hand after confirming `live` serves correctly.
  */
private[graft] object IndexMaintenance {

  /** The compaction-in-progress sentinel for an index rooted at
    * `root` (underscore-prefixed: parquet readers ignore it). */
  def lockFile(root: Path): Path = new Path(root, "_maintenance_lock")

  /** The sentinel's owner/epoch payload, rendered for refusal
    * messages — the operator who finds a held lock needs to tell a
    * live compaction from a crashed one without out-of-band info
    * (r12 VERDICT #3). Best-effort: a legacy or mid-write sentinel
    * reads as "no metadata", never throws into the caller's
    * already-failing require. */
  private[graft] def lockInfo(fs: FileSystem, lock: Path): String =
    try {
      val in = fs.open(lock)
      try {
        val s = new String(in.readAllBytes(),
          java.nio.charset.StandardCharsets.UTF_8).trim
        if (s.isEmpty) "held (no owner metadata — an older build's lock)"
        else s"held ($s)"
      } finally in.close()
    } catch { case scala.util.control.NonFatal(_) =>
      "held (owner metadata unreadable)" }

  /** Append-side guard: refuse to write into an index a compaction
    * is rewriting. Checked at append ENTRY — a compaction that
    * starts after the check is the residual race guards 2 and 3
    * cover. */
  def assertUnlocked(fs: FileSystem, lock: Path, what: String): Unit =
    require(!fs.exists(lock),
      s"$what refused: maintenance lock $lock is " +
        s"${lockInfo(fs, lock)} — a compaction is rewriting this " +
        "index (or one failed holding the lock), and an append " +
        "landing now could strand or corrupt segments. Check the " +
        "owner pid/epoch above: retry after a live compaction " +
        "finishes; if its owner crashed, verify the index state " +
        "(heal runs on the next compaction) and delete the lock file.")

  /** Compaction-side guard: hold the sentinel for the body's whole
    * run. Claim and owner/epoch stamp are ONE create-exclusive call
    * (`create(lock, overwrite = false)` — atomic fail-if-exists on
    * HDFS-class filesystems): a claim-then-restamp two-step would
    * open a no-lock window on filesystems whose overwrite is
    * delete-then-recreate, letting an append's assertUnlocked pass
    * mid-compaction (r13 review). A second concurrent compaction, or
    * one that previously failed, dies loudly here. The lock is
    * released ONLY on success: after a mid-swap failure the index
    * needs heal/operator attention, and releasing would reopen it to
    * appends that could manufacture the poison state (r12 review). */
  def withLock[A](fs: FileSystem, lock: Path)(body: => A): A = {
    val meta = s"owner=${System.getProperty("user.name", "?")}" +
      s" pid=${ProcessHandle.current().pid()}" +
      s" since_epoch_ms=${System.currentTimeMillis()}"
    val os = try fs.create(lock, false)
    catch { case e: java.io.IOException =>
      throw new IllegalArgumentException(
        s"requirement failed: maintenance lock $lock already " +
          s"${lockInfo(fs, lock)} — another compaction is running, or " +
          "a previous one failed and kept the lock: verify the index " +
          "(the next compaction's heal repairs in-protocol crash " +
          "states), then delete the lock file and re-run", e)
    }
    try os.write(meta.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally os.close()
    val out = body // a throw deliberately keeps the lock (see above)
    // a failed delete after a SUCCESSFUL compaction must be reported
    // as a delete failure, not left to masquerade as a phantom failed
    // compaction on the next run (r12 ADVICE)
    require(fs.delete(lock, false),
      s"compaction succeeded but could not delete its lock $lock — " +
        "remove it by hand, or every future append/compaction on " +
        "this index refuses with a misleading failed-compaction message")
    out
  }

  def heal(fs: FileSystem, live: Path, tmp: Path, old: Path): Unit =
    if (!fs.exists(live)) {
      if (fs.exists(tmp)) {
        require(fs.rename(tmp, live), s"recovery rename $tmp -> $live failed")
        if (fs.exists(old)) require(fs.delete(old, true),
          s"recovered but could not delete $old")
      } else if (fs.exists(old))
        require(fs.rename(old, live), s"recovery rename $old -> $live failed")
    } else if (fs.exists(old))
      // live + old: either a writer recreated `live` mid-swap (old
      // holds segments live does NOT — deleting it is permanent
      // silent data loss) or the previous swap completed its renames
      // and crashed before the final delete (old is stale). The two
      // are not reliably distinguishable here — an operator acting on
      // the poison-state instructions may already have removed tmp —
      // so NEVER delete: refuse with the manual protocol (r12 review;
      // the r11 ADVICE's "refuse loudly when both live and old
      // exist").
      sys.error(s"refusing to heal: $live and $old both exist" +
        (if (fs.exists(tmp)) s" (with $tmp — a writer recreated the " +
          "live dir mid-swap; old holds segments live does not)"
         else " (either a completed swap's leftover, or a manual " +
          "recovery that removed only the tmp dir)") +
        s". Verify which holds the full segment set, merge $old's " +
        s"batch partitions into $live if live is missing any, then " +
        "delete the old (and any tmp) dir AND the index's " +
        "_maintenance_lock file by hand (the failed compaction kept " +
        "the lock) and re-run")

  /** rename(tmp, live) with HDFS move-into-directory semantics
    * guarded: if a writer recreated `live` after swap moved it away,
    * the rename NESTS tmp inside live instead of failing — detect
    * that, un-nest, and refuse with `old` intact. */
  private[graft] def renameIntoPlace(fs: FileSystem, tmp: Path,
                                     live: Path): Unit = {
    if (!fs.rename(tmp, live))
      sys.error(s"rename $tmp -> $live failed (a writer may have " +
        s"recreated $live mid-swap); both dirs left intact")
    val nested = new Path(live, tmp.getName)
    if (fs.exists(nested)) {
      require(fs.rename(nested, tmp),
        s"could not un-nest $nested back to $tmp")
      sys.error(s"a writer recreated $live mid-swap: rename moved the " +
        s"compacted dir INSIDE it (un-nested back to $tmp). The old " +
        "dir still holds the full pre-compaction segments — merge " +
        s"$live's new batch partitions into it (or re-append them " +
        "after restoring), then re-run the compaction")
    }
  }

  def swap(fs: FileSystem, live: Path, tmp: Path, old: Path): Unit = {
    // heal() ran first: old absent, or heal threw. An old dir
    // appearing here means the protocol was bypassed — refuse rather
    // than delete what might be the only copy of its segments.
    require(!fs.exists(old),
      s"$old exists at swap time — run heal() (and resolve what it " +
        "refuses) before swapping")
    require(fs.rename(live, old), s"rename $live -> $old failed")
    renameIntoPlace(fs, tmp, live)
    require(fs.delete(old, true), s"compacted but could not delete $old")
  }
}
