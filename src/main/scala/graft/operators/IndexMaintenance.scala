package graft.operators

import org.apache.hadoop.fs.{FileSystem, Path}

/** The ONE spelling of the compaction dir-swap state machine, shared
  * by [[Similarity.compactIvfIndex]] and
  * [[TextAnalysis.compactBm25Index]] (r11 review: two hand-copied
  * protocols would have to be kept bit-equivalent by review alone).
  *
  * Protocol: write the compacted data to `tmp`, then
  * [[swap]] — move `live` aside to `old`, move `tmp` in, delete
  * `old`. A crash between the renames is healed by [[heal]] on the
  * next call: `live` missing next to a complete `tmp` (the caller
  * only ever swaps AFTER the tmp write finished) resumes the swap
  * forward; missing next to only `old` rolls back. Under the swap's
  * own ordering the rollback branch is unreachable (tmp always
  * exists once live has been moved) — it is kept as a defensive
  * recovery for states produced OUTSIDE the protocol, e.g. an
  * operator deleting a tmp dir they judged corrupt. */
private[operators] object IndexMaintenance {

  def heal(fs: FileSystem, live: Path, tmp: Path, old: Path): Unit =
    if (!fs.exists(live)) {
      if (fs.exists(tmp)) {
        require(fs.rename(tmp, live), s"recovery rename $tmp -> $live failed")
        if (fs.exists(old)) require(fs.delete(old, true),
          s"recovered but could not delete $old")
      } else if (fs.exists(old))
        require(fs.rename(old, live), s"recovery rename $old -> $live failed")
    }

  def swap(fs: FileSystem, live: Path, tmp: Path, old: Path): Unit = {
    if (fs.exists(old)) require(fs.delete(old, true), s"cannot clear $old")
    require(fs.rename(live, old), s"rename $live -> $old failed")
    require(fs.rename(tmp, live), s"rename $tmp -> $live failed")
    require(fs.delete(old, true), s"compacted but could not delete $old")
  }
}
