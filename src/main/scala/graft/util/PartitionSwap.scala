package graft.util

import org.apache.hadoop.fs.{FileSystem, Path}

/** THE per-partition rename-aside swap protocol — single-sourced so the
  * crash-window semantics cannot drift between its users (the streaming
  * kNN-graph trigger swap, [[graft.similarity.DeleteRepair]]'s
  * touched-partition repairs; [[graft.sources.Compaction]] keeps the
  * separate WHOLE-ROOT variant for full-store rewrites).
  *
  * Protocol per touched partition dir: aside-rename strictly BEFORE
  * in-rename, so the only asymmetric crash state is "cur missing, aside
  * present", which [[recover]] repairs at the head of the next run.
  * Readers holding the store path never see a half-written partition (a
  * dir is either the old one, the new one, or — inside the two-rename
  * window — absent, which recovery undoes before the owning job reads).
  *
  * Two publication semantics share the loop:
  *   - `removeMissing = false` (append/repair maintenance): a touched
  *     partition with no dir in `next` is LEFT IN PLACE — the rewrite
  *     covers every partition it wants to replace;
  *   - `removeMissing = true` (deletion): a touched partition with no
  *     dir in `next` had every row deleted and is removed — its aside
  *     copy falls with the aside root.
  */
object PartitionSwap {

  /** Injected crash point for the swap-window recovery specs ("swap"
    * fires between a partition's aside-rename and its in-rename — the
    * only window a crash can leave asymmetric). */
  private[graft] var crashPoint: Option[String] = None
  private def maybeCrash(step: String): Unit =
    if (crashPoint.contains(step))
      throw new IllegalStateException(s"injected crash at $step")

  /** Restore partitions a crashed swap left aside (cur missing, aside
    * present → the crash hit between the two renames; restoring and
    * re-running the owning job is correct when that job is idempotent).
    * Aside dirs whose cur exists are superseded leftovers and fall
    * with the aside root. */
  def recover(fs: FileSystem, store: String, partPrefix: String): Unit = {
    val aside = new Path(store + "_aside")
    if (fs.exists(aside)) {
      for (st <- fs.listStatus(aside) if st.getPath.getName.startsWith(partPrefix)) {
        val dst = new Path(store, st.getPath.getName)
        if (!fs.exists(dst)) fs.rename(st.getPath, dst)
      }
      fs.delete(aside, true)
      ()
    }
  }

  /** Swap the `touched` partition dirs of `store` for those the caller
    * wrote under `next`, then drop the aside root and `next`. Only the
    * touched dirs are ever listed or moved — untouched partitions'
    * files are not read, rewritten or renamed. */
  def swapTouched(fs: FileSystem, store: String, next: String,
      partCol: String, touched: Seq[Any], removeMissing: Boolean): Unit = {
    val aside = new Path(store + "_aside")
    fs.mkdirs(aside)
    for (v <- touched) {
      val cur = new Path(s"$store/$partCol=$v")
      val upd = new Path(s"$next/$partCol=$v")
      val updExists = fs.exists(upd)
      if ((updExists || removeMissing) && fs.exists(cur))
        fs.rename(cur, new Path(aside, s"$partCol=$v"))
      maybeCrash("swap")
      if (updExists) { fs.rename(upd, cur); () }
    }
    fs.delete(aside, true)
    fs.delete(new Path(next), true)
    ()
  }
}
