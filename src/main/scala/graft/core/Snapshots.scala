package graft.core

/** Snapshot lifecycle registry — the reference's GetSnapshot/ReleaseSnapshot
  * pair (kv/db/snapshot.h:34-90: a linked list of pinned sequence numbers,
  * oldest first). Its floor is what compaction may rely on: the reference
  * picks `smallest_snapshot = oldest live snapshot, else latest sequence`
  * (kv/db/db_impl.cpp:1044-1051) as the drop horizon. Here the registry is
  * engine-side metadata (a thread-safe refcounted ordered multiset — O(log n)
  * acquire/release, O(1) floor); callers feed [[retentionFloor]] into
  * [[Changelog.compact]] / [[Maintenance.compactTable]] instead of inventing
  * a retention number, and every read at a HELD snapshot is then guaranteed
  * unchanged by compaction (the property MaintenanceSpec pins).
  */
final class Snapshots {
  import Snapshots.Handle

  // seq -> number of open handles at that seq; ordered for O(1) oldest
  private val counts = scala.collection.mutable.TreeMap.empty[Long, Int]
  // live handle ids -> seq: makes release idempotent per handle (a
  // double-release must not free another holder's pin)
  private val live = scala.collection.mutable.HashMap.empty[Long, Long]
  private var nextId = 0L

  /** Pin `seq`: reads at this sequence stay stable across compactions until
    * the handle is released (DB::GetSnapshot). */
  def acquire(seq: Long): Handle = synchronized {
    counts.updateWith(seq)(c => Some(c.getOrElse(0) + 1))
    nextId += 1
    live.put(nextId, seq)
    Handle(seq, nextId)
  }

  /** Release a pin (DB::ReleaseSnapshot). Idempotent per handle. */
  def release(h: Handle): Unit = synchronized {
    live.remove(h.id).foreach { seq =>
      counts.updateWith(seq) {
        case Some(c) if c > 1 => Some(c - 1)
        case _ => None
      }
    }
  }

  /** Oldest live pinned sequence, if any. */
  def oldestLive: Option[Long] = synchronized(counts.headOption.map(_._1))

  /** Number of open handles. */
  def openCount: Int = synchronized(live.size)

  /** The compaction horizon: oldest live snapshot, else the caller's current
    * latest sequence — the reference's smallest_snapshot rule. Compacting at
    * this value never changes a read at any held snapshot (every held seq is
    * >= the floor, and compaction preserves all reads at seq >= retention). */
  def retentionFloor(currentSeq: Long): Long = oldestLive.getOrElse(currentSeq)
}

object Snapshots {
  /** An open snapshot pin; pass back to [[Snapshots.release]]. */
  final case class Handle(seq: Long, private[core] val id: Long)
}
