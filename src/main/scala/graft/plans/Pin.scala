package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.storage.StorageLevel

/** Spill-safe lineage pin for loop-invariant and per-round frames.
  *
  * `df.localCheckpoint()` defaults to a DESERIALIZED storage level:
  * the memory store copies every `UnsafeRow` into on-heap objects, and
  * the unroll accounting lags real allocation enough under 32
  * concurrent tasks that a big frame OOMs the JVM instead of degrading
  * (measured: `graph_pagerank` at sf10 — 117M-edge loop invariant —
  * killed a 32 GiB heap with `OutOfMemoryError` inside
  * `MemoryStore.putIteratorAsValues`, Spark exit 52, while the sf1 run
  * was comfortable; the second scale decade exists to catch exactly
  * this). MEMORY_AND_DISK_SER stores the serialized bytes through the
  * byte-buffer unroll path instead — bounded build-up, spills to disk
  * when memory runs out, never a row-object explosion — at a small
  * deserialization cost per reuse that the iterative operators
  * amortize over their supersteps.
  *
  * Every iterative operator (PageRank, CC, SCC, k-core, label-prop,
  * Bellman–Ford, reachability, temporal reach) and every
  * boundary-pinning materialization in `plans.Scale` pins through
  * here, so the storage-level decision lives in one place. */
object Pin {
  def pin[T](df: Dataset[T]): Dataset[T] =
    df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
}
