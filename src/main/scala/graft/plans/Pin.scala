package graft.plans

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Spill-safe lineage pin for loop-invariant and per-round frames,
  * with a MEASURED storage-level tier.
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
  * when memory runs out, never a row-object explosion — but it taxes
  * every RE-READ with a deserialization pass, and the iterative graph
  * operators re-read their pins once per superstep: measured 15–45%
  * on the whole family at sf0.1 (`graph_pagerank` 3.55 → 5.05 s,
  * `graph_kcore` 1.51 → 2.22 s, driver-to-driver under faster probes).
  *
  * So the level is TIERED BY MEASURED SIZE, not guessed: every frame
  * first pins serialized (always safe — the unroll path is bounded
  * regardless of the frame's true size, which is unknowable before
  * materialization; a Catalyst estimate would be a guess that joins
  * inflate multiplicatively and compression deflates), then the ACTUAL
  * cached bytes are read from the block manager's storage info. A
  * frame under the small-frame budget re-pins DESERIALIZED from the
  * serialized copy (one cheap in-memory pass — by construction only
  * ever paid on small frames) and the serialized copy is dropped;
  * supersteps then re-read row objects at zero decode cost. A frame
  * over the budget stays serialized — the sf10 OOM fix intact.
  *
  * Budget: `spark.graft.pin.smallBytes` if set, else
  * min(heap/32, 1 GiB) — at the bench's 32 GiB heap every sf0.1/sf1
  * graph frame (≤ ~300 MB serialized) tiers deserialized while the
  * sf10 117M-edge frame (multi-GB serialized) stays SER; at the
  * 4 GiB MemStress heap the budget shrinks to 128 MB, so constrained
  * heaps keep the spill-safe form for everything that matters.
  *
  * A THIRD tier (round 12) covers the memory-HOSTILE end: frames
  * whose serialized footprint exceeds `spark.graft.pin.diskOnlyBytes`
  * (default heap/8) re-pin DISK_ONLY, because the SER form's
  * disk-spilled blocks are re-INFLATED wholesale on every re-read
  * (`maybeCacheDiskBytesInMemory`) and 32 concurrent readers of a
  * multi-GB pin OOM a constrained heap — see [[diskOnlyBytes]] for
  * the measured failure.
  *
  * Every iterative operator (PageRank, HITS, CC, SCC, k-core,
  * label-prop, Bellman–Ford, reachability, temporal reach) and every
  * boundary-pinning materialization in `plans.Scale` pins through
  * here, so the storage-level decision lives in one place. */
object Pin {

  private def smallBytes(df: Dataset[_]): Long =
    df.sparkSession.conf.getOption("spark.graft.pin.smallBytes")
      .map(_.toLong)
      .getOrElse(math.min(Runtime.getRuntime.maxMemory / 32, 1L << 30))

  /** Threshold above which a pin drops the MEMORY half entirely
    * (DISK_ONLY). Measured failure mode (round 12, sf10 under an
    * 8 GiB heap): a MEMORY_AND_DISK_SER block that spilled to disk is
    * RE-INFLATED on every re-read — `BlockManager.
    * maybeCacheDiskBytesInMemory` materializes the whole serialized
    * partition as one ChunkedByteBuffer per reading task before the
    * memory store accepts or rejects it, so 32 concurrent tasks
    * re-reading a multi-GB pin allocate 32 × partition-bytes of
    * transient heap on top of execution memory → task
    * `OutOfMemoryError` (graph_pagerank died exactly there; stack:
    * DiskBlockData.toChunkedByteBuffer ← maybeCacheDiskBytesInMemory
    * ← getLocalValues). A DISK_ONLY level never re-caches — re-reads
    * STREAM from disk with bounded buffers — so a frame big enough
    * to have spilled anyway (> heap/8 serialized) serves strictly
    * safer from disk, at sequential-read cost the superstep loop
    * already paid once per round under SER. */
  private def diskOnlyBytes(df: Dataset[_]): Long =
    df.sparkSession.conf.getOption("spark.graft.pin.diskOnlyBytes")
      .map(_.toLong)
      .getOrElse(Runtime.getRuntime.maxMemory / 8)

  def pin[T](df: Dataset[T]): Dataset[T] = pinSized(df)._1

  /** AUTO pin that also RETURNS the measured serialized footprint
    * (Long.MaxValue when it could not be read — treated as big), so an
    * operator can derive the level of its DEPENDENT pins from one
    * measurement instead of paying the SER-first re-pin on every
    * frame: an iterative operator measures its root edge frame once
    * and pins every loop frame (⊆ the root by construction) through
    * [[pinHinted]] in a single materialization. */
  def pinSized[T](df: Dataset[T]): (Dataset[T], Long) = {
    val ser = df.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    // the checkpointed Dataset's plan is a LogicalRDD over the cached
    // RDD — its id keys the block manager's storage info, giving the
    // frame's REAL footprint (mem + any spilled disk bytes)
    val pinnedRdd = ser.queryExecution.analyzed.collectFirst {
      case l: LogicalRDD => l.rdd
    }
    val bytes = pinnedRdd.flatMap { r =>
      ser.sparkSession.sparkContext.getRDDStorageInfo
        .find(_.id == r.id).map(i => i.memSize + i.diskSize)
    }
    if (bytes.exists(_ <= smallBytes(ser))) {
      val deser = ser.localCheckpoint(true, StorageLevel.MEMORY_AND_DISK)
      pinnedRdd.foreach(_.unpersist(blocking = false))
      (deser, bytes.get)
    } else if (bytes.getOrElse(Long.MaxValue) >= diskOnlyBytes(ser)) {
      // memory-hostile frame: one more serialize pass re-pins it
      // DISK_ONLY (see diskOnlyBytes — the SER form's disk-spill
      // re-inflation OOMs constrained heaps on re-read)
      val disk = ser.localCheckpoint(true, StorageLevel.DISK_ONLY)
      pinnedRdd.foreach(_.unpersist(blocking = false))
      (disk, bytes.getOrElse(Long.MaxValue))
    } else (ser, bytes.getOrElse(Long.MaxValue))
  }

  /** ONE-SHOT pin at the level a frame of `hintBytes` serialized size
    * warrants — no SER-first measurement pass. For frames BOUNDED by
    * an already-measured sibling: every per-round frame of an
    * iterative operator is at most nodes ⊆ edges, so the root edge
    * frame's [[pinSized]] measurement prices the whole loop. The hint
    * errs conservative at scale (a multi-GB edge frame keeps every
    * loop frame serialized — the sf10-OOM-safe form); under the budget
    * it recovers the zero-decode re-reads the superstep family lives
    * on. */
  def pinHinted[T](df: Dataset[T], hintBytes: Long): Dataset[T] =
    df.localCheckpoint(true,
      if (hintBytes <= smallBytes(df)) StorageLevel.MEMORY_AND_DISK
      else if (hintBytes >= diskOnlyBytes(df)) StorageLevel.DISK_ONLY
      else StorageLevel.MEMORY_AND_DISK_SER)
}
