package graft

/** Fault-injection seam for crash-window property tests (the
  * failpoint pattern from etcd/TiKV): named points sit between the
  * side-effect pairs of every at-least-once lifecycle — the places a
  * process can die with one effect durable and the next not — and the
  * chaos suite (`StreamingChaosSpec`) arms them to throw, restarts the
  * stream from its checkpoint, and asserts replay converges to the
  * one-shot answer.
  *
  * Production cost: one volatile read per point; armed only by tests
  * (single JVM in local mode, so executor-side points — e.g. inside a
  * JDBC foreachPartition — see the same hook). */
object Failpoints {
  @volatile private var hook: String => Unit = null

  /** Marks a crash window. No-op unless a test armed a hook. */
  def point(tag: String): Unit = {
    val h = hook
    if (h != null) h(tag)
  }

  /** Run `body` with `h` armed; always disarms afterwards. */
  private[graft] def withHook[T](h: String => Unit)(body: => T): T = {
    hook = h
    try body finally hook = null
  }
}
