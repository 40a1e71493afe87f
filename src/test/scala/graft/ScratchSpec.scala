package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** The r12 scratch relocation (graft.etl.Utils.tempDir): every
  * per-query scratch dir — staged stream files, checkpoints, sink
  * outputs, index builds — now allocates under ONE process-wide root on
  * the fastest local volume instead of scattering across
  * `java.io.tmpdir`. These tests pin the contract the query surface
  * relies on; the PLACEMENT preference (SPARK_GRAFT_SCRATCH → /dev/shm
  * → java.io.tmpdir) is env-driven at first use and can't be re-pointed
  * within one JVM, so it is asserted structurally (root exists, is a
  * directory, is writable) rather than by path name. */
class ScratchSpec extends AnyFunSuite {
  import graft.etl.Utils

  test("tempDir returns a fresh writable dir per call, same parent") {
    val a = Utils.tempDir("graft_spec")
    val b = Utils.tempDir("graft_spec")
    assert(a != b, "every call must return a NEW sibling")
    assert(a.getParent == b.getParent, "all scratch shares one root")
    assert(Files.isDirectory(a) && Files.isDirectory(b))
    val probe = a.resolve("probe")
    Files.writeString(probe, "x")
    assert(Files.readString(probe) == "x")
  }

  test("tempDir and scratchDir share the same root") {
    val t = Utils.tempDir("graft_spec_t")
    val s = java.nio.file.Paths.get(Utils.scratchDir("graft_spec_s"))
    assert(t.getParent == s.getParent,
      "prefix-replacing and unique-sibling scratch must live under one " +
        "shutdown-hook-cleaned root")
  }

  test("scratchDir with the same prefix wipes the previous contents") {
    val first = java.nio.file.Paths.get(Utils.scratchDir("graft_spec_w"))
    Files.writeString(first.resolve("stale"), "old")
    val second = java.nio.file.Paths.get(Utils.scratchDir("graft_spec_w"))
    assert(first == second)
    assert(!Files.exists(second.resolve("stale")),
      "same-prefix calls must replace, not accumulate")
  }
}
