package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Scratch deletes directories — the one utility where a logic bug
  * destroys data, so its ownership rules get their own spec.
  */
class ScratchSpec extends AnyFunSuite {

  private def mkDirWithFile(path: String): java.io.File = {
    val d = new java.io.File(path)
    d.mkdirs()
    java.nio.file.Files.writeString(d.toPath.resolve("x"), "data")
    d
  }

  test("dir() returns a pid-suffixed path under the namespace root and never deletes the live JVM's own dir") {
    val prefix = s"graft_scratchspec_own_${System.nanoTime()}"
    val d1 = Scratch.dir(prefix)
    assert(d1 === new java.io.File(Scratch.root,
      s"${prefix}_${java.lang.ProcessHandle.current().pid()}").getAbsolutePath)
    mkDirWithFile(d1)
    // a second allocation sweeps stale siblings but must keep our own
    val d2 = Scratch.dir(prefix)
    assert(d2 === d1)
    assert(new java.io.File(d1, "x").exists(),
      "own live dir must survive re-allocation")
    Scratch.deleteRecursively(new java.io.File(d1))
  }

  test("stale sweep reclaims dirs whose owning pid is dead, leaves foreign names alone") {
    val prefix = s"graft_scratchspec_sweep_${System.nanoTime()}"
    Scratch.root.mkdirs()
    // 999999999 exceeds pid_max — guaranteed-dead owner
    val dead = mkDirWithFile(
      new java.io.File(Scratch.root, s"${prefix}_999999999").getAbsolutePath)
    // same prefix but a non-numeric suffix: NOT Scratch-owned, must stay
    val foreign = mkDirWithFile(
      new java.io.File(Scratch.root, s"${prefix}_notapid").getAbsolutePath)
    // same name pattern OUTSIDE the namespace root: out of the sweeper's
    // reach entirely (the r8 advice's unrelated-/tmp-entry hazard)
    val outside = mkDirWithFile(s"/tmp/${prefix}_999999999")
    val mine = Scratch.dir(prefix)
    assert(!dead.exists(), "dead-pid sibling should be swept")
    assert(foreign.exists(), "non-pid-suffixed dir must never be touched")
    assert(outside.exists(), "entries outside graft_scratch/ must never be touched")
    Scratch.deleteRecursively(foreign)
    Scratch.deleteRecursively(outside)
    Scratch.deleteRecursively(new java.io.File(mine))
  }

  test("deleteRecursively removes nested trees and tolerates missing paths") {
    val root = new java.io.File(s"/tmp/graft_scratchspec_del_${System.nanoTime()}")
    val nested = new java.io.File(root, "a/b")
    nested.mkdirs()
    java.nio.file.Files.writeString(nested.toPath.resolve("f"), "x")
    Scratch.deleteRecursively(root)
    assert(!root.exists())
    Scratch.deleteRecursively(root) // idempotent on a missing path
  }
}
