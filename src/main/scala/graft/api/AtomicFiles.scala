package graft.api

/** The single implementation of the write-then-point pointer-file commit
  * every versioned-state directory in the engine relies on
  * ([[IncrementalDedup]] segment list + batch ledger, [[MaterializedView]]
  * current-version pointer): write the new content to a sibling `.tmp`,
  * then atomically rename over the pointer. Readers see the old or the
  * new pointer, never a torn one. Centralized because this is
  * crash-safety-critical code — a future hardening (parent-dir fsync, a
  * fallback for filesystems without ATOMIC_MOVE) must reach every state
  * store at once, not whichever copy someone remembered to patch. */
object AtomicFiles {
  def writePointer(p: java.nio.file.Path, content: String): Unit = {
    val tmp = p.resolveSibling(p.getFileName.toString + ".tmp")
    java.nio.file.Files.writeString(tmp, content)
    java.nio.file.Files.move(tmp, p,
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
