package graft

import graft.api.StateManifest

/** Child JVM of StateManifestSpec's two-process contention drill — the
  * duplicate-scheduler story the StateManifest scaladoc tells: two INGEST
  * processes (not threads) race optimistic commits against one state root
  * while both occasionally run the flock'd orphan reclaim. Each commit
  * appends one writer-unique segment to the then-current list via
  * [[StateManifest.commitIf]]; a lost race re-reads and retries. The
  * parent asserts the final manifest carries EVERY segment from BOTH
  * processes — the lost-segment class commitIf exists to prevent, now
  * checked across real process/FileLock boundaries rather than only the
  * in-JVM monitor. */
object ManifestStressChild {

  def writerLoop(root: String, id: String, commits: Int): Unit = {
    var i = 0
    while (i < commits) {
      val cur = StateManifest.current(root)
      val done = StateManifest.commitIf(root, cur.map(_.version),
        cur.map(_.segments).getOrElse(Seq.empty) :+ s"$id-$i",
        lastBatch = i.toLong, schemaFp = "stress").isDefined
      if (done) i += 1
      // every few commits, exercise the cross-process reclaim lock too
      if (i % 7 == 3) StateManifest.reclaimOrphans(root)
    }
  }

  def main(args: Array[String]): Unit = {
    val Array(root, id, commits) = args
    writerLoop(root, id, commits.toInt)
    println(s"child $id done")
  }
}
