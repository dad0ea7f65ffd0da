package graft.engine

import graft.SparkTestSession
import graft.catalog.{FileIO, InMemoryFileIO}
import org.scalatest.funsuite.AnyFunSuite

/** The distributed orphan sweep against an op-counting object store:
  * I/O complexity (each distinct manifest shard reads ONCE across all
  * snapshots; candidates are age-probed in the listing pass; deletes
  * are per-orphan) and the keep rules (referenced, too-fresh,
  * unknown-mtime, and live-base `.crc` sidecars all survive; old
  * unreferenced files and their sidecars go). Driving it through
  * [[graft.catalog.InMemoryFileIO]] also proves the sweep makes no
  * local-filesystem assumptions. */
class OrphanSweepSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  test("sweep dedupes shard reads, probes in the listing pass, keeps the right files") {
    val mem = new InMemoryFileIO
    FileIO.register("orph", mem)
    try {
      val loc = "orph://wh/t"
      val metaDir = s"$loc/metadata"
      val now = System.currentTimeMillis()
      val old = now - 10L * 24 * 3600 * 1000
      val cutoff = now - 3L * 24 * 3600 * 1000

      val live = s"$loc/data/live.parquet"
      val liveCrc = s"$loc/data/.live.parquet.crc"
      val orphOld = s"$loc/data/stray-old.parquet"
      val orphOldCrc = s"$loc/data/.stray-old.parquet.crc"
      val orphFresh = s"$loc/data/stray-fresh.parquet"
      val orphNoAge = s"$loc/data/stray-noage.parquet"
      val delOld = s"$loc/deletes/old-del.parquet"
      val all = Seq(live, liveCrc, orphOld, orphOldCrc, orphFresh, orphNoAge, delOld)
      all.foreach(p => mem.write(p, Array[Byte](1)))
      Seq(orphOld, orphOldCrc, orphNoAge, delOld).foreach(mem.setMtime(_, old))
      mem.clearMtime(orphNoAge) // unknown age — must never be deleted

      // three snapshots; 2 and 3 CARRY snapshot 1's shard (the usual
      // append lineage: every child repeats the parent's entries)
      val l1 = Manifests.writeCommit(metaDir, 1L, Nil,
        Seq(Manifests.DataFile(live, 1L, 1L)))
      val l2 = Manifests.writeCommit(metaDir, 2L, Manifests.readEntries(l1), Nil)
      val l3 = Manifests.writeCommit(metaDir, 3L, Manifests.readEntries(l2), Nil)

      mem.resetCounters()
      val swept = GraftTable.sweepOrphans(spark, loc, Seq(l1, l2, l3), cutoff)

      assert(swept === Seq(orphOldCrc, orphOld, delOld).sorted)
      assert(mem.keys.toSet.intersect(swept.toSet).isEmpty)
      // keep rules: referenced (live + its sidecar), too fresh, unknown age
      assert(mem.keys.contains(live) && mem.keys.contains(liveCrc))
      assert(mem.keys.contains(orphFresh) && mem.keys.contains(orphNoAge))

      // I/O complexity: 3 manifest LISTS (one per snapshot, driver) +
      // exactly 1 shard read — the carried shard is deduped, NOT read
      // once per snapshot
      assert(mem.reads.get() === 4L,
        s"expected 3 list + 1 deduped shard read, got ${mem.reads.get()}")
      // one LIST per swept prefix, every candidate age-probed exactly
      // once IN the listing task (no per-file driver round trips), one
      // DELETE per orphan
      assert(mem.lists.get() === 2L)
      assert(mem.mtimeProbes.get() === all.size.toLong)
      assert(mem.deletes.get() === swept.size.toLong)
    } finally FileIO.unregister("orph")
  }
}
