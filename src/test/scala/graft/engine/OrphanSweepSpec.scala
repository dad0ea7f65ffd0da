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

      // ≤ cap orphans ⇒ the bounded sample is the complete sorted list
      assert(swept.deletedCount === 3L)
      assert(swept.sample === Seq(orphOldCrc, orphOld, delOld).sorted)
      assert(mem.keys.toSet.intersect(swept.sample.toSet).isEmpty)
      // keep rules: referenced (live + its sidecar), too fresh, unknown age
      assert(mem.keys.contains(live) && mem.keys.contains(liveCrc))
      assert(mem.keys.contains(orphFresh) && mem.keys.contains(orphNoAge))

      // I/O complexity: 3 manifest LISTS (one per snapshot, driver) +
      // exactly 1 shard read — the carried shard is deduped, NOT read
      // once per snapshot
      assert(mem.reads.get() === 4L,
        s"expected 3 list + 1 deduped shard read, got ${mem.reads.get()}")
      // this flat layout (files directly under data/) is fully served
      // by the two cheap delimiter probes — zero tree LISTs; every
      // candidate age-probed exactly once IN its task (no per-file
      // driver round trips), one DELETE per orphan
      assert(mem.dirLists.get() === 2L)
      assert(mem.lists.get() === 0L)
      assert(mem.mtimeProbes.get() === all.size.toLong)
      assert(mem.deletes.get() === swept.deletedCount)
    } finally FileIO.unregister("orph")
  }

  test("candidate listing fans out by sub-prefix: >2 tasks, no task pages the tree") {
    val mem = new InMemoryFileIO
    FileIO.register("orphfan", mem)
    try {
      val loc = "orphfan://wh/t"
      val metaDir = s"$loc/metadata"
      val now = System.currentTimeMillis()
      val old = now - 10L * 24 * 3600 * 1000
      val cutoff = now - 3L * 24 * 3600 * 1000

      // the real writer's layout: one data/<shard>/ directory per
      // append — 4 data shards × 25 files + a deletes shard
      val shards = (0 until 4).map(i => s"$loc/data/commit-$i")
      val files = shards.flatMap(s => (0 until 25).map(j => s"$s/f$j.parquet")) ++
        (0 until 5).map(j => s"$loc/deletes/dcommit/d$j.parquet")
      files.foreach { p => mem.write(p, Array[Byte](1)); mem.setMtime(p, old) }
      val live = files.head // one referenced file; the rest are orphans
      val l1 = Manifests.writeCommit(metaDir, 1L, Nil,
        Seq(Manifests.DataFile(live, 1L, 1L)))

      mem.resetCounters()
      // sampleCap BELOW the orphan count: the count stays exact, the
      // driver-side sample is capped (never the full path list), and
      // every orphan is still actually gone from the store
      val cap = 10
      val swept = GraftTable.sweepOrphans(spark, loc, Seq(l1), cutoff, sampleCap = cap)
      assert(swept.deletedCount === (files.size - 1).toLong)
      assert(swept.sample.size === cap && swept.sampleCap === cap)
      assert(swept.sample === swept.sample.sorted)
      assert(!swept.sample.contains(live))
      assert(mem.keys.toSet.filter(
        k => k.contains("/data/") || k.contains("/deletes/")) === Set(live),
        "non-sampled orphans must be gone too")
      assert(mem.deletes.get() === swept.deletedCount)

      // fan-out proof by op counters: the driver's TWO delimiter
      // probes return only shard names; then one LIST task per shard
      // (5 > 2 tasks), and the largest single listing is one shard —
      // 25 keys, a quarter of the tree, never the whole thing
      assert(mem.dirLists.get() === 2L)
      assert(mem.lists.get() === 5L,
        s"expected one LIST per sub-prefix shard, got ${mem.lists.get()}")
      assert(mem.listKeysMax.get() === 25L,
        s"a listing task paged more than its shard: ${mem.listKeysMax.get()}")
      assert(mem.mtimeProbes.get() === files.size.toLong)
    } finally FileIO.unregister("orphfan")
  }
}
