package graft.catalog

import graft.core._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files
import java.util.UUID
import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

/** SURVEY §7.5 #1 — commit correctness under concurrency: requirement
  * asserts must run inside the same critical section that swaps the
  * metadata, so every interleaving of racing writers yields a linear
  * snapshot history and losers observe 409 + retry to convergence
  * (the loop Spark's Iceberg committer runs).
  */
abstract class ConcurrentCommitContract extends AnyFunSuite {
  import IType._

  /** The store under test — each call must yield an ISOLATED store. */
  protected def newStore(): CatalogStore

  private val schema = Schema(0, Seq(NestedField.required(1, "id", TInt)))
  private val t0 = 1700000000000L

  test("8 racing writers: losers 409, retries converge to a linear history") {
    val store = newStore()
    val whLoc = Files.createTempDirectory("graft-race").toUri.toString.stripSuffix("/")
    val wh = store.createWarehouse(UUID.randomUUID(), "race", whLoc)
      .fold(e => fail(e.message), identity).id
    assert(store.createNamespace(wh, Seq("ns"), Map.empty).isRight)
    val ident = TableIdent(Seq("ns"), "t")
    assert(store.createTable(wh, Seq("ns"), "t", schema,
      UnboundPartitionSpec.Unpartitioned, None, Map.empty,
      stageCreate = false, timestampMs = t0).isRight)

    val writers = 8
    val commitsPerWriter = 5
    val conflicts = new AtomicInteger(0)
    val idGen = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    // all writers pause between LOAD and COMMIT on their first attempt:
    // every one of them builds against the same initial metadata, so
    // exactly one wins and writers-1 MUST observe a 409 — the conflict
    // path is exercised deterministically, not probabilistically
    val sameSnapshot = new java.util.concurrent.CyclicBarrier(writers)
    val pool = Executors.newFixedThreadPool(writers)

    val futures = (0 until writers).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          var committed = 0
          var firstAttempt = true
          while (committed < commitsPerWriter) {
            // Iceberg committer loop: refresh → build against current →
            // commit with assert-ref; on 409 refresh and rebuild.
            val current = store.loadTable(wh, ident)
              .fold(e => throw e, identity).metadata
            if (firstAttempt) { sameSnapshot.await(); firstAttempt = false }
            val snapId = 1000L + idGen.incrementAndGet()
            val snap = Snapshot(snapId, current.currentSnapshotId,
              current.lastSequenceNumber + 1, t0 + snapId,
              s"manifests/$snapId.avro", Map("operation" -> "append"), Some(0))
            store.commitTable(wh, ident,
              Seq(TableRequirement.AssertRefSnapshotId("main",
                current.refs.get("main").map(_.snapshotId))),
              Seq(TableUpdate.AddSnapshot(snap),
                TableUpdate.SetSnapshotRef("main", snapId, SnapshotRefType.Branch)),
              t0 + snapId) match {
              case Right(_) => committed += 1
              case Left(e) if e.code == 409 => conflicts.incrementAndGet()
              case Left(e) => throw e
            }
          }
        }
      })
    }

    start.countDown()
    futures.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()

    val m = store.loadTable(wh, ident).fold(e => fail(e.message), identity).metadata
    val total = writers * commitsPerWriter

    // every commit landed exactly once
    assert(m.snapshots.size === total)
    // sequence numbers are a gap-free monotonic chain — commits were
    // serialized, never interleaved mid-assert
    assert(m.snapshots.values.map(_.sequenceNumber).toSeq.sorted ===
      (1L to total.toLong))
    assert(m.lastSequenceNumber === total.toLong)
    // snapshot log is linear: each entry's parent is the previous entry
    val log = m.snapshotLog.map(_.snapshotId)
    assert(log.size === total)
    assert(log.distinct.size === total)
    val parents = log.map(id => m.snapshots(id).parentSnapshotId)
    assert(parents.head === None)
    assert(parents.tail === log.init.map(Some(_)))
    assert(m.currentSnapshotId === Some(log.last))
    // the barrier forced all 8 first attempts onto one base snapshot:
    // at least 7 conflicts are guaranteed, and all were retried away
    assert(conflicts.get() >= writers - 1)
  }

  test("racing view replaces: versions land exactly once, history stays linear") {
    val store = newStore()
    val whLoc = Files.createTempDirectory("graft-vrace").toUri.toString.stripSuffix("/")
    val wh = store.createWarehouse(UUID.randomUUID(), "vrace", whLoc)
      .fold(e => fail(e.message), identity).id
    assert(store.createNamespace(wh, Seq("ns"), Map.empty).isRight)
    val ident = TableIdent(Seq("ns"), "v")
    val created = store.createView(wh, Seq("ns"), "v", schema,
      ViewVersion(1, t0, 0, Map("operation" -> "create"),
        Seq(ViewRepresentation("spark", "SELECT 0 AS x")), None, Seq("ns")),
      Map.empty, t0).fold(e => fail(e.message), identity)
    val uuid = created.metadata.viewUuid

    val writers = 6
    val replacesPerWriter = 4
    val idGen = new AtomicInteger(0)
    val start = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers)
    val futures = (0 until writers).map { w =>
      pool.submit(new Runnable {
        def run(): Unit = {
          start.await()
          var done = 0
          while (done < replacesPerWriter) {
            val n = idGen.incrementAndGet()
            // CAS is on the immutable uuid (views have no ref chain),
            // so every well-formed replace should land; the race being
            // tested is the commit CRITICAL SECTION — two writers
            // folding onto the same row must serialize, or version ids
            // collide / the log forks
            store.commitView(wh, ident,
              Seq(ViewRequirement.AssertViewUuid(uuid)),
              Seq(ViewUpdate.AddSchema(schema),
                ViewUpdate.AddViewVersion(ViewVersion(0, 0, -1,
                  Map("operation" -> "replace"),
                  Seq(ViewRepresentation("spark", s"SELECT $n AS x")),
                  None, Seq("ns"))),
                ViewUpdate.SetCurrentViewVersion(-1)), t0 + n) match {
              case Right(_) => done += 1
              case Left(e) if e.code == 409 => // JDBC serialization loser: retry
              case Left(e) => throw e
            }
          }
        }
      })
    }
    start.countDown()
    futures.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()

    val m = store.loadView(wh, ident).fold(e => fail(e.message), identity).metadata
    val total = writers * replacesPerWriter
    // every replace minted exactly one NEW version id — no collisions,
    // no lost updates under the race
    assert(m.versions.size === total + 1)
    assert(m.versions.keySet === (1 to total + 1).toSet)
    // the version log appended exactly once per replace and points at
    // versions that exist
    assert(m.versionLog.size === total + 1)
    m.versionLog.foreach(e => assert(m.versions.contains(e.versionId)))
    assert(m.currentVersionId === m.versionLog.last.versionId)
  }

  test("multi-table transactions race atomically: both tables or neither") {
    val store = newStore()
    val whLoc = Files.createTempDirectory("graft-race2").toUri.toString.stripSuffix("/")
    val wh = store.createWarehouse(UUID.randomUUID(), "race2", whLoc)
      .fold(e => fail(e.message), identity).id
    assert(store.createNamespace(wh, Seq("ns"), Map.empty).isRight)
    val idents = Seq("a", "b").map { n =>
      assert(store.createTable(wh, Seq("ns"), n, schema,
        UnboundPartitionSpec.Unpartitioned, None, Map.empty,
        stageCreate = false, timestampMs = t0).isRight)
      TableIdent(Seq("ns"), n)
    }

    val writers = 6
    val txnsPerWriter = 4
    val idGen = new AtomicInteger(0)
    val conflicts = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(writers)
    val futures = (0 until writers).map { _ =>
      pool.submit(new Runnable {
        def run(): Unit = {
          var committed = 0
          while (committed < txnsPerWriter) {
            // one txn = a paired append to BOTH tables
            val changes = idents.map { ident =>
              val cur = store.loadTable(wh, ident).fold(e => throw e, identity).metadata
              val snapId = 5000L + idGen.incrementAndGet()
              val snap = Snapshot(snapId, cur.currentSnapshotId,
                cur.lastSequenceNumber + 1, t0 + snapId,
                s"manifests/$snapId.avro", Map("operation" -> "append"), Some(0))
              TableChange(ident,
                Seq(TableRequirement.AssertRefSnapshotId("main",
                  cur.refs.get("main").map(_.snapshotId))),
                Seq(TableUpdate.AddSnapshot(snap),
                  TableUpdate.SetSnapshotRef("main", snapId, SnapshotRefType.Branch)))
            }
            store.commitTransaction(wh, changes, t0) match {
              case Right(_) => committed += 1
              case Left(e) if e.code == 409 => conflicts.incrementAndGet()
              case Left(e) => throw e
            }
          }
        }
      })
    }
    futures.foreach(_.get(60, TimeUnit.SECONDS))
    pool.shutdown()

    val total = writers * txnsPerWriter
    // atomicity under contention: EVERY txn landed on both tables, so
    // the two snapshot histories advanced in lockstep
    for (ident <- idents) {
      val m = store.loadTable(wh, ident).fold(e => fail(e.message), identity).metadata
      assert(m.snapshots.size === total)
      assert(m.snapshots.values.map(_.sequenceNumber).toSeq.sorted ===
        (1L to total.toLong))
      assert(m.snapshotLog.size === total)
    }
  }
}

/** The contract run against the in-memory dev/test store. */
class ConcurrentCommitSpec extends ConcurrentCommitContract {
  protected def newStore(): CatalogStore = new InMemoryCatalogStore
}
