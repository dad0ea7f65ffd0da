package graft.catalog

import graft.core._

import java.nio.file.Files
import java.util.UUID

/** The full store contract against the durable JDBC (Derby) backend —
  * same suites the in-memory store passes, plus durability: the
  * catalog must survive a store restart (reference: Postgres rows are
  * the source of truth; a server process is stateless). */
class JdbcCatalogStoreSpec extends CatalogStoreContract {
  protected def newStore(): CatalogStore =
    JdbcCatalogStore.embedded(
      Files.createTempDirectory("graft-derby").resolve("db"))

  test("catalog survives a store restart (rows are durable)") {
    import IType._
    val dir = Files.createTempDirectory("graft-derby-restart").resolve("db")
    val project = UUID.randomUUID()
    val whLoc = Files.createTempDirectory("graft-wh").toUri.toString.stripSuffix("/")
    val schema = Schema(0, Seq(NestedField.required(1, "id", TInt)))
    val t0 = 1700000000000L

    val store1 = JdbcCatalogStore.embedded(dir)
    val wh = store1.createWarehouse(project, "wh", whLoc)
      .fold(e => fail(e.message), identity).id
    assert(store1.createNamespace(wh, Seq("ns"), Map("owner" -> "a")).isRight)
    assert(store1.createTable(wh, Seq("ns"), "t", schema,
      UnboundPartitionSpec.Unpartitioned, None, Map("k" -> "v"),
      stageCreate = false, timestampMs = t0).isRight)
    val committed = store1.commitTable(wh, TableIdent(Seq("ns"), "t"),
      Seq(TableRequirement.AssertRefSnapshotId("main", None)),
      Seq(TableUpdate.AddSnapshot(Snapshot(7L, None, 1L, t0 + 1,
        "manifests/7.json", Map("operation" -> "append"), Some(0))),
        TableUpdate.SetSnapshotRef("main", 7L, SnapshotRefType.Branch)),
      t0 + 1).fold(e => fail(e.message), identity)

    // a brand-new store instance over the same database sees everything
    val store2 = JdbcCatalogStore.embedded(dir)
    assert(store2.warehouseByName(project, "wh").map(_.id) === Right(wh))
    assert(store2.getNamespace(wh, Seq("ns")).map(_.properties) ===
      Right(Map("owner" -> "a")))
    val reloaded = store2.loadTable(wh, TableIdent(Seq("ns"), "t"))
      .fold(e => fail(e.message), identity)
    assert(reloaded.metadata === committed.metadata)
    assert(reloaded.metadata.currentSnapshotId === Some(7L))
    assert(reloaded.metadata.properties.get("k") === Some("v"))

    // and commits keep working across the restart (guarded, linear)
    assert(store2.commitTable(wh, TableIdent(Seq("ns"), "t"),
      Seq(TableRequirement.AssertRefSnapshotId("main", Some(7L))),
      Seq(TableUpdate.AddSnapshot(Snapshot(8L, Some(7L), 2L, t0 + 2,
        "manifests/8.json", Map("operation" -> "append"), Some(0))),
        TableUpdate.SetSnapshotRef("main", 8L, SnapshotRefType.Branch)),
      t0 + 2).isRight)

    // views are rows too: they survive the restart with their version
    // history, and view commits keep working against the reopened store
    val ver = ViewVersion(1, t0, 0, Map("operation" -> "create"),
      Seq(ViewRepresentation("spark", "SELECT 1 AS one")), Some("cat"), Seq("ns"))
    val created = store2.createView(wh, Seq("ns"), "v", schemaOf(store2), ver,
      Map("team" -> "data"), t0 + 3).fold(e => fail(e.message), identity)
    val store3 = JdbcCatalogStore.embedded(dir)
    val reloadedView = store3.loadView(wh, TableIdent(Seq("ns"), "v"))
      .fold(e => fail(e.message), identity)
    assert(reloadedView.metadata === created.metadata)
    assert(store3.commitView(wh, TableIdent(Seq("ns"), "v"),
      Seq(ViewRequirement.AssertViewUuid(created.metadata.viewUuid)),
      Seq(ViewUpdate.SetProperties(Map("tier" -> "gold"))), t0 + 4).isRight)
  }

  private def schemaOf(s: CatalogStore): Schema = {
    import IType._
    Schema(0, Seq(NestedField.required(1, "one", TInt)))
  }
}

/** Commit races against real DB row locks instead of a JVM monitor. */
class JdbcConcurrentCommitSpec extends ConcurrentCommitContract {
  protected def newStore(): CatalogStore =
    JdbcCatalogStore.embedded(
      Files.createTempDirectory("graft-derby-race").resolve("db"))
}
