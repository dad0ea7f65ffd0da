package graft.core

import org.scalatest.funsuite.AnyFunSuite

import java.util.UUID

class TableMetadataBuilderSpec extends AnyFunSuite {
  import IType._
  import TableUpdate._

  private val schema = Schema(0, Seq(
    NestedField.required(1, "id", TInt),
    NestedField.required(2, "name", TString),
    NestedField.optional(3, "ts", TTimestamptz)))

  private val uuid = UUID.fromString("f79c3e09-677c-4bbd-a479-3f349cb785e7")
  private val t0 = 1700000000000L

  private def fresh(): TableMetadataBuilder =
    TableMetadataBuilder.newTable(uuid, "file:///tmp/wh/ns/t", schema, t0)
      .fold(e => fail(e.message), identity)

  private def built(b: TableMetadataBuilder): TableMetadata =
    b.build().fold(e => fail(e.message), identity)

  private def snap(id: Long, seq: Long, ts: Long = t0 + 1000): Snapshot =
    Snapshot(id, None, seq, ts, s"manifests/$id.json", Map("operation" -> "append"), Some(0))

  test("build defaults: unpartitioned spec 0 and unsorted order 0") {
    val m = built(fresh())
    assert(m.defaultSpecId === 0)
    assert(m.partitionSpecs(0).isUnpartitioned)
    assert(m.defaultSortOrderId === 0)
    assert(m.sortOrders(0).isUnsorted)
    assert(m.lastColumnId === 3)
    assert(m.currentSchemaId === 0)
  }

  test("add-schema dedups structurally and reuses the id") {
    val b = fresh()
    assert(b.apply(AddSchema(schema.copy(schemaId = 99), None)).isRight)
    assert(built(b).schemas.size === 1) // same structure → no new schema
  }

  test("add-schema dedup branch still advances last_column_id") {
    val b = fresh()
    // identical structure but a larger requested last-column-id: the
    // schema dedups away, the counter must still advance monotonically
    assert(b.apply(AddSchema(schema.copy(schemaId = 99), Some(7))).isRight)
    val m = built(b)
    assert(m.schemas.size === 1)
    assert(m.lastColumnId === 7)
    // and a smaller requested value never shrinks it
    val b2 = fresh()
    assert(b2.apply(AddSchema(schema.copy(schemaId = 99), Some(1))).isRight)
    assert(built(b2).lastColumnId === 3)
  }

  test("schema evolution: add column, set-current-schema -1") {
    val b = fresh()
    val evolved = Schema(1, schema.fields :+ NestedField.optional(4, "flag", TBoolean))
    val r = b.apply(AddSchema(evolved, Some(4))).flatMap(_.apply(SetCurrentSchema(-1)))
    assert(r.isRight)
    val m = built(b)
    assert(m.currentSchemaId === 1)
    assert(m.lastColumnId === 4)
    assert(m.schemas.size === 2)
  }

  test("last_column_id is monotonic even when dropping columns") {
    val b = fresh()
    val dropped = Schema(1, schema.fields.filterNot(_.id == 3))
    assert(b.apply(AddSchema(dropped, None)).flatMap(_.apply(SetCurrentSchema(-1))).isRight)
    assert(built(b).lastColumnId === 3) // never shrinks
  }

  test("set-current-schema rejects schema that breaks an existing spec") {
    val b = fresh()
    assert(b.apply(AddSpec(UnboundPartitionSpec(None,
      Seq(UnboundPartitionField(3, None, "ts_day", Transform.Day))))).isRight)
    assert(b.apply(SetDefaultSpec(-1)).isRight)
    // drop column 3 (the spec source) → set-current-schema must fail
    val noTs = Schema(1, schema.fields.filterNot(_.id == 3))
    assert(b.apply(AddSchema(noTs, None)).isRight)
    val r = b.apply(SetCurrentSchema(-1))
    assert(r.isLeft)
  }

  test("add-spec dedups by compatibility (ids ignored) and assigns from 1000") {
    val b = fresh()
    val spec = UnboundPartitionSpec(None,
      Seq(UnboundPartitionField(1, None, "id_bucket", Transform.Bucket(16))))
    assert(b.apply(AddSpec(spec)).isRight)
    assert(b.apply(AddSpec(spec)).isRight) // same spec again
    val m = built(b)
    assert(m.partitionSpecs.count(!_._2.isUnpartitioned) === 1)
    assert(m.partitionSpecs.values.find(!_.isUnpartitioned).get.fields.head.fieldId === 1000)
    assert(m.lastPartitionId === 1000)
  }

  test("set-default-spec -1 resolves the spec added in this commit") {
    val b = fresh()
    assert(b.apply(AddSpec(UnboundPartitionSpec(None,
      Seq(UnboundPartitionField(2, None, "name_trunc", Transform.Truncate(4))))))
      .flatMap(_.apply(SetDefaultSpec(-1))).isRight)
    assert(built(b).defaultSpec.fields.head.name === "name_trunc")
  }

  test("remove-partition-specs drops retired specs, rejects unknown ids") {
    val b = fresh()
    assert(b.apply(AddSpec(UnboundPartitionSpec(None,
      Seq(UnboundPartitionField(1, None, "id_bucket", Transform.Bucket(16)))))).isRight)
    assert(b.apply(SetDefaultSpec(-1)).isRight)
    // spec 0 (unpartitioned) is now retired and removable
    assert(b.apply(RemovePartitionSpecs(Seq(0))).isRight)
    val m = built(b)
    assert(m.partitionSpecs.keySet === Set(m.defaultSpecId))
    assert(!m.defaultSpec.isUnpartitioned)
    // unknown ids are rejected outright
    assert(fresh().apply(RemovePartitionSpecs(Seq(42))).isLeft)
  }

  test("remove-partition-specs of the default fails unless replaced in-commit") {
    // removing the default with no replacement → whole commit fails at build
    val b = fresh()
    assert(b.apply(RemovePartitionSpecs(Seq(0))).isRight)
    assert(b.build().isLeft)
    // the replace flow: retire old default AND install a new one → ok
    val b2 = fresh()
    assert(b2.apply(RemovePartitionSpecs(Seq(0))).isRight)
    assert(b2.apply(AddSpec(UnboundPartitionSpec(None,
      Seq(UnboundPartitionField(2, None, "name_trunc", Transform.Truncate(4)))))).isRight)
    assert(b2.apply(SetDefaultSpec(-1)).isRight)
    val m = built(b2)
    assert(m.defaultSpec.fields.head.name === "name_trunc")
    // only the replacement spec remains (its id may reuse a freed one,
    // as in Iceberg's max+1 allocation over the remaining specs)
    assert(m.partitionSpecs.size === 1)
  }

  test("sort orders: unsorted reuses id 0, real orders dedup") {
    val b = fresh()
    assert(b.apply(AddSortOrder(SortOrder.Unsorted)).isRight)
    val order = SortOrder(7, Seq(SortField(1, Transform.Identity,
      SortDirection.Asc, NullOrder.NullsFirst)))
    assert(b.apply(AddSortOrder(order)).isRight)
    assert(b.apply(AddSortOrder(order.copy(orderId = 9))).isRight) // dedup
    assert(b.apply(SetDefaultSortOrder(-1)).isRight)
    val m = built(b)
    assert(m.sortOrders.keySet === Set(0, 1))
    assert(m.defaultSortOrderId === 1)
  }

  test("snapshots: sequence must increase (v2), duplicate ids conflict") {
    val b = fresh()
    assert(b.apply(AddSnapshot(snap(10, 1))).isRight)
    assert(b.apply(AddSnapshot(snap(10, 2))).isLeft)  // dup id
    assert(b.apply(AddSnapshot(snap(11, 1))).isLeft)  // seq not increasing
    assert(b.apply(AddSnapshot(snap(11, 2))).isRight)
    assert(b.current.lastSequenceNumber === 2)
  }

  test("set-snapshot-ref on main moves current snapshot and appends log") {
    val b = fresh()
    assert(b.apply(AddSnapshot(snap(10, 1))).isRight)
    assert(b.apply(SetSnapshotRef("main", 10, SnapshotRefType.Branch)).isRight)
    val m = b.current
    assert(m.currentSnapshotId === Some(10L))
    assert(m.snapshotLog.map(_.snapshotId) === Seq(10L))
    assert(m.refs("main").isBranch)
  }

  test("tags do not move current snapshot") {
    val b = fresh()
    assert(b.apply(AddSnapshot(snap(10, 1))).isRight)
    assert(b.apply(SetSnapshotRef("v1", 10, SnapshotRefType.Tag,
      maxRefAgeMs = Some(86400000L))).isRight)
    assert(b.current.currentSnapshotId === None)
    assert(b.current.refs("v1").refType === SnapshotRefType.Tag)
  }

  test("remove-snapshot-ref of main resets current and clears log") {
    val b = fresh()
    assert(b.apply(AddSnapshot(snap(10, 1))).isRight)
    assert(b.apply(SetSnapshotRef("main", 10, SnapshotRefType.Branch)).isRight)
    assert(b.apply(RemoveSnapshotRef("main")).isRight)
    assert(b.current.currentSnapshotId === None)
    assert(b.current.snapshotLog.isEmpty)
    assert(!b.current.refs.contains("main"))
  }

  test("remove-snapshots cascades refs of REMOVED snapshots only " +
      "(fixes reference quirk from SURVEY §2.3)") {
    val b = fresh()
    assert(b.apply(AddSnapshot(snap(10, 1))).isRight)
    assert(b.apply(AddSnapshot(snap(11, 2))).isRight)
    assert(b.apply(SetSnapshotRef("main", 11, SnapshotRefType.Branch)).isRight)
    assert(b.apply(SetSnapshotRef("old", 10, SnapshotRefType.Tag)).isRight)
    assert(b.apply(RemoveSnapshots(Seq(10L))).isRight)
    val m = b.current
    assert(!m.snapshots.contains(10L))
    assert(!m.refs.contains("old"))       // ref at removed snapshot: gone
    assert(m.refs.contains("main"))       // ref at surviving snapshot: kept
    assert(m.currentSnapshotId === Some(11L))
  }

  test("set-properties rejects reserved keys; remove unconditional") {
    val b = fresh()
    assert(b.apply(SetProperties(Map("owner" -> "alice", "comment" -> "hi"))).isRight)
    val r = b.apply(SetProperties(Map("format-version" -> "3")))
    assert(r.isLeft)
    assert(b.apply(RemoveProperties(Seq("comment", "nonexistent"))).isRight)
    assert(b.current.properties === Map("owner" -> "alice"))
  }

  test("format version upgrade only (no downgrade, v1->v2 ok)") {
    val bv1 = TableMetadataBuilder.newTable(uuid, "file:///t", schema, t0, formatVersion = 1)
      .fold(e => fail(e.message), identity)
    assert(bv1.apply(UpgradeFormatVersion(2)).isRight)
    assert(bv1.apply(UpgradeFormatVersion(1)).isLeft)
    assert(bv1.apply(UpgradeFormatVersion(3)).isLeft)
  }

  test("assign-uuid reassigns identity") {
    val b = fresh()
    val u2 = UUID.fromString("00000000-0000-0000-0000-000000000001")
    assert(b.apply(AssignUuid(u2)).isRight)
    assert(b.current.tableUuid === u2)
  }

  test("applyAll short-circuits on first error") {
    val b = fresh()
    val r = b.applyAll(Seq(
      SetProperties(Map("a" -> "1")),
      SetProperties(Map("uuid" -> "x")), // reserved → error
      SetProperties(Map("b" -> "2"))))
    assert(r.isLeft)
    assert(b.current.properties === Map("a" -> "1")) // third update never applied
  }

  // ------------------------------------------------------- requirements
  test("requirements assert against current metadata") {
    import TableRequirement._
    val b = fresh()
    assert(b.apply(AddSnapshot(snap(10, 1))).isRight)
    assert(b.apply(SetSnapshotRef("main", 10, SnapshotRefType.Branch)).isRight)
    val m = built(b)

    assert(AssertCreate.check(None).isEmpty)
    assert(AssertCreate.check(Some(m)).nonEmpty)
    assert(AssertTableUuid(uuid).check(Some(m)).isEmpty)
    assert(AssertTableUuid(UUID.randomUUID()).check(Some(m)).nonEmpty)
    assert(AssertCurrentSchemaId(0).check(Some(m)).isEmpty)
    assert(AssertCurrentSchemaId(5).check(Some(m)).nonEmpty)
    assert(AssertDefaultSortOrderId(0).check(Some(m)).isEmpty)
    assert(AssertDefaultSpecId(0).check(Some(m)).isEmpty)
    assert(AssertLastAssignedFieldId(3).check(Some(m)).isEmpty)
    assert(AssertLastAssignedFieldId(2).check(Some(m)).nonEmpty)
    assert(AssertLastAssignedPartitionId(999).check(Some(m)).isEmpty)
    assert(AssertRefSnapshotId("main", Some(10L)).check(Some(m)).isEmpty)
    assert(AssertRefSnapshotId("main", Some(11L)).check(Some(m)).nonEmpty)
    assert(AssertRefSnapshotId("main", None).check(Some(m)).nonEmpty)
    assert(AssertRefSnapshotId("feature", None).check(Some(m)).isEmpty)
    assert(AssertRefSnapshotId("feature", Some(10L)).check(Some(m)).nonEmpty)
    // every non-create requirement conflicts on a missing table
    assert(AssertTableUuid(uuid).check(None).nonEmpty)
  }

  // ------------------------------------------------------------- json
  test("v1 metadata emits legacy schema/partition-spec fields and reads legacy docs") {
    val b = TableMetadataBuilder.newTable(uuid, "file:///tmp/wh/ns/t", schema, t0,
      formatVersion = 1).fold(e => fail(e.message), identity)
    assert(b.applyAll(Seq(
      AddSpec(UnboundPartitionSpec(None, Seq(
        UnboundPartitionField(3, None, "ts_day", Transform.Day)))),
      SetDefaultSpec(-1))).isRight)
    val json = JsonCodecs.metadataToJson(built(b))
    val tree = JsonCodecs.parse(json)
    // v1-required single-value fields present alongside the v2 arrays
    assert(tree.hasNonNull("schema"))
    assert(tree.hasNonNull("partition-spec"))
    assert(tree.get("partition-spec").get(0).get("transform").asText === "day")
    assert(tree.get("partition-spec").get(0).get("field-id").asInt === 1000)

    // a legacy v1 document WITHOUT schemas/partition-specs/sort-orders
    // arrays (and without field-ids in partition-spec) must still parse
    val legacy =
      """{"format-version":1,
         |"table-uuid":"f79c3e09-677c-4bbd-a479-3f349cb785e7",
         |"location":"file:///tmp/wh/ns/t",
         |"last-updated-ms":1700000000000,
         |"last-column-id":3,
         |"schema":{"type":"struct","schema-id":0,"fields":[
         |  {"id":1,"name":"id","required":true,"type":"int"},
         |  {"id":2,"name":"name","required":true,"type":"string"},
         |  {"id":3,"name":"ts","required":false,"type":"timestamptz"}]},
         |"partition-spec":[{"source-id":3,"name":"ts_day","transform":"day"}],
         |"properties":{},
         |"snapshots":[],
         |"snapshot-log":[]}""".stripMargin
    val m = JsonCodecs.metadataFromJson(legacy).fold(e => fail(e), identity)
    assert(m.formatVersion === 1)
    assert(m.currentSchemaId === 0)
    assert(m.schemas(0).fields.size === 3)
    assert(m.defaultSpecId === 0)
    assert(m.partitionSpecs(0).fields.map(f => (f.sourceId, f.fieldId, f.name)) ===
      Seq((3, 1000, "ts_day")))
    assert(m.sortOrders(0).isUnsorted)
    assert(m.defaultSortOrderId === 0)
    // and a v1 doc round-trips through our writer
    val m2 = JsonCodecs.metadataFromJson(JsonCodecs.metadataToJson(m))
      .fold(e => fail(e), identity)
    assert(m2 === m)
  }

  test("metadata JSON round-trip") {
    val b = fresh()
    assert(b.applyAll(Seq(
      AddSpec(UnboundPartitionSpec(None, Seq(
        UnboundPartitionField(1, None, "id_bucket", Transform.Bucket(16)),
        UnboundPartitionField(3, None, "ts_day", Transform.Day)))),
      SetDefaultSpec(-1),
      AddSortOrder(SortOrder(1, Seq(SortField(2, Transform.Identity,
        SortDirection.Desc, NullOrder.NullsLast)))),
      SetDefaultSortOrder(-1),
      AddSnapshot(snap(10, 1)),
      SetSnapshotRef("main", 10, SnapshotRefType.Branch),
      SetSnapshotRef("v1", 10, SnapshotRefType.Tag, maxRefAgeMs = Some(1000L)),
      SetProperties(Map("owner" -> "alice")))).isRight)
    val m = built(b)
    val json = JsonCodecs.metadataToJson(m)
    val m2 = JsonCodecs.metadataFromJson(json).fold(e => fail(e), identity)
    assert(m2 === m)
    // nested types round-trip too
    val nested = Schema(5, Seq(
      NestedField.required(1, "s", TStruct(Seq(
        NestedField.optional(2, "xs", TList(3, TString, elementRequired = false)),
        NestedField.required(4, "m", TMap(5, TString, 6, TDecimal(10, 2), valueRequired = true))))),
      NestedField.optional(7, "f", TFixed(16))),
      identifierFieldIds = Set(7))
    val rt = JsonCodecs.schemaFromJson(JsonCodecs.parse(
      JsonCodecs.render(JsonCodecs.schemaToJson(nested))))
    assert(rt === Right(nested))
  }
}
