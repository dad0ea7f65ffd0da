package graft.core

import java.util.UUID

/** The commit fold: applies [[TableUpdate]]s to table metadata with the
  * semantics catalogued in SURVEY.md §2.3 (behavioral port of the
  * reference's TableMetadataAggregate,
  * /root/reference/crates/iceberg-ext/src/spec/table_metadata.rs — no
  * code copied; every rule re-derived from observed behavior + the
  * public Iceberg spec).
  *
  * Pure: no I/O, no clock (callers supply timestamps), so the whole
  * commit algebra unit-tests without Spark or a store.
  */
final class TableMetadataBuilder private (private var m: TableMetadata) {
  import TableUpdate._

  // -1 "last added" sentinels are scoped to one builder (= one commit).
  private var lastAddedSchemaId: Option[Int] = None
  private var lastAddedSpecId: Option[Int] = None
  private var removedSpecs: Boolean = false
  private var lastAddedOrderId: Option[Int] = None
  /** Snapshots added in this commit (set-snapshot-ref bookkeeping). */
  private var addedSnapshotIds: Set[Long] = Set.empty

  def current: TableMetadata = m

  def apply(update: TableUpdate): Either[CommitError, TableMetadataBuilder] =
    update match {
      case AssignUuid(u) => Right { m = m.copy(tableUuid = u); this }

      case UpgradeFormatVersion(v) =>
        if (!TableMetadata.SupportedFormatVersions.contains(v))
          Left(CommitError.validation(s"unsupported format version: $v"))
        else if (v < m.formatVersion)
          Left(CommitError.validation(
            s"cannot downgrade format version ${m.formatVersion} -> $v"))
        else Right { m = m.copy(formatVersion = v); this }

      case AddSchema(schema, lastColumnId) => addSchema(schema, lastColumnId)
      case SetCurrentSchema(id) => setCurrentSchema(id)
      case AddSpec(spec) => addSpec(spec)
      case SetDefaultSpec(id) => setDefaultSpec(id)
      case RemovePartitionSpecs(ids) => removePartitionSpecs(ids)
      case AddSortOrder(order) => addSortOrder(order)
      case SetDefaultSortOrder(id) => setDefaultSortOrder(id)
      case AddSnapshot(snap) => addSnapshot(snap)
      case RemoveSnapshots(ids) => removeSnapshots(ids)
      case r: SetSnapshotRef => setSnapshotRef(r)
      case RemoveSnapshotRef(name) => removeSnapshotRef(name)

      case SetLocation(loc) =>
        // The store additionally rejects location CHANGES on commit
        // (postgres/table.rs:738-747); the fold just records it.
        Right { m = m.copy(location = loc); this }

      case SetProperties(updates) =>
        val reserved = updates.keySet.intersect(TableMetadata.ReservedProperties)
        if (reserved.nonEmpty)
          Left(CommitError.conflict("ReservedProperty",
            s"cannot set reserved properties: ${reserved.toSeq.sorted.mkString(", ")}"))
        else Right { m = m.copy(properties = m.properties ++ updates); this }

      case RemoveProperties(removals) =>
        Right { m = m.copy(properties = m.properties -- removals); this }
    }

  /** Structural dedup: re-adding an equal schema reuses its id; otherwise
    * assign max+1. last_column_id only ever grows. */
  private def addSchema(schema: Schema, lastColumnId: Option[Int])
      : Either[CommitError, TableMetadataBuilder] = {
    m.schemas.values.find(_.sameStructure(schema)) match {
      case Some(existing) =>
        // last_column_id stays monotonic against the REQUESTED value even
        // when the schema dedups to an existing id (Iceberg keeps the
        // counter advancing; ADVICE r2 finding b).
        m = m.copy(lastColumnId =
          math.max(m.lastColumnId, lastColumnId.getOrElse(0)))
        lastAddedSchemaId = Some(existing.schemaId)
        Right(this)
      case None =>
        val newId = (m.schemas.keySet + -1).max + 1 match {
          case id if id <= schema.schemaId && !m.schemas.contains(schema.schemaId) =>
            schema.schemaId
          case id => id
        }
        val assigned = schema.copy(schemaId = newId)
        val highest = math.max(
          m.lastColumnId,
          math.max(assigned.maxFieldId, lastColumnId.getOrElse(0)))
        if (lastColumnId.exists(_ < assigned.maxFieldId))
          return Left(CommitError.validation(
            s"last-column-id ${lastColumnId.get} is below the schema's max field id ${assigned.maxFieldId}"))
        m = m.copy(schemas = m.schemas + (newId -> assigned), lastColumnId = highest)
        lastAddedSchemaId = Some(newId)
        Right(this)
    }
  }

  /** -1 = last added in this commit. Rebinds every partition spec and
    * sort order against the new schema so evolution cannot leave a spec
    * referencing a dropped/incompatible column. */
  private def setCurrentSchema(id: Int): Either[CommitError, TableMetadataBuilder] = {
    val target = if (id == -1) lastAddedSchemaId.getOrElse(
      return Left(CommitError.validation(
        "set-current-schema -1 without add-schema in this commit"))) else id
    val schema = m.schemas.getOrElse(target,
      return Left(CommitError.validation(s"schema $target not found")))

    val reboundSpecs = m.partitionSpecs.map { case (sid, spec) =>
      PartitionSpecBinder.rebind(schema, spec) match {
        case Right(b) => sid -> b
        case Left(e) => return Left(CommitError.validation(
          s"partition spec $sid incompatible with schema $target: ${e.message}"))
      }
    }
    for ((oid, order) <- m.sortOrders if !order.isUnsorted)
      order.bind(schema).left.foreach(e => return Left(CommitError.validation(
        s"sort order $oid incompatible with schema $target: $e")))

    m = m.copy(currentSchemaId = schema.schemaId, partitionSpecs = reboundSpecs)
    Right(this)
  }

  /** Bind against CURRENT schema; dedup by compatibility (ids ignored);
    * v1 additionally requires sequential field ids from 1000. */
  private def addSpec(unbound: UnboundPartitionSpec)
      : Either[CommitError, TableMetadataBuilder] = {
    val specId = unbound.specId.getOrElse((m.partitionSpecs.keySet + -1).max + 1)
    PartitionSpecBinder.bind(m.currentSchema, unbound, specId, m.lastPartitionId) match {
      case Left(e) => Left(CommitError.validation(e.message))
      case Right(bound) =>
        m.partitionSpecs.values.find(_.compatibleWith(bound)) match {
          case Some(existing) =>
            lastAddedSpecId = Some(existing.specId)
            Right(this)
          case None =>
            if (m.formatVersion == 1) {
              val ids = bound.fields.map(_.fieldId)
              val expected = (PartitionSpec.StartFieldId until
                PartitionSpec.StartFieldId + ids.size)
              if (ids != expected)
                return Left(CommitError.validation(
                  "v1 partition spec requires sequential field ids starting at 1000"))
            }
            val newId = if (m.partitionSpecs.contains(bound.specId))
              (m.partitionSpecs.keySet + -1).max + 1 else bound.specId
            val assigned = bound.copy(specId = newId)
            m = m.copy(
              partitionSpecs = m.partitionSpecs + (newId -> assigned),
              lastPartitionId = math.max(m.lastPartitionId, assigned.maxFieldId))
            lastAddedSpecId = Some(newId)
            Right(this)
        }
    }
  }

  /** Remove retired specs. Unknown ids are rejected; removing the
    * CURRENT default is allowed mid-commit because build() re-checks
    * that the final default spec exists (a commit that removes the
    * default without installing a new one fails as a whole). */
  private def removePartitionSpecs(ids: Seq[Int])
      : Either[CommitError, TableMetadataBuilder] = {
    val missing = ids.filterNot(m.partitionSpecs.contains)
    if (missing.nonEmpty)
      Left(CommitError.validation(
        s"cannot remove unknown partition spec ids: ${missing.mkString(", ")}"))
    else Right {
      removedSpecs = true
      m = m.copy(partitionSpecs = m.partitionSpecs -- ids); this
    }
  }

  private def setDefaultSpec(id: Int): Either[CommitError, TableMetadataBuilder] = {
    val target = if (id == -1) lastAddedSpecId.getOrElse(
      return Left(CommitError.validation(
        "set-default-spec -1 without add-spec in this commit"))) else id
    if (!m.partitionSpecs.contains(target))
      Left(CommitError.validation(s"partition spec $target not found"))
    else Right { m = m.copy(defaultSpecId = target); this }
  }

  /** Unsorted always normalizes to id 0; otherwise dedup by fields. */
  private def addSortOrder(order: SortOrder): Either[CommitError, TableMetadataBuilder] = {
    if (order.isUnsorted) {
      m = m.copy(sortOrders = m.sortOrders + (0 -> SortOrder.Unsorted))
      lastAddedOrderId = Some(0)
      return Right(this)
    }
    order.bind(m.currentSchema) match {
      case Left(e) => Left(CommitError.validation(e))
      case Right(bound) =>
        m.sortOrders.values.find(_.sameOrder(bound)) match {
          case Some(existing) =>
            lastAddedOrderId = Some(existing.orderId)
            Right(this)
          case None =>
            val newId = math.max(1, (m.sortOrders.keySet + 0).max + 1)
            m = m.copy(sortOrders = m.sortOrders + (newId -> bound.copy(orderId = newId)))
            lastAddedOrderId = Some(newId)
            Right(this)
        }
    }
  }

  private def setDefaultSortOrder(id: Int): Either[CommitError, TableMetadataBuilder] = {
    val target = if (id == -1) lastAddedOrderId.getOrElse(
      return Left(CommitError.validation(
        "set-default-sort-order -1 without add-sort-order in this commit"))) else id
    if (!m.sortOrders.contains(target))
      Left(CommitError.validation(s"sort order $target not found"))
    else Right { m = m.copy(defaultSortOrderId = target); this }
  }

  /** Requires a schema/spec/sort-order to exist; duplicate ids conflict;
    * V2 sequence numbers must strictly increase. */
  private def addSnapshot(snap: Snapshot): Either[CommitError, TableMetadataBuilder] = {
    if (m.schemas.isEmpty || m.partitionSpecs.isEmpty || m.sortOrders.isEmpty)
      return Left(CommitError.validation(
        "cannot add snapshot before schema, partition spec and sort order exist"))
    if (m.snapshots.contains(snap.snapshotId))
      return Left(CommitError.conflict("SnapshotAlreadyExists",
        s"snapshot ${snap.snapshotId} already exists"))
    if (m.formatVersion >= 2 && snap.sequenceNumber <= m.lastSequenceNumber)
      return Left(CommitError.validation(
        s"sequence number ${snap.sequenceNumber} must be > ${m.lastSequenceNumber}"))
    m = m.copy(
      snapshots = m.snapshots + (snap.snapshotId -> snap),
      lastSequenceNumber = math.max(m.lastSequenceNumber, snap.sequenceNumber),
      lastUpdatedMs = math.max(m.lastUpdatedMs, snap.timestampMs))
    addedSnapshotIds += snap.snapshotId
    Right(this)
  }

  /** Drop snapshots by id and cascade-remove refs that point at REMOVED
    * snapshots. NOTE: the reference inverts this condition and removes
    * refs of *surviving* snapshots (table_metadata.rs:724-732, flagged in
    * SURVEY.md §2.3 as a quirk NOT to replicate) — we implement the
    * correct cascade and pin it with a regression test. */
  private def removeSnapshots(ids: Seq[Long]): Either[CommitError, TableMetadataBuilder] = {
    val removing = ids.toSet
    val survivingRefs = m.refs.filter { case (_, r) => !removing.contains(r.snapshotId) }
    val newCurrent = m.currentSnapshotId.filterNot(removing.contains)
    m = m.copy(
      snapshots = m.snapshots -- removing,
      refs = survivingRefs,
      currentSnapshotId = newCurrent,
      snapshotLog = m.snapshotLog.filterNot(e => removing.contains(e.snapshotId)))
    Right(this)
  }

  /** Branch/tag upsert. Moving `main` also moves current_snapshot_id and
    * appends to the snapshot log; the timestamp reuses the snapshot's own
    * commit time when the snapshot was added in this same commit. */
  private def setSnapshotRef(r: TableUpdate.SetSnapshotRef)
      : Either[CommitError, TableMetadataBuilder] = {
    if (r.refType != SnapshotRefType.Branch && r.refType != SnapshotRefType.Tag)
      return Left(CommitError.validation(s"unknown ref type: ${r.refType}"))
    val snap = m.snapshots.getOrElse(r.snapshotId,
      return Left(CommitError.validation(
        s"cannot set ref ${r.refName}: snapshot ${r.snapshotId} not found")))
    val ref = SnapshotReference(r.snapshotId, r.refType, r.minSnapshotsToKeep,
      r.maxSnapshotAgeMs, r.maxRefAgeMs)
    val newRefs = m.refs + (r.refName -> ref)
    if (r.refName == TableMetadata.MainBranch) {
      val tsMs =
        if (addedSnapshotIds.contains(r.snapshotId)) snap.timestampMs
        else math.max(m.lastUpdatedMs, snap.timestampMs)
      m = m.copy(
        refs = newRefs,
        currentSnapshotId = Some(r.snapshotId),
        lastUpdatedMs = math.max(m.lastUpdatedMs, tsMs),
        snapshotLog = m.snapshotLog :+ SnapshotLogEntry(r.snapshotId, tsMs))
    } else m = m.copy(refs = newRefs)
    Right(this)
  }

  /** Removing `main` resets the current snapshot and clears the log
    * (reference behavior, table_metadata.rs:801-814). */
  private def removeSnapshotRef(name: String): Either[CommitError, TableMetadataBuilder] = {
    if (name == TableMetadata.MainBranch)
      m = m.copy(refs = m.refs - name, currentSnapshotId = None, snapshotLog = Nil)
    else m = m.copy(refs = m.refs - name)
    Right(this)
  }

  /** Finalize: default spec 0 (unpartitioned) and sort order 0 (unsorted)
    * when absent; a current schema must exist. */
  def build(): Either[CommitError, TableMetadata] = {
    var out = m
    // seed the unpartitioned default for NEW tables only — a commit
    // that emptied the map via remove-partition-specs must not have a
    // default silently resurrected (the contains-check below fails it)
    if (out.partitionSpecs.isEmpty && !removedSpecs)
      out = out.copy(partitionSpecs = Map(0 -> PartitionSpec.Unpartitioned), defaultSpecId = 0)
    if (out.sortOrders.isEmpty)
      out = out.copy(sortOrders = Map(0 -> SortOrder.Unsorted), defaultSortOrderId = 0)
    if (!out.schemas.contains(out.currentSchemaId) || out.currentSchemaId < 0)
      return Left(CommitError.validation("table metadata has no current schema"))
    if (!out.partitionSpecs.contains(out.defaultSpecId))
      return Left(CommitError.validation(
        s"default partition spec ${out.defaultSpecId} was removed without a replacement"))
    if (out.lastColumnId < 0)
      return Left(CommitError.validation("last-column-id must be >= 0"))
    Right(out)
  }

  def applyAll(updates: Seq[TableUpdate]): Either[CommitError, TableMetadataBuilder] =
    updates.foldLeft[Either[CommitError, TableMetadataBuilder]](Right(this)) {
      case (Right(b), u) => b.apply(u)
      case (l @ Left(_), _) => l
    }
}

object TableMetadataBuilder {

  /** Start a fresh table (create path): server-assigned uuid + location,
    * schema as given (schema-id preserved), nothing else yet. */
  def newTable(
      tableUuid: UUID,
      location: String,
      schema: Schema,
      timestampMs: Long,
      formatVersion: Int = 2): Either[CommitError, TableMetadataBuilder] = {
    if (!TableMetadata.SupportedFormatVersions.contains(formatVersion))
      return Left(CommitError.validation(s"unsupported format version: $formatVersion"))
    val base = TableMetadata(
      formatVersion = formatVersion,
      tableUuid = tableUuid,
      location = location,
      lastSequenceNumber = 0L,
      lastUpdatedMs = timestampMs,
      lastColumnId = schema.maxFieldId,
      schemas = Map(schema.schemaId -> schema),
      currentSchemaId = schema.schemaId,
      // Create flow starts with the canonical defaults (unpartitioned
      // spec 0, unsorted order 0); add-spec/add-sort-order evolve them.
      partitionSpecs = Map(0 -> PartitionSpec.Unpartitioned),
      defaultSpecId = 0,
      lastPartitionId = PartitionSpec.StartFieldId - 1,
      properties = Map.empty,
      currentSnapshotId = None,
      snapshots = Map.empty,
      snapshotLog = Nil,
      metadataLog = Nil,
      sortOrders = Map(0 -> SortOrder.Unsorted),
      defaultSortOrderId = 0,
      refs = Map.empty)
    val b = new TableMetadataBuilder(base)
    b.lastAddedSchemaId = Some(schema.schemaId)
    Right(b)
  }

  /** Continue from existing metadata (commit path). */
  def from(metadata: TableMetadata): TableMetadataBuilder =
    new TableMetadataBuilder(metadata)
}
