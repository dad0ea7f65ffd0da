package graft.core

import java.util.UUID

/** Commit updates — the "expression language" of metadata commits
  * (SURVEY.md §2.3). Wire `action` names follow the public Iceberg REST
  * spec; semantics are folded by [[TableMetadataBuilder]].
  */
sealed trait TableUpdate { def action: String }

object TableUpdate {
  final case class AssignUuid(uuid: UUID) extends TableUpdate {
    val action = "assign-uuid"
  }
  final case class UpgradeFormatVersion(formatVersion: Int) extends TableUpdate {
    val action = "upgrade-format-version"
  }
  final case class AddSchema(schema: Schema, lastColumnId: Option[Int])
      extends TableUpdate { val action = "add-schema" }
  /** schemaId == -1 selects the schema added last in this commit. */
  final case class SetCurrentSchema(schemaId: Int) extends TableUpdate {
    val action = "set-current-schema"
  }
  final case class AddSpec(spec: UnboundPartitionSpec) extends TableUpdate {
    val action = "add-spec"
  }
  /** specId == -1 selects the spec added last in this commit. */
  final case class SetDefaultSpec(specId: Int) extends TableUpdate {
    val action = "set-default-spec"
  }
  final case class AddSortOrder(sortOrder: SortOrder) extends TableUpdate {
    val action = "add-sort-order"
  }
  /** sortOrderId == -1 selects the order added last in this commit. */
  final case class SetDefaultSortOrder(sortOrderId: Int) extends TableUpdate {
    val action = "set-default-sort-order"
  }
  final case class AddSnapshot(snapshot: Snapshot) extends TableUpdate {
    val action = "add-snapshot"
  }
  final case class RemoveSnapshots(snapshotIds: Seq[Long]) extends TableUpdate {
    val action = "remove-snapshots"
  }
  /** Iceberg v2 remove-partition-specs: drop retired specs by id. The
    * default-spec invariant is re-checked at build(), so a commit may
    * remove the old default as long as it installs a new one. */
  final case class RemovePartitionSpecs(specIds: Seq[Int]) extends TableUpdate {
    val action = "remove-partition-specs"
  }
  final case class SetSnapshotRef(
      refName: String,
      snapshotId: Long,
      refType: String,
      minSnapshotsToKeep: Option[Int] = None,
      maxSnapshotAgeMs: Option[Long] = None,
      maxRefAgeMs: Option[Long] = None) extends TableUpdate {
    val action = "set-snapshot-ref"
  }
  final case class RemoveSnapshotRef(refName: String) extends TableUpdate {
    val action = "remove-snapshot-ref"
  }
  final case class SetLocation(location: String) extends TableUpdate {
    val action = "set-location"
  }
  final case class SetProperties(updates: Map[String, String]) extends TableUpdate {
    val action = "set-properties"
  }
  final case class RemoveProperties(removals: Seq[String]) extends TableUpdate {
    val action = "remove-properties"
  }
}

/** Optimistic-concurrency predicates asserted against CURRENT metadata
  * inside the store's commit critical section (SURVEY.md §2.3 table;
  * reference assert impl iceberg-ext/src/catalog/rest/table.rs:92-248).
  * Violations are 409-style conflicts so the engine's retry loop
  * refreshes and converges.
  */
sealed trait TableRequirement {
  def requirementType: String
  /** None = satisfied; Some(err) = conflict. `exists` covers assert-create. */
  def check(current: Option[TableMetadata]): Option[CommitError]
}

object TableRequirement {
  import CommitError.conflict

  case object AssertCreate extends TableRequirement {
    val requirementType = "assert-create"
    def check(current: Option[TableMetadata]): Option[CommitError] =
      current.map(_ => conflict("TableAlreadyExists",
        "assert-create failed: table already exists"))
  }

  private def withTable(current: Option[TableMetadata])(
      f: TableMetadata => Option[CommitError]): Option[CommitError] =
    current match {
      case None => Some(conflict("TableNotFound", "table does not exist"))
      case Some(m) => f(m)
    }

  final case class AssertTableUuid(uuid: UUID) extends TableRequirement {
    val requirementType = "assert-table-uuid"
    def check(current: Option[TableMetadata]): Option[CommitError] =
      withTable(current) { m =>
        if (m.tableUuid == uuid) None
        else Some(conflict("TableRequirementUuidMatch",
          s"table uuid ${m.tableUuid} != required $uuid"))
      }
  }

  final case class AssertCurrentSchemaId(schemaId: Int) extends TableRequirement {
    val requirementType = "assert-current-schema-id"
    def check(current: Option[TableMetadata]): Option[CommitError] =
      withTable(current) { m =>
        if (m.currentSchemaId == schemaId) None
        else Some(conflict("TableRequirementCurrentSchemaIdMatch",
          s"current schema id ${m.currentSchemaId} != required $schemaId"))
      }
  }

  final case class AssertDefaultSortOrderId(sortOrderId: Int) extends TableRequirement {
    val requirementType = "assert-default-sort-order-id"
    def check(current: Option[TableMetadata]): Option[CommitError] =
      withTable(current) { m =>
        if (m.defaultSortOrderId == sortOrderId) None
        else Some(conflict("TableRequirementDefaultSortOrderIdMatch",
          s"default sort order ${m.defaultSortOrderId} != required $sortOrderId"))
      }
  }

  /** `snapshotId = None` requires the ref to be ABSENT (first commit to a
    * fresh branch); otherwise the ref must point at exactly snapshotId. */
  final case class AssertRefSnapshotId(refName: String, snapshotId: Option[Long])
      extends TableRequirement {
    val requirementType = "assert-ref-snapshot-id"
    def check(current: Option[TableMetadata]): Option[CommitError] =
      withTable(current) { m =>
        (m.refs.get(refName), snapshotId) match {
          case (None, None) => None
          case (Some(r), Some(id)) if r.snapshotId == id => None
          case (Some(r), _) => Some(conflict("TableRequirementRefSnapshotIdMatch",
            s"ref $refName is at ${r.snapshotId}, required ${snapshotId.fold("absent")(_.toString)}"))
          case (None, Some(id)) => Some(conflict("TableRequirementRefSnapshotIdMatch",
            s"ref $refName does not exist, required at $id"))
        }
      }
  }

  final case class AssertDefaultSpecId(specId: Int) extends TableRequirement {
    val requirementType = "assert-default-spec-id"
    def check(current: Option[TableMetadata]): Option[CommitError] =
      withTable(current) { m =>
        if (m.defaultSpecId == specId) None
        else Some(conflict("TableRequirementDefaultSpecIdMatch",
          s"default spec ${m.defaultSpecId} != required $specId"))
      }
  }

  final case class AssertLastAssignedPartitionId(lastAssignedPartitionId: Int)
      extends TableRequirement {
    val requirementType = "assert-last-assigned-partition-id"
    def check(current: Option[TableMetadata]): Option[CommitError] =
      withTable(current) { m =>
        if (m.lastPartitionId == lastAssignedPartitionId) None
        else Some(conflict("TableRequirementLastAssignedPartitionIdMatch",
          s"last partition id ${m.lastPartitionId} != required $lastAssignedPartitionId"))
      }
  }

  final case class AssertLastAssignedFieldId(lastAssignedFieldId: Int)
      extends TableRequirement {
    val requirementType = "assert-last-assigned-field-id"
    def check(current: Option[TableMetadata]): Option[CommitError] =
      withTable(current) { m =>
        if (m.lastColumnId == lastAssignedFieldId) None
        else Some(conflict("TableRequirementLastAssignedFieldIdMatch",
          s"last column id ${m.lastColumnId} != required $lastAssignedFieldId"))
      }
  }
}
