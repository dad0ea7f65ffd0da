package graft.core

/** Partition specs and the unbound→bound binder.
  *
  * Behavior re-expressed from the reference's PartitionSpecBinder
  * (/root/reference/crates/iceberg-ext/src/spec/partition_binder.rs:14-228):
  *  - names non-empty and unique (:139-151)
  *  - source field must exist in the schema (:153-157)
  *  - transform must be type-compatible; source must be primitive except
  *    for void (:194-210)
  *  - a partition name may collide with a schema column only for an
  *    identity transform over that same column (:159-188)
  *  - no redundant (source, transform-family) pairs — bucket[4] and
  *    bucket[16] on one source are both "bucket" (:212-227,107)
  *  - partition field ids auto-assigned from 1000 (:23,134-137)
  */
final case class PartitionField(
    sourceId: Int,
    fieldId: Int,
    name: String,
    transform: Transform)

final case class PartitionSpec(specId: Int, fields: Seq[PartitionField]) {
  def isUnpartitioned: Boolean = fields.isEmpty

  /** Spec compatibility ignores spec id and partition-field ids: same
    * source/transform/name sequence ⇒ same spec (reference
    * compatible_with, table_metadata.rs:34-59). */
  def compatibleWith(other: PartitionSpec): Boolean =
    fields.map(f => (f.sourceId, f.transform, f.name)) ==
      other.fields.map(f => (f.sourceId, f.transform, f.name))

  def maxFieldId: Int = ((PartitionSpec.StartFieldId - 1) +: fields.map(_.fieldId)).max
}

object PartitionSpec {
  /** First auto-assigned partition field id per the Iceberg spec. */
  val StartFieldId = 1000
  val Unpartitioned: PartitionSpec = PartitionSpec(0, Nil)
}

final case class UnboundPartitionField(
    sourceId: Int,
    fieldId: Option[Int],
    name: String,
    transform: Transform)

final case class UnboundPartitionSpec(
    specId: Option[Int],
    fields: Seq[UnboundPartitionField])

object UnboundPartitionSpec {
  val Unpartitioned: UnboundPartitionSpec = UnboundPartitionSpec(None, Nil)
}

final case class SpecBindError(message: String)

object PartitionSpecBinder {

  /** Bind an unbound spec against a schema, assigning field ids starting
    * after `lastPartitionId` (or 999 so the first assigned id is 1000).
    */
  def bind(
      schema: Schema,
      unbound: UnboundPartitionSpec,
      specId: Int,
      lastPartitionId: Int = PartitionSpec.StartFieldId - 1)
      : Either[SpecBindError, PartitionSpec] = {

    var nextId = math.max(lastPartitionId, PartitionSpec.StartFieldId - 1)
    val bound = Vector.newBuilder[PartitionField]
    val seenNames = scala.collection.mutable.Set[String]()
    val seenPairs = scala.collection.mutable.Set[(Int, String)]()
    val seenFieldIds = scala.collection.mutable.Set[Int]()

    for (f <- unbound.fields) {
      if (f.name.isEmpty)
        return Left(SpecBindError("partition field name cannot be empty"))
      if (!seenNames.add(f.name))
        return Left(SpecBindError(s"duplicate partition field name: ${f.name}"))

      val source = schema.fieldById(f.sourceId).getOrElse(
        return Left(SpecBindError(s"source field id ${f.sourceId} not found in schema")))

      if (f.transform != Transform.Void && !source.fieldType.isPrimitive)
        return Left(SpecBindError(
          s"cannot partition by non-primitive source field: ${source.name}"))
      if (!f.transform.canTransform(source.fieldType))
        return Left(SpecBindError(
          s"transform ${f.transform.wireName} cannot be applied to " +
            s"${source.name} (${source.fieldType.wireName})"))

      // Name collision with a schema column: only legal when the
      // partition field is identity over that very column.
      schema.fieldByName(f.name).foreach { clash =>
        val identityOnSame = f.transform == Transform.Identity && clash.id == f.sourceId
        if (!identityOnSame)
          return Left(SpecBindError(
            s"partition field name ${f.name} conflicts with schema field " +
              s"and is not an identity transform of it"))
      }

      if (!seenPairs.add((f.sourceId, f.transform.dedupName)))
        return Left(SpecBindError(
          s"redundant partition: source ${f.sourceId} already partitioned " +
            s"by ${f.transform.dedupName}"))

      val fid = f.fieldId.getOrElse { nextId += 1; nextId }
      if (!seenFieldIds.add(fid))
        return Left(SpecBindError(s"duplicate partition field id: $fid"))
      nextId = math.max(nextId, fid)
      bound += PartitionField(f.sourceId, fid, f.name, f.transform)
    }
    Right(PartitionSpec(specId, bound.result()))
  }

  /** Re-validate an already-bound spec against a (new) schema — used by
    * set-current-schema, which rebinds all specs (table_metadata.rs:367-408). */
  def rebind(schema: Schema, spec: PartitionSpec): Either[SpecBindError, PartitionSpec] =
    bind(
      schema,
      UnboundPartitionSpec(Some(spec.specId),
        spec.fields.map(f => UnboundPartitionField(f.sourceId, Some(f.fieldId), f.name, f.transform))),
      spec.specId)
}
