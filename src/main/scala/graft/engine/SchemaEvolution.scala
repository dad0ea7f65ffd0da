package graft.engine

import graft.core._
import org.apache.spark.sql.connector.catalog.TableChange

/** Applies Spark `TableChange` column operations to an Iceberg schema —
  * the translation layer behind SQL `ALTER TABLE ... ADD/DROP/RENAME/
  * ALTER COLUMN` (the surface the reference certifies through
  * iceberg-spark, tests/python/tests/test_spark.py:190-232). The result
  * feeds the commit algebra as add-schema + set-current-schema(-1), so
  * every evolution lands as a first-class schema version with monotonic
  * field ids — old snapshots keep reading with their pinned schema ids.
  *
  * Top-level columns only for now; nested-field evolution raises rather
  * than guessing ids.
  */
object SchemaEvolution {

  /** Returns the evolved schema (schemaId 0 — the builder assigns the
    * real id on add-schema) and the new last-column-id.
    * `partitionSourceIds` are the field ids referenced by any partition
    * spec — dropping one would leave a spec whose sourceId dangles and
    * break the next write, so it is rejected here. */
  def evolve(
      schema: Schema,
      lastColumnId: Int,
      changes: Seq[TableChange],
      partitionSourceIds: Set[Int] = Set.empty): (Schema, Int) = {
    var fields = schema.fields
    var nextId = lastColumnId
    def alloc(): Int = { nextId += 1; nextId }

    def topLevel(fieldNames: Array[String]): String = {
      require(fieldNames.length == 1,
        s"nested column evolution unsupported: ${fieldNames.mkString(".")}")
      fieldNames.head
    }
    def indexOf(name: String): Int = {
      val i = fields.indexWhere(_.name == name)
      require(i >= 0, s"no such column: $name")
      i
    }
    def replace(name: String)(f: NestedField => NestedField): Unit = {
      val i = indexOf(name)
      fields = fields.updated(i, f(fields(i)))
    }

    changes.foreach {
      case c: TableChange.AddColumn =>
        val name = topLevel(c.fieldNames())
        require(!fields.exists(_.name == name), s"column already exists: $name")
        // field id strictly before nested ids, matching fresh-assignment
        val fid = alloc()
        val t = SchemaBridge.toIcebergType(c.dataType(), () => alloc())
        fields = fields :+ NestedField(fid, name, required = !c.isNullable,
          t, doc = Option(c.comment()))

      case c: TableChange.DeleteColumn =>
        val name = topLevel(c.fieldNames())
        val i = fields.indexWhere(_.name == name)
        if (i < 0) {
          require(c.ifExists(), s"no such column: $name")
        } else {
          val fid = fields(i).id
          require(!partitionSourceIds.contains(fid),
            s"cannot drop column $name: referenced by a partition spec")
          require(!schema.identifierFieldIds.contains(fid),
            s"cannot drop column $name: part of the identifier-field list")
          fields = fields.patch(i, Nil, 1)
        }

      case c: TableChange.RenameColumn =>
        require(!fields.exists(_.name == c.newName()),
          s"column already exists: ${c.newName()}")
        replace(topLevel(c.fieldNames()))(_.copy(name = c.newName()))

      case c: TableChange.UpdateColumnType =>
        val t = SchemaBridge.toIcebergType(c.newDataType(), () => alloc())
        require(t.isPrimitive, s"type change to non-primitive: ${c.newDataType()}")
        replace(topLevel(c.fieldNames())) { f =>
          require(safePromotion(f.fieldType, t),
            s"unsafe type change ${f.fieldType} -> $t for column ${f.name}: " +
              "only Iceberg's widening promotions are allowed " +
              "(int->long, float->double, decimal scale widening)")
          f.copy(fieldType = t)
        }

      case c: TableChange.UpdateColumnNullability =>
        replace(topLevel(c.fieldNames()))(_.copy(required = !c.nullable()))

      case c: TableChange.UpdateColumnComment =>
        replace(topLevel(c.fieldNames()))(_.copy(doc = Option(c.newComment())))

      case other =>
        throw new UnsupportedOperationException(
          s"table change not supported: $other")
    }

    val survivingIds = fields.map(_.id).toSet
    (Schema(0, fields, schema.identifierFieldIds.intersect(survivingIds)), nextId)
  }

  /** Iceberg's safe (widening) primitive promotions — anything else
    * could make existing data files unreadable or silently narrow
    * values (spec §Schema Evolution). */
  private def safePromotion(from: IType, to: IType): Boolean = {
    import IType._
    (from, to) match {
      case (a, b) if a == b => true
      case (TInt, TLong) => true
      case (TFloat, TDouble) => true
      case (TDecimal(p1, s1), TDecimal(p2, s2)) => s1 == s2 && p2 >= p1
      case _ => false
    }
  }
}
