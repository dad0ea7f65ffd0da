package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Binder matrix mirroring the reference's own fixture (FIXTURES.md §3:
  * schema id:uuid(1), data:date(2), category:int(3); positive case
  * identity(id) + day(data) + bucket(2, category); negatives: duplicate
  * names, unknown sources, non-identity schema-name collisions, redundant
  * pairs). Behavior per partition_binder.rs:14-228, re-derived.
  */
class PartitionSpecBinderSpec extends AnyFunSuite {
  import IType._
  import Transform._

  private val schema = Schema(0, Seq(
    NestedField.required(1, "id", TUuid),
    NestedField.required(2, "data", TDate),
    NestedField.required(3, "category", TInt)))

  private def unbound(fields: (Int, String, Transform)*): UnboundPartitionSpec =
    UnboundPartitionSpec(None, fields.map { case (src, name, t) =>
      UnboundPartitionField(src, None, name, t)
    })

  test("binds the reference fixture spec, ids from 1000") {
    val Right(spec) = PartitionSpecBinder.bind(schema,
      unbound((1, "id", Identity), (2, "data_day", Day), (3, "category_bucket", Bucket(2))),
      specId = 0): @unchecked
    assert(spec.fields.map(_.fieldId) === Seq(1000, 1001, 1002))
    assert(spec.fields.map(_.name) === Seq("id", "data_day", "category_bucket"))
  }

  test("field ids continue after lastPartitionId") {
    val Right(spec) = PartitionSpecBinder.bind(schema,
      unbound((3, "cat", Identity)), specId = 1, lastPartitionId = 1005): @unchecked
    assert(spec.fields.head.fieldId === 1006)
  }

  test("rejects empty and duplicate names") {
    assert(PartitionSpecBinder.bind(schema, unbound((1, "", Identity)), 0).isLeft)
    assert(PartitionSpecBinder.bind(schema,
      unbound((2, "x", Day), (3, "x", Identity)), 0).isLeft)
  }

  test("rejects unknown source field") {
    assert(PartitionSpecBinder.bind(schema, unbound((99, "x", Identity)), 0).isLeft)
  }

  test("rejects type-incompatible transform") {
    assert(PartitionSpecBinder.bind(schema, unbound((1, "b", Bucket(4)), (2, "t", Truncate(2))), 0)
      .isLeft) // truncate on date
    assert(PartitionSpecBinder.bind(schema, unbound((2, "h", Hour)), 0).isLeft) // hour on date
  }

  test("schema-name collision allowed only for identity on same source") {
    // identity over the same column, same name: OK
    assert(PartitionSpecBinder.bind(schema, unbound((3, "category", Identity)), 0).isRight)
    // non-identity transform stealing a schema field name: rejected
    assert(PartitionSpecBinder.bind(schema, unbound((3, "category", Bucket(4))), 0).isLeft)
    // identity over a DIFFERENT column with a clashing name: rejected
    assert(PartitionSpecBinder.bind(schema, unbound((2, "category", Identity)), 0).isLeft)
  }

  test("rejects redundant (source, transform-family) pairs") {
    assert(PartitionSpecBinder.bind(schema,
      unbound((3, "b4", Bucket(4)), (3, "b16", Bucket(16))), 0).isLeft)
    assert(PartitionSpecBinder.bind(schema,
      unbound((3, "a", Identity), (3, "b", Identity)), 0).isLeft)
    // different families on the same source are fine
    assert(PartitionSpecBinder.bind(schema,
      unbound((3, "a", Identity), (3, "b", Bucket(4))), 0).isRight)
  }

  test("rejects duplicate explicit partition field ids") {
    val spec = UnboundPartitionSpec(None, Seq(
      UnboundPartitionField(2, Some(1000), "data_day", Day),
      UnboundPartitionField(3, Some(1000), "category", Identity)))
    assert(PartitionSpecBinder.bind(schema, spec, 0).isLeft)
    // distinct explicit ids still bind
    val ok = UnboundPartitionSpec(None, Seq(
      UnboundPartitionField(2, Some(1000), "data_day", Day),
      UnboundPartitionField(3, Some(1001), "category", Identity)))
    assert(PartitionSpecBinder.bind(schema, ok, 0).isRight)
    // explicit id colliding with an auto-assigned one is also rejected
    val mixed = UnboundPartitionSpec(None, Seq(
      UnboundPartitionField(2, None, "data_day", Day),        // auto → 1000
      UnboundPartitionField(3, Some(1000), "category", Identity)))
    assert(PartitionSpecBinder.bind(schema, mixed, 0).isLeft)
  }

  test("void transform allowed on any type") {
    val nested = Schema(0, Seq(
      NestedField.required(1, "s", TStruct(Seq(NestedField.required(2, "x", TInt))))))
    assert(PartitionSpecBinder.bind(nested, unbound((1, "v", Void)), 0).isRight)
    assert(PartitionSpecBinder.bind(nested, unbound((1, "i", Identity)), 0).isLeft)
  }
}
