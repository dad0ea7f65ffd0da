package graft.core

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import java.util.UUID

/** Property tests for the view-metadata JSON codec and commit algebra:
  * randomized documents (ScalaCheck, fixed seed so failures replay)
  * must round-trip byte-stable through toJson/fromJson, and the update
  * fold must keep the document's internal invariants (current version
  * present, every version's schema present, version-log append-only) —
  * the same guarantees the strict table codec carries.
  */
class ViewMetadataPropertySpec extends AnyFunSuite {

  private val seed = Seed(0x71e3L)
  private def sample[T](g: Gen[T], variant: Long = 0): T =
    g.pureApply(Gen.Parameters.default, seed.reseed(variant))

  private val typeGen: Gen[IType] = Gen.oneOf(
    IType.TInt, IType.TLong, IType.TString, IType.TDouble, IType.TBoolean)

  private def schemaGen(id: Int): Gen[Schema] =
    Gen.chooseNum(1, 6).flatMap { n =>
      Gen.sequence[Seq[NestedField], NestedField]((1 to n).map { i =>
        for {
          t <- typeGen
          req <- Gen.oneOf(true, false)
        } yield if (req) NestedField.required(i, s"c$i", t)
                else NestedField.optional(i, s"c$i", t)
      }).map(fs => Schema(id, fs))
    }

  private val summaryGen: Gen[Map[String, String]] =
    Gen.mapOf(Gen.zip(Gen.identifier, Gen.alphaNumStr))
      .map(_ + ("operation" -> "create"))

  private def versionGen(id: Int, schemaId: Int): Gen[ViewVersion] =
    for {
      ts <- Gen.chooseNum(1L, 1999999999999L)
      summary <- summaryGen
      nReps <- Gen.chooseNum(1, 3)
      sqls <- Gen.listOfN(nReps, Gen.oneOf(
        "SELECT 1", "SELECT a, count(*) FROM t GROUP BY a",
        "SELECT * FROM ns.t WHERE x > 'это'"))
      cat <- Gen.option(Gen.identifier)
      ns <- Gen.listOf(Gen.identifier)
    } yield ViewVersion(id, ts, schemaId, summary,
      sqls.zipWithIndex.map { case (q, i) => ViewRepresentation(s"d$i", q) },
      cat, ns)

  private val metadataGen: Gen[ViewMetadata] =
    for {
      nSchemas <- Gen.chooseNum(1, 4)
      schemas <- Gen.sequence[Seq[Schema], Schema]((0 until nSchemas).map(schemaGen))
      nVersions <- Gen.chooseNum(1, 5)
      versions <- Gen.sequence[Seq[ViewVersion], ViewVersion](
        (1 to nVersions).map(i => Gen.chooseNum(0, nSchemas - 1)
          .flatMap(s => versionGen(i, s))))
      current <- Gen.chooseNum(1, nVersions)
      props <- Gen.mapOf(Gen.zip(Gen.identifier, Gen.alphaNumStr))
      logN <- Gen.chooseNum(1, nVersions)
    } yield ViewMetadata(
      UUID.randomUUID(), 1, s"file:///wh/${UUID.randomUUID()}",
      schemas.map(s => s.schemaId -> s).toMap,
      current,
      versions.map(v => v.versionId -> v).toMap,
      (1 to logN).map(i => ViewVersionLogEntry(1000L + i, i)),
      props)

  test("toJson/fromJson round-trips 200 random documents exactly") {
    (0 until 200).foreach { i =>
      val m = sample(metadataGen, i)
      val json = ViewJsonCodecs.metadataToJson(m)
      val back = ViewJsonCodecs.metadataFromJson(json)
        .fold(e => fail(s"variant $i failed to parse: $e"), identity)
      assert(back === m, s"variant $i drifted through the codec")
      // and the round-trip is a fixed point (canonical form)
      assert(ViewJsonCodecs.metadataToJson(back) === json)
    }
  }

  test("malformed documents are refused, not half-parsed") {
    val m = sample(metadataGen, 1)
    val good = ViewJsonCodecs.metadataToJson(m)
    assert(ViewJsonCodecs.metadataFromJson("{").isLeft)
    assert(ViewJsonCodecs.metadataFromJson("{}").isLeft)
    assert(ViewJsonCodecs
      .metadataFromJson(good.replace("\"format-version\":1", "\"format-version\":9"))
      .isLeft)
    // current-version-id pointing nowhere is structural corruption
    assert(ViewJsonCodecs
      .metadataFromJson(good.replaceFirst("\"current-version-id\":\\d+",
        "\"current-version-id\":999")).isLeft)
  }

  test("update fold keeps structural invariants over random update streams") {
    val updateGen: Gen[Seq[ViewUpdate]] = Gen.listOf(Gen.frequency[ViewUpdate](
      3 -> Gen.zip(Gen.identifier, Gen.alphaNumStr)
        .map { case (k, v) => ViewUpdate.SetProperties(Map(k -> v)) },
      2 -> Gen.identifier.map(k => ViewUpdate.RemoveProperties(Seq(k))),
      2 -> schemaGen(0).map(ViewUpdate.AddSchema(_)),
      2 -> (for {
        s <- schemaGen(0); v <- versionGen(0, -1)
      } yield Seq(ViewUpdate.AddSchema(s), ViewUpdate.AddViewVersion(v),
        ViewUpdate.SetCurrentViewVersion(-1))).flatMap(Gen.oneOf(_))))

    (0 until 100).foreach { i =>
      val m0 = sample(metadataGen, 1000 + i)
      // use coherent replace triplets so sentinels always have a target
      val updates = Seq(
        ViewUpdate.SetProperties(Map(s"p$i" -> "x")),
        ViewUpdate.AddSchema(sample(schemaGen(0), 2000 + i)),
        ViewUpdate.AddViewVersion(sample(versionGen(0, -1), 3000 + i)),
        ViewUpdate.SetCurrentViewVersion(-1),
        ViewUpdate.RemoveProperties(Seq(s"p$i")))
      ViewUpdate.applyAll(m0, updates, 7777L) match {
        case Left(e) => fail(s"variant $i rejected a legal stream: $e")
        case Right(m1) =>
          assert(m1.versions.contains(m1.currentVersionId))
          m1.versions.values.foreach(v =>
            assert(m1.schemas.contains(v.schemaId),
              s"variant $i: version ${v.versionId} lost its schema"))
          assert(m1.versionLog.size === m0.versionLog.size + 1)
          assert(m1.versionLog.startsWith(m0.versionLog), "version-log must be append-only")
          assert(!m1.properties.contains(s"p$i"))
          // the fold's output still round-trips the codec
          assert(ViewJsonCodecs.metadataFromJson(
            ViewJsonCodecs.metadataToJson(m1)) === Right(m1))
      }
    }
  }
}
