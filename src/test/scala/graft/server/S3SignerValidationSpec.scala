package graft.server

import org.scalatest.funsuite.AnyFunSuite

import java.net.URI

/** Port of the reference signer's unit matrix (s3_signer.rs:530-757):
  * virtual-host vs path-style addressing, wrong bucket/key, dotted
  * buckets, custom endpoints, region and verb rules, http→s3 location
  * reversal, and the partial path decode. */
class S3SignerValidationSpec extends AnyFunSuite {
  import S3SignerValidation._

  private def check(
      requestUri: String, tableLocation: String, region: String,
      endpoint: Option[String], expectOk: Boolean): Unit = {
    val profile = S3Profile("should-not-be-used", region, endpoint)
    val r = validateUri(URI.create(requestUri), tableLocation, profile)
    assert(r.isRight === expectOk,
      s"$requestUri vs $tableLocation (endpoint=$endpoint): $r")
  }

  test("virtual-host style matrix") {
    check("https://bucket.s3.my-region.amazonaws.com/key",
      "s3://bucket/key", "my-region", None, expectOk = true)
    // subpaths allowed
    check("https://bucket.s3.my-region.amazonaws.com/key/foo/file.parquet",
      "s3://bucket/key", "my-region", None, expectOk = true)
    // special characters stay encoded on both sides
    check("https://bucket.s3.my-region.amazonaws.com/key/with-special-chars%20/foo",
      "s3://bucket/key/with-special-chars%20/foo", "my-region", None, expectOk = true)
    // wrong key
    check("https://bucket.s3.my-region.amazonaws.com/key-2",
      "s3://bucket/key", "my-region", None, expectOk = false)
    // wrong bucket
    check("https://bucket-2.s3.my-region.amazonaws.com/key",
      "s3://bucket/key", "my-region", None, expectOk = false)
    // dotted bucket
    check("https://bucket.with.point.s3.my-region.amazonaws.com/key",
      "s3://bucket.with.point/key", "my-region", None, expectOk = true)
  }

  test("path-style matrix") {
    check("https://s3.my-region.amazonaws.com/bucket/key",
      "s3://bucket/key", "my-region", None, expectOk = true)
    check("https://s3.my-region.amazonaws.com/bucket/key/foo/file.parquet",
      "s3://bucket/key", "my-region", None, expectOk = true)
    check("https://s3.my-region.amazonaws.com/bucket/key/with-special-chars%20/foo",
      "s3://bucket/key/with-special-chars%20/foo", "my-region", None, expectOk = true)
    check("https://s3.my-region.amazonaws.com/bucket/key-2",
      "s3://bucket/key", "my-region", None, expectOk = false)
    check("https://s3.my-region.amazonaws.com/bucket-2/key",
      "s3://bucket/key", "my-region", None, expectOk = false)
    check("https://s3.my-region.amazonaws.com/bucket.with.point/key",
      "s3://bucket.with.point/key", "my-region", None, expectOk = true)
  }

  test("bucket missing from path-style request is rejected") {
    check("https://s3.my-region.amazonaws.com/key",
      "s3://bucket/key", "my-region", None, expectOk = false)
  }

  test("dualstack and fips access points accepted; foreign hosts rejected") {
    for (ap <- Seq("s3.dualstack", "s3-fips", "s3-fips.dualstack"))
      check(s"https://bucket.$ap.my-region.amazonaws.com/key",
        "s3://bucket/key", "my-region", None, expectOk = true)
    // wrong region in host
    check("https://bucket.s3.other-region.amazonaws.com/key",
      "s3://bucket/key", "my-region", None, expectOk = false)
    // http downgrade rejected (candidates are https)
    check("http://bucket.s3.my-region.amazonaws.com/key",
      "s3://bucket/key", "my-region", None, expectOk = false)
  }

  test("custom endpoint matrix") {
    check("https://bucket.with.point.s3.my-service.example.com/key",
      "s3://bucket.with.point/key", "my-region",
      Some("https://s3.my-service.example.com"), expectOk = true)
    // endpoint host mismatch
    check("https://bucket.with.point.s3.my-service.example.com/key",
      "s3://bucket.with.point/key", "my-region",
      Some("https://my-service.example.com"), expectOk = false)
    // custom endpoint replaces the AWS candidates entirely
    check("https://bucket.s3.my-region.amazonaws.com/key",
      "s3://bucket/key", "my-region",
      Some("https://s3.my-service.example.com"), expectOk = false)
    // path-style against a custom endpoint (MinIO shape), scheme honored
    check("http://localhost/bucket/key",
      "s3://bucket/key", "my-region", Some("http://localhost:9000"), expectOk = true)
  }

  test("region rule") {
    val p = S3Profile("b", "my-region")
    assert(validateRegion("my-region", p).isRight)
    assert(validateRegion("wrong-region", p).left.exists(_.code === 400))
  }

  test("verb rule: GET/HEAD read, PUT/POST/DELETE write, else 405") {
    assert(methodAccess("GET") === Right(ReadAccess))
    assert(methodAccess("HEAD") === Right(ReadAccess))
    assert(methodAccess("PUT") === Right(WriteAccess))
    assert(methodAccess("POST") === Right(WriteAccess))
    assert(methodAccess("DELETE") === Right(WriteAccess))
    assert(methodAccess("PATCH").left.exists(_.code === 405))
  }

  test("http→s3 location reversal") {
    val cases = Seq(
      "https://foo.endpoint.com/bar/a/key" -> "s3://foo/bar/a/key",
      "https://endpoint/bar/a/key" -> "s3://bar/a/key",
      "http://localhost:9000/bar/a/key" -> "s3://bar/a/key",
      "http://192.168.1.1/bar/a/key" -> "s3://bar/a/key",
      "https://foo.bar.com/key" -> "s3://foo/key")
    for ((uri, expected) <- cases)
      assert(parseS3UrlToLocation(URI.create(uri)) === Right(expected), uri)
  }

  test("partial path decode: %XX decoded, space becomes +, '+' untouched") {
    val out = partiallyDecodePath(
      URI.create("https://bucket.s3.r.amazonaws.com/key/with%20space/a%2Bb/plus+stays"))
      .fold(e => fail(e.message), identity)
    assert(out.getPath === "/key/with+space/a+b/plus+stays")
    // (invalid %-escapes cannot reach this function via java.net.URI —
    // URI.create rejects them at parse time; the 400 branches are
    // defensive for raw-string callers)
  }
}
