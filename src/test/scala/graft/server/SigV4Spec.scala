package graft.server

import org.scalatest.funsuite.AnyFunSuite

import java.net.URI
import java.time.Instant

/** Pins the implementation to the PUBLIC AWS SigV4 reference vector
  * (the documented GET iam.amazonaws.com ListUsers example with the
  * published example credentials). Any canonicalization drift breaks
  * this signature. */
class SigV4Spec extends AnyFunSuite {

  test("reproduces the published AWS SigV4 test vector") {
    val signed = SigV4.sign(
      method = "GET",
      uri = URI.create("https://iam.amazonaws.com/?Action=ListUsers&Version=2010-05-08"),
      headers = Map(
        "Host" -> Seq("iam.amazonaws.com"),
        "Content-Type" -> Seq("application/x-www-form-urlencoded; charset=utf-8"),
        "X-Amz-Date" -> Seq("20150830T123600Z")),
      payloadHash = SigV4.EmptyPayloadHash,
      accessKeyId = "AKIDEXAMPLE",
      secretAccessKey = "wJalrXUtnFEMI/K7MDENG+bPxRfiCYEXAMPLEKEY",
      region = "us-east-1",
      service = "iam",
      timestamp = Instant.parse("2015-08-30T12:36:00Z"))

    assert(signed.authorization ===
      "AWS4-HMAC-SHA256 Credential=AKIDEXAMPLE/20150830/us-east-1/iam/aws4_request, " +
        "SignedHeaders=content-type;host;x-amz-date, " +
        "Signature=5d672d79c15b13162d9279b0855cfba6789a8edb4c82c400e06b5924a6f2b5d7")
  }

  test("signature is deterministic and header-order independent") {
    def go(headers: Map[String, Seq[String]]) = SigV4.sign(
      "PUT", URI.create("https://bucket.s3.eu-central-1.amazonaws.com/key/file.parquet"),
      headers, "UNSIGNED-PAYLOAD", "AK", "SK", "eu-central-1", "s3",
      Instant.parse("2026-01-01T00:00:00Z"))
    val a = go(Map("Host" -> Seq("bucket.s3.eu-central-1.amazonaws.com"),
      "Content-Length" -> Seq("42")))
    val b = go(Map("content-length" -> Seq("42"),
      "host" -> Seq("bucket.s3.eu-central-1.amazonaws.com")))
    assert(a.authorization === b.authorization)
    assert(a.signedHeaders("x-amz-date") === Seq("20260101T000000Z"))
  }
}
