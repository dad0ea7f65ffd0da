package graft.server

import java.net.URI
import java.nio.charset.StandardCharsets.UTF_8
import java.security.MessageDigest
import java.time.ZoneOffset
import java.time.format.DateTimeFormatter
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** AWS Signature Version 4 (pure JDK crypto; implemented from the
  * public AWS SigV4 specification — canonical request → string-to-sign
  * → derived key HMAC chain). Deterministic given the timestamp, so the
  * known public test vector pins correctness in SigV4Spec.
  */
object SigV4 {

  final case class Signed(
      authorization: String,
      signedHeaders: Map[String, Seq[String]])

  private val AmzDateFmt =
    DateTimeFormatter.ofPattern("yyyyMMdd'T'HHmmss'Z'").withZone(ZoneOffset.UTC)

  def sha256Hex(data: Array[Byte]): String =
    MessageDigest.getInstance("SHA-256").digest(data).map(b => f"$b%02x").mkString
  def sha256Hex(s: String): String = sha256Hex(s.getBytes(UTF_8))
  val EmptyPayloadHash: String = sha256Hex("")

  private def hmac(key: Array[Byte], data: String): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data.getBytes(UTF_8))
  }

  /** AWS uri-encode: unreserved chars pass, everything else %XX
    * (uppercase hex); '/' is encoded unless `keepSlash`. */
  def awsEncode(s: String, keepSlash: Boolean = false): String = {
    val sb = new StringBuilder
    for (b <- s.getBytes(UTF_8)) {
      val c = (b & 0xff).toChar
      val unreserved = (c >= 'A' && c <= 'Z') || (c >= 'a' && c <= 'z') ||
        (c >= '0' && c <= '9') || c == '-' || c == '.' || c == '_' || c == '~'
      if (unreserved || (keepSlash && c == '/')) sb.append(c)
      else sb.append(f"%%${b & 0xff}%02X")
    }
    sb.toString
  }

  /** Sign a request. `headers` must already contain every header to be
    * signed (including Host); x-amz-date is added from `timestamp` if
    * absent. Returns the Authorization header plus the headers that
    * participated in signing (with x-amz-date added).
    */
  def sign(
      method: String,
      uri: URI,
      headers: Map[String, Seq[String]],
      payloadHash: String,
      accessKeyId: String,
      secretAccessKey: String,
      region: String,
      service: String,
      timestamp: java.time.Instant): Signed = {

    val amzDate = AmzDateFmt.format(timestamp)
    val dateStamp = amzDate.substring(0, 8)

    val allHeaders: Map[String, Seq[String]] = {
      val lower = headers.map { case (k, v) => k.toLowerCase -> v }
      if (lower.contains("x-amz-date")) lower
      else lower + ("x-amz-date" -> Seq(amzDate))
    }

    // canonical path: raw path segments are already percent-encoded by
    // the URI; AWS expects single-encoding of each segment's decoded
    // form — we re-encode the RAW path preserving slashes (S3 style:
    // no path normalization, single encode)
    val canonicalPath = {
      val p = Option(uri.getRawPath).filter(_.nonEmpty).getOrElse("/")
      // segments are kept as transmitted; encode characters AWS
      // requires that URI leaves bare (e.g. '+', '=')
      p.split("/", -1).map(seg => awsEncode(rawDecodePreserve(seg))).mkString("/")
    }

    val canonicalQuery = Option(uri.getRawQuery).getOrElse("") match {
      case "" => ""
      case q =>
        q.split("&").filter(_.nonEmpty).map { kv =>
          val Array(k, v) = (kv.split("=", 2) ++ Array("")).take(2)
          (awsEncode(plusAwareDecode(k)), awsEncode(plusAwareDecode(v)))
        }.sortBy(identity).map { case (k, v) => s"$k=$v" }.mkString("&")
    }

    val sortedHeaders = allHeaders.toSeq.sortBy(_._1)
    val canonicalHeaders = sortedHeaders
      .map { case (k, vs) => s"$k:${vs.map(_.trim.replaceAll("\\s+", " ")).mkString(",")}\n" }
      .mkString
    val signedHeaderNames = sortedHeaders.map(_._1).mkString(";")

    val canonicalRequest =
      s"$method\n$canonicalPath\n$canonicalQuery\n$canonicalHeaders\n$signedHeaderNames\n$payloadHash"

    val scope = s"$dateStamp/$region/$service/aws4_request"
    val stringToSign =
      s"AWS4-HMAC-SHA256\n$amzDate\n$scope\n${sha256Hex(canonicalRequest)}"

    val kDate = hmac(s"AWS4$secretAccessKey".getBytes(UTF_8), dateStamp)
    val kRegion = hmac(kDate, region)
    val kService = hmac(kRegion, service)
    val kSigning = hmac(kService, "aws4_request")
    val signature = hmac(kSigning, stringToSign).map(b => f"$b%02x").mkString

    val authorization =
      s"AWS4-HMAC-SHA256 Credential=$accessKeyId/$scope, " +
        s"SignedHeaders=$signedHeaderNames, Signature=$signature"
    Signed(authorization, allHeaders)
  }

  /** Decode %XX escapes of a raw path segment so awsEncode single-
    * encodes; literal '+' is preserved (S3 object-key convention). */
  private def rawDecodePreserve(seg: String): String = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < seg.length) {
      val c = seg.charAt(i)
      if (c == '%' && i + 3 <= seg.length) {
        out.write(Integer.parseInt(seg.substring(i + 1, i + 3), 16)); i += 3
      } else { out.write(c.toString.getBytes(UTF_8)); i += 1 }
    }
    new String(out.toByteArray, UTF_8)
  }

  private def plusAwareDecode(s: String): String = rawDecodePreserve(s)
}
