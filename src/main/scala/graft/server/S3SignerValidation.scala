package graft.server

import graft.catalog.CatalogError

import java.net.URI

/** Pure validation core of the S3 remote-signing operator (SURVEY §2.4;
  * behavior re-derived from the reference's signer,
  * /root/reference/crates/iceberg-catalog/src/catalog/s3_signer.rs:
  * 300-528, and its unit matrix :530-757 — no code copied).
  *
  * The signer never signs a request whose URI is not provably inside
  * the table's storage location: a miss here either breaks Spark writes
  * (false negative) or signs access to foreign data (false positive).
  * Everything below is side-effect-free and property-testable; the
  * SigV4 HMAC itself is transport wiring layered on top.
  */
object S3SignerValidation {

  final case class S3Profile(
      bucket: String,
      region: String,
      endpoint: Option[String] = None,
      keyPrefix: Option[String] = None)

  /** AWS access-point host prefixes probed when no custom endpoint is
    * configured. */
  private val AwsAccessPoints = Seq("s3", "s3.dualstack", "s3-fips.dualstack", "s3-fips")

  private val ReadMethods = Set("GET", "HEAD")
  private val WriteMethods = Set("PUT", "POST", "DELETE")

  sealed trait Access
  case object ReadAccess extends Access
  case object WriteAccess extends Access

  /** HTTP verb → authz class: reads check load-table rights, writes
    * check commit rights, anything else is 405. */
  def methodAccess(method: String): Either[CatalogError, Access] =
    if (ReadMethods.contains(method)) Right(ReadAccess)
    else if (WriteMethods.contains(method)) Right(WriteAccess)
    else Left(CatalogError(405, "MethodNotAllowed", s"method $method not allowed"))

  /** Request region must equal the storage-profile region. */
  def validateRegion(region: String, profile: S3Profile): Either[CatalogError, Unit] =
    if (region == profile.region) Right(())
    else Left(CatalogError(400, "RegionMismatch",
      "Region does not match storage profile"))

  /** RAW (still percent-encoded) path segments; empty path ⇒ [""]. */
  private def rawSegments(uri: URI): Seq[String] =
    Option(uri.getRawPath).getOrElse("").stripPrefix("/").split("/", -1).toSeq

  /** Validate that `requestUri` addresses exactly the table's location
    * under one of the profile's endpoint candidates, in either S3
    * addressing style:
    *  - virtual-host: https://{bucket}.{endpoint-host}/{key...}
    *  - path-style:   https://{endpoint-host}/{bucket}/{key...}
    * Sub-paths of the table key are allowed (data/metadata files);
    * anything else is 403. */
  def validateUri(
      requestUri: URI,
      tableLocation: String,
      profile: S3Profile): Either[CatalogError, Unit] = {
    val loc = URI.create(tableLocation.reverse.dropWhile(_ == '/').reverse)
    val tableBucket = Option(loc.getHost).getOrElse(
      return Left(CatalogError(500, "TableLocationNoBucket",
        "table location does not have a bucket")))
    val keyVirtualHost = rawSegments(loc)
    val keyPathStyle = tableBucket +: keyVirtualHost
    val requestKey = rawSegments(requestUri)

    val endpointCandidates: Seq[(String, String)] = profile.endpoint match {
      case Some(e) =>
        val eu = URI.create(e)
        val host = Option(eu.getHost).getOrElse(
          return Left(CatalogError(500, "StorageProfileNoHost",
            "storage profile endpoint does not have a host")))
        Seq(eu.getScheme -> host)
      case None =>
        AwsAccessPoints.map(ap => "https" -> s"$ap.${profile.region}.amazonaws.com")
    }

    val scheme = requestUri.getScheme
    val host = Option(requestUri.getHost).getOrElse("")

    val virtualHostMatch = endpointCandidates.exists { case (s, h) =>
      scheme == s && host == s"$tableBucket.$h"
    }
    val pathStyleMatch = endpointCandidates.exists { case (s, h) =>
      scheme == s && host == h
    }

    def prefixed(expected: Seq[String], mismatch: String): Either[CatalogError, Unit] =
      if (requestKey.length >= expected.length &&
        requestKey.take(expected.length) == expected) Right(())
      else Left(CatalogError(403, mismatch,
        "Request URI does not match table location"))

    if (virtualHostMatch) prefixed(keyVirtualHost, "VirtualHostURIMismatch")
    else if (pathStyleMatch) prefixed(keyPathStyle, "PathStyleHostMismatch")
    else Left(CatalogError(403, "RequestUriMismatch",
      "Request URI does not match table location"))
  }

  /** Reverse an https request URI to its `s3://bucket/key` location for
    * lookup-by-location (when the sign request carries no table id):
    * dotted domains are virtual-host style (first label = bucket);
    * single-label domains and IPs are path-style. */
  def parseS3UrlToLocation(uri: URI): Either[CatalogError, String] = {
    val host = Option(uri.getHost).getOrElse(
      return Left(CatalogError(400, "UriNoHost", "URI does not have a host")))
    val path = Option(uri.getRawPath).getOrElse("").stripPrefix("/")
    val isIp = host.matches("""\d+\.\d+\.\d+\.\d+""") || uri.getHost.startsWith("[")
    if (!isIp && host.contains('.')) {
      val bucket = host.split('.').head
      Right(s"s3://$bucket/$path")
    } else Right(s"s3://$path")
  }

  /** Percent-decode each path segment ('+' left untouched, unlike Java's
    * URLDecoder), then re-encode spaces as '+' — the canonical form the
    * SigV4 signer consumes (reference partially_decode_uri behavior). */
  def partiallyDecodePath(uri: URI): Either[CatalogError, URI] = {
    val segs = rawSegments(uri)
    val decoded = segs.map { s =>
      percentDecode(s) match {
        case Right(d) => d.replace(' ', '+')
        case Left(e) => return Left(e)
      }
    }
    val newPath = "/" + decoded.mkString("/")
    Right(new URI(uri.getScheme, uri.getAuthority, newPath, uri.getQuery, uri.getFragment))
  }

  private def percentDecode(s: String): Either[CatalogError, String] = {
    val out = new java.io.ByteArrayOutputStream()
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%') {
        if (i + 3 > s.length)
          return Left(CatalogError(400, "FailedToDecodeURISegment",
            s"truncated percent escape in: $s"))
        val hex = s.substring(i + 1, i + 3)
        try out.write(Integer.parseInt(hex, 16))
        catch { case _: Exception =>
          return Left(CatalogError(400, "FailedToDecodeURISegment",
            s"invalid percent escape %$hex in: $s"))
        }
        i += 3
      } else {
        out.write(c.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        i += 1
      }
    }
    Right(new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
  }
}
