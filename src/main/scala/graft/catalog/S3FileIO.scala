package graft.catalog

import graft.server.SigV4

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

/** S3 object-store FileIO: a dependency-free HTTP client speaking the
  * S3 REST API with SigV4 request signing (reusing the server's
  * [[graft.server.SigV4]], already pinned to an AWS public test
  * vector). Slots into the metadata plane via
  * `FileIO.register("s3", new S3FileIO(...))` — on a real cluster,
  * register from an executor plugin too, since manifest shards are
  * parsed executor-side (reference context: the storage profile +
  * credential machinery of storage/s3.rs; this is the client half the
  * reference delegates to opendal).
  *
  * Shapes supported: AWS virtual-host addressing
  * (`https://bucket.s3.region.amazonaws.com/key`) by default; a custom
  * `endpoint` (MinIO, fakes) switches to path-style
  * (`endpoint/bucket/key`). `exists`/`size` are HEAD (never a content
  * GET); `list` pages through ListObjectsV2 continuation tokens.
  *
  * `scheme` is configurable so tests can register an isolated scheme
  * without clobbering a real "s3" registration.
  */
final class S3FileIO(
    accessKeyId: String,
    secretAccessKey: String,
    region: String,
    endpoint: Option[String] = None,
    scheme: String = "s3",
    client: HttpClient = HttpClient.newHttpClient()) extends FileIO {

  private def bucketKey(location: String): (String, String) = {
    val prefix = s"$scheme://"
    require(location.startsWith(prefix), s"not a $scheme location: $location")
    val rest = location.stripPrefix(prefix)
    val i = rest.indexOf('/')
    if (i < 0) (rest, "") else (rest.substring(0, i), rest.substring(i + 1))
  }

  private def uriFor(bucket: String, key: String, query: String = ""): URI = {
    val encKey = key.split("/", -1).map(s => SigV4.awsEncode(s)).mkString("/")
    val base = endpoint match {
      case Some(ep) => s"${ep.stripSuffix("/")}/$bucket/$encKey"
      case None => s"https://$bucket.s3.$region.amazonaws.com/$encKey"
    }
    URI.create(base + (if (query.isEmpty) "" else s"?$query"))
  }

  private def send(
      method: String, uri: URI,
      body: Option[Array[Byte]]): HttpResponse[Array[Byte]] = {
    val payload = body.getOrElse(Array.empty[Byte])
    val payloadHash = SigV4.sha256Hex(payload)
    val host = uri.getHost + (if (uri.getPort > 0) s":${uri.getPort}" else "")
    val signed = SigV4.sign(
      method, uri,
      Map("host" -> Seq(host), "x-amz-content-sha256" -> Seq(payloadHash)),
      payloadHash, accessKeyId, secretAccessKey, region, "s3",
      java.time.Instant.now())
    val b = HttpRequest.newBuilder(uri).method(method,
      body.map(HttpRequest.BodyPublishers.ofByteArray)
        .getOrElse(HttpRequest.BodyPublishers.noBody()))
    // host is set by the client from the URI (restricted header) — the
    // signature covers the same value
    signed.signedHeaders.get("x-amz-date")
      .foreach(v => b.header("x-amz-date", v.head))
    b.header("x-amz-content-sha256", payloadHash)
    b.header("Authorization", signed.authorization)
    client.send(b.build(), HttpResponse.BodyHandlers.ofByteArray())
  }

  private def fail(op: String, location: String, code: Int): Nothing =
    throw new IllegalStateException(s"S3 $op $location failed: HTTP $code")

  override def write(location: String, bytes: Array[Byte]): Unit = {
    val (b, k) = bucketKey(location)
    val r = send("PUT", uriFor(b, k), Some(bytes))
    if (r.statusCode() / 100 != 2) fail("PUT", location, r.statusCode())
  }

  override def read(location: String): Option[Array[Byte]] = {
    val (b, k) = bucketKey(location)
    val r = send("GET", uriFor(b, k), None)
    if (r.statusCode() == 404) None
    else if (r.statusCode() / 100 == 2) Some(r.body())
    else fail("GET", location, r.statusCode())
  }

  /** HEAD — never a content GET. */
  override def exists(location: String): Boolean = {
    val (b, k) = bucketKey(location)
    val r = send("HEAD", uriFor(b, k), None)
    if (r.statusCode() / 100 == 2) true
    else if (r.statusCode() == 404) false
    else fail("HEAD", location, r.statusCode())
  }

  override def size(location: String): Option[Long] = {
    val (b, k) = bucketKey(location)
    val r = send("HEAD", uriFor(b, k), None)
    if (r.statusCode() == 404) None
    else if (r.statusCode() / 100 == 2) {
      // a 2xx without Content-Length is UNKNOWN, not empty
      val len = r.headers().firstValueAsLong("Content-Length")
      if (len.isPresent) Some(len.getAsLong) else None
    } else fail("HEAD", location, r.statusCode())
  }

  override def modifiedAt(location: String): Option[Long] = {
    val (b, k) = bucketKey(location)
    val r = send("HEAD", uriFor(b, k), None)
    if (r.statusCode() / 100 != 2) None
    else {
      val v = r.headers().firstValue("Last-Modified")
      if (!v.isPresent) None
      else
        try Some(java.time.ZonedDateTime.parse(v.get,
          java.time.format.DateTimeFormatter.RFC_1123_DATE_TIME)
          .toInstant.toEpochMilli)
        catch { case _: Exception => None }
    }
  }

  override def delete(location: String): Unit = {
    val (b, k) = bucketKey(location)
    val r = send("DELETE", uriFor(b, k), None)
    if (r.statusCode() / 100 != 2 && r.statusCode() != 404)
      fail("DELETE", location, r.statusCode())
  }

  /** One ListObjectsV2 page: keys (+ CommonPrefixes when a delimiter
    * was sent) and the continuation token for the next page. */
  private def listPage(
      bucket: String, keyPrefix: String,
      token: Option[String], delimiter: Option[String])
      : (Seq[String], Seq[String], Option[String]) = {
    val query = (Seq(
      "list-type=2",
      s"prefix=${SigV4.awsEncode(keyPrefix)}") ++
      delimiter.map(d => s"delimiter=${SigV4.awsEncode(d)}") ++
      token.map(t => s"continuation-token=${SigV4.awsEncode(t)}"))
      .mkString("&")
    val r = send("GET", uriFor(bucket, "", query), None)
    if (r.statusCode() / 100 != 2)
      fail("LIST", s"$scheme://$bucket/$keyPrefix", r.statusCode())
    val doc = S3FileIO.secureXmlFactory.newDocumentBuilder()
      .parse(new java.io.ByteArrayInputStream(r.body()))
    val keys = doc.getElementsByTagName("Key")
    val ks = (0 until keys.getLength)
      .map(i => s"$scheme://$bucket/${keys.item(i).getTextContent}")
    // CommonPrefixes render as <CommonPrefixes><Prefix>…</Prefix></…>
    val cps = doc.getElementsByTagName("CommonPrefixes")
    val ps = (0 until cps.getLength).flatMap { i =>
      val kids = cps.item(i).asInstanceOf[org.w3c.dom.Element]
        .getElementsByTagName("Prefix")
      (0 until kids.getLength)
        .map(j => s"$scheme://$bucket/${kids.item(j).getTextContent}")
    }
    val nt = doc.getElementsByTagName("NextContinuationToken")
    val next = if (nt.getLength > 0) Some(nt.item(0).getTextContent) else None
    (ks, ps, next)
  }

  /** STREAMING listing: one ListObjectsV2 page in memory at a time,
    * fetched on demand. S3 returns keys in ascending UTF-8 order both
    * within and across pages, so the trait's sorted contract holds
    * without materializing. */
  override def list(prefix: String): Iterator[String] = {
    val (bucket, keyPrefix) = bucketKey(prefix)
    new Iterator[String] {
      private var page: Iterator[String] = Iterator.empty
      private var token: Option[String] = None
      private var started = false
      private def advance(): Unit =
        while (!page.hasNext && (!started || token.isDefined)) {
          val (ks, _, next) = listPage(bucket, keyPrefix, token, None)
          started = true; token = next; page = ks.iterator
        }
      def hasNext: Boolean = { advance(); page.hasNext }
      def next(): String = { advance(); page.next() }
    }
  }

  /** Real `delimiter=/` request — only the shard names and the direct
    * children cross the wire, never the subtree. */
  override def listDir(prefix: String): FileIO.DirListing = {
    val (bucket, keyPrefix) = bucketKey(prefix)
    val subs = Seq.newBuilder[String]
    val objs = Seq.newBuilder[String]
    var token: Option[String] = None
    var more = true
    while (more) {
      val (ks, ps, next) = listPage(bucket, keyPrefix, token, Some("/"))
      objs ++= ks; subs ++= ps
      token = next; more = next.isDefined
    }
    FileIO.DirListing(subs.result().sorted, objs.result().sorted)
  }
}


object S3FileIO {
  /** Hardened XML parsing for ListObjectsV2 responses: a custom
    * endpoint (MinIO path) is attacker-controllable input, so DTDs and
    * external entities are disabled — no XXE against the driver or
    * executor JVM. The factory is thread-safe only for configuration;
    * builders are created per parse. */
  private[catalog] def secureXmlFactory: javax.xml.parsers.DocumentBuilderFactory = {
    val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
    f.setFeature(javax.xml.XMLConstants.FEATURE_SECURE_PROCESSING, true)
    f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
    f.setFeature("http://xml.org/sax/features/external-general-entities", false)
    f.setFeature("http://xml.org/sax/features/external-parameter-entities", false)
    f.setXIncludeAware(false)
    f.setExpandEntityReferences(false)
    f
  }
}
