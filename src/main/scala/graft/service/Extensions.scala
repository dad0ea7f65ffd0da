package graft.service

import graft.catalog.{CatalogError, TableIdent}
import graft.core.{TableMetadata, TableUpdate}

import java.util.UUID
import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicLong
import scala.jdk.CollectionConverters._

/** Pluggable service extension traits (SURVEY §2.6) — plain Scala
  * shapes of the reference's pluggable surface (service/auth.rs:15-188,
  * service/contract_verification.rs:104-258,
  * service/event_publisher.rs:157-198), re-expressed; DI at server
  * construction mirrors the reference's generic wiring
  * (iceberg-catalog-bin/src/main.rs:72-89).
  */

// ------------------------------------------------------------- authz
/** Operation classes the catalog authorizes. One check per route
  * family; `Right(())` allows, `Left` carries the HTTP error. */
trait AuthZHandler {
  def checkNamespaceOp(wh: UUID, op: String, namespace: Seq[String])
      : Either[CatalogError, Unit]
  def checkTableOp(wh: UUID, op: String, ident: TableIdent): Either[CatalogError, Unit]
  def checkWarehouseOp(projectId: UUID, op: String): Either[CatalogError, Unit]
}

object AuthZHandler {
  /** Default: allow everything (reference AllowAllAuthZHandler). */
  object AllowAll extends AuthZHandler {
    def checkNamespaceOp(wh: UUID, op: String, ns: Seq[String]): Either[CatalogError, Unit] =
      Right(())
    def checkTableOp(wh: UUID, op: String, ident: TableIdent): Either[CatalogError, Unit] =
      Right(())
    def checkWarehouseOp(projectId: UUID, op: String): Either[CatalogError, Unit] =
      Right(())
  }

  private def denied: Either[CatalogError, Unit] =
    Left(CatalogError(403, "Forbidden", "not authorized"))

  /** Deny catalog-surface operations (management still allowed) — used
    * to prove the wiring actually gates routes. */
  object DenyCatalog extends AuthZHandler {
    def checkNamespaceOp(wh: UUID, op: String, ns: Seq[String]): Either[CatalogError, Unit] =
      denied
    def checkTableOp(wh: UUID, op: String, ident: TableIdent): Either[CatalogError, Unit] =
      denied
    def checkWarehouseOp(projectId: UUID, op: String): Either[CatalogError, Unit] =
      Right(())
  }
}

// -------------------------------------------------------------- authn
/** An authenticated caller (reference `UserID`, service/auth.rs). */
final case class Principal(subject: String, claims: Map[String, String] = Map.empty)

/** Bearer-token verification middleware contract (reference
  * service/token_verification.rs:46-75 — JWKS/OIDC verification mounted
  * ahead of every route when configured). `Right(principal)` admits the
  * request; `Left` is returned verbatim as the HTTP error. */
trait TokenVerifier {
  def verify(bearer: Option[String]): Either[CatalogError, Principal]
}

object TokenVerifier {
  /** Default: no authentication mounted (the reference's behavior when
    * no OIDC provider is configured). */
  object AllowAnonymous extends TokenVerifier {
    def verify(bearer: Option[String]): Either[CatalogError, Principal] =
      Right(Principal("anonymous"))
  }

  private def unauthorized(msg: String): Either[CatalogError, Principal] =
    Left(CatalogError(401, "Unauthorized", msg))

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** The claim checks every JWT verifier shares after its signature
    * check: `exp` in the future, `iss` matching, non-empty `sub`. */
  private def checkClaims(
      payloadB64: String, issuer: String, clock: () => Long)
      : Either[CatalogError, Principal] = {
    val payload =
      try mapper.readTree(java.util.Base64.getUrlDecoder.decode(payloadB64))
      catch { case _: Exception => return unauthorized("malformed token") }
    val exp = Option(payload.get("exp")).map(_.asLong(0L)).getOrElse(0L)
    val iss = Option(payload.get("iss")).map(_.asText("")).getOrElse("")
    val sub = Option(payload.get("sub")).map(_.asText("")).getOrElse("")
    if (exp * 1000L <= clock()) unauthorized("token expired")
    else if (iss != issuer) unauthorized(s"unknown issuer: $iss")
    else if (sub.isEmpty) unauthorized("token has no subject")
    else Right(Principal(sub))
  }

  /** HS256 JWT verification — the shared-secret sibling of
    * [[RsaJwtVerifier]] (same decode / signature / claim pipeline with
    * an HMAC in place of the RSA signature). */
  final class HmacJwtVerifier(secret: Array[Byte], issuer: String,
      clock: () => Long = () => System.currentTimeMillis()) extends TokenVerifier {

    def verify(bearer: Option[String]): Either[CatalogError, Principal] =
      bearer match {
        case None => unauthorized("missing bearer token")
        case Some(token) =>
          token.split('.') match {
            case Array(h, p, sig) =>
              if (!checkSignature(s"$h.$p", sig)) unauthorized("invalid signature")
              else checkClaims(p, issuer, clock)
            case _ => unauthorized("malformed token")
          }
      }

    private def checkSignature(signingInput: String, sigB64: String): Boolean = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(secret, "HmacSHA256"))
      val expected = mac.doFinal(
        signingInput.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
      val got =
        try java.util.Base64.getUrlDecoder.decode(sigB64)
        catch { case _: IllegalArgumentException => return false }
      java.security.MessageDigest.isEqual(expected, got)
    }
  }

  /** RS256/JWKS JWT verification — the reference's actual OIDC shape
    * (token_verification.rs:46-75): the token header's `kid` selects a
    * public key from the JWKS, the RSA-SHA256 signature is verified
    * with `java.security.Signature`, then the standard claims. The key
    * set is INJECTED (an offline JWKS snapshot) instead of fetched —
    * this zero-egress environment can't hit an issuer's
    * `/.well-known/jwks.json`, and rotation is modeled the same way it
    * behaves live: swap the key set, and tokens signed by a
    * rotated-out `kid` fail 401. */
  final class RsaJwtVerifier(
      keys: Map[String, java.security.interfaces.RSAPublicKey],
      issuer: String,
      clock: () => Long = () => System.currentTimeMillis()) extends TokenVerifier {

    def verify(bearer: Option[String]): Either[CatalogError, Principal] =
      bearer match {
        case None => unauthorized("missing bearer token")
        case Some(token) =>
          token.split('.') match {
            case Array(h, p, sig) =>
              val header =
                try mapper.readTree(java.util.Base64.getUrlDecoder.decode(h))
                catch { case _: Exception => return unauthorized("malformed token") }
              val alg = Option(header.get("alg")).map(_.asText("")).getOrElse("")
              // pinning the algorithm to the key type kills the classic
              // alg-confusion downgrade (an HS256 token MAC'd with the
              // public key bytes must not verify)
              if (alg != "RS256") unauthorized(s"unsupported alg: $alg")
              else Option(header.get("kid")).map(_.asText) match {
                case None => unauthorized("token has no kid")
                case Some(kid) => keys.get(kid) match {
                  case None => unauthorized(s"unknown signing key: $kid")
                  case Some(key) =>
                    if (!checkSignature(key, s"$h.$p", sig))
                      unauthorized("invalid signature")
                    else checkClaims(p, issuer, clock)
                }
              }
            case _ => unauthorized("malformed token")
          }
      }

    private def checkSignature(
        key: java.security.interfaces.RSAPublicKey,
        signingInput: String, sigB64: String): Boolean = {
      val got =
        try java.util.Base64.getUrlDecoder.decode(sigB64)
        catch { case _: IllegalArgumentException => return false }
      try {
        val s = java.security.Signature.getInstance("SHA256withRSA")
        s.initVerify(key)
        s.update(signingInput.getBytes(java.nio.charset.StandardCharsets.US_ASCII))
        s.verify(got)
      } catch { case _: java.security.GeneralSecurityException => false }
    }
  }

  /** Test/demo helper: mint an RS256 JWT the [[RsaJwtVerifier]]
    * accepts (the issuer side of the offline JWKS pair). */
  def signRs256(priv: java.security.PrivateKey, kid: String, issuer: String,
      subject: String, expEpochSec: Long): String = {
    val enc = java.util.Base64.getUrlEncoder.withoutPadding()
    def b64(s: String) = enc.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = b64(s"""{"alg":"RS256","typ":"JWT","kid":"$kid"}""")
    val p = b64(s"""{"sub":"$subject","iss":"$issuer","exp":$expEpochSec}""")
    val s = java.security.Signature.getInstance("SHA256withRSA")
    s.initSign(priv)
    s.update(s"$h.$p".getBytes(java.nio.charset.StandardCharsets.US_ASCII))
    s"$h.$p.${enc.encodeToString(s.sign())}"
  }

  /** Test/demo helper: mint an HS256 JWT the [[HmacJwtVerifier]]
    * accepts. */
  def signHs256(secret: Array[Byte], issuer: String, subject: String,
      expEpochSec: Long): String = {
    val enc = java.util.Base64.getUrlEncoder.withoutPadding()
    def b64(s: String) = enc.encodeToString(
      s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val h = b64("""{"alg":"HS256","typ":"JWT"}""")
    val p = b64(s"""{"sub":"$subject","iss":"$issuer","exp":$expEpochSec}""")
    val mac = javax.crypto.Mac.getInstance("HmacSHA256")
    mac.init(new javax.crypto.spec.SecretKeySpec(secret, "HmacSHA256"))
    val sig = enc.encodeToString(mac.doFinal(
      s"$h.$p".getBytes(java.nio.charset.StandardCharsets.US_ASCII)))
    s"$h.$p.$sig"
  }
}

/** Reference `AuthConfigHandler` (service/auth.rs:200-249): contributes
  * auth-related entries to the GET /config response so clients learn
  * how to authenticate (token endpoint, client id, ...). */
trait AuthConfigHandler {
  def authConfig(warehouseId: UUID): Map[String, String]
}

object AuthConfigHandler {
  /** No auth advertised (reference default without OIDC). */
  object None extends AuthConfigHandler {
    def authConfig(warehouseId: UUID): Map[String, String] = Map.empty
  }

  /** Static config entries (the OIDC case: token endpoint etc.). */
  final case class Static(entries: Map[String, String]) extends AuthConfigHandler {
    def authConfig(warehouseId: UUID): Map[String, String] = entries
  }
}

// --------------------------------------------------- contract checks
sealed trait ContractOutcome
object ContractOutcome {
  case object Clear extends ContractOutcome
  final case class Violation(errorType: String, message: String) extends ContractOutcome
}

/** External contract verification on table evolution (e.g. schema
  * registries vetoing breaking changes). */
trait ContractVerifier {
  def name: String
  def checkCommit(updates: Seq[TableUpdate], current: TableMetadata): ContractOutcome
  def checkDrop(tableId: UUID): ContractOutcome = ContractOutcome.Clear
  def checkRename(source: TableIdent, destination: TableIdent): ContractOutcome =
    ContractOutcome.Clear
}

/** Verifier chain: first Violation short-circuits (reference chain
  * behavior) and surfaces as 409 ContractViolation. */
final class ContractVerifiers(chain: Seq[ContractVerifier]) {
  private def run(f: ContractVerifier => ContractOutcome): Either[CatalogError, Unit] = {
    for (v <- chain) f(v) match {
      case ContractOutcome.Clear =>
      case ContractOutcome.Violation(tpe, msg) =>
        return Left(CatalogError(409, tpe, s"[${v.name}] $msg"))
    }
    Right(())
  }
  def checkCommit(updates: Seq[TableUpdate], current: TableMetadata): Either[CatalogError, Unit] =
    run(_.checkCommit(updates, current))
  def checkDrop(tableId: UUID): Either[CatalogError, Unit] = run(_.checkDrop(tableId))
  def checkRename(source: TableIdent, destination: TableIdent): Either[CatalogError, Unit] =
    run(_.checkRename(source, destination))
}

object ContractVerifiers {
  val Empty = new ContractVerifiers(Nil)
  def apply(chain: ContractVerifier*): ContractVerifiers = new ContractVerifiers(chain)
}

// ------------------------------------------------------ change events
/** Catalog change event (CloudEvents-shaped payload; reference emits
  * createTable/updateTable/dropTable/renameTable). */
final case class CatalogEvent(
    eventType: String,
    warehouseId: UUID,
    ident: TableIdent,
    tableId: UUID,
    sequenceNumber: Long,
    timestampMs: Long)

trait CloudEventBackend {
  def publish(event: CatalogEvent): Unit
}

object CloudEventBackend {
  /** Default sink: drop (reference default wiring publishes to tracing
    * only). */
  object Noop extends CloudEventBackend {
    def publish(event: CatalogEvent): Unit = ()
  }

  /** Test backend: collects events in order. */
  final class Collecting extends CloudEventBackend {
    private val buf = new java.util.concurrent.ConcurrentLinkedQueue[CatalogEvent]()
    def publish(event: CatalogEvent): Unit = buf.add(event)
    def events: Seq[CatalogEvent] = buf.toArray(Array.empty[CatalogEvent]).toSeq
  }

  /** Durable sink: one JSON line per event appended to a local file
    * (the at-most-once stand-in for the reference's NATS backend,
    * event_publisher.rs:157-198 — delivery semantics are identical:
    * the publisher's bounded queue drops on overflow, a publish
    * failure here logs-and-drops upstream, and whatever was published
    * survives process restarts). Thread-safe; flushed per event so a
    * crash loses at most the in-flight line. */
  final class FileBacked(path: java.nio.file.Path)
      extends CloudEventBackend with AutoCloseable {
    private val out = java.nio.file.Files.newBufferedWriter(
      path, java.nio.charset.StandardCharsets.UTF_8,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
    def publish(event: CatalogEvent): Unit = synchronized {
      out.write(FileBacked.toJson(event)); out.newLine(); out.flush()
    }
    def close(): Unit = synchronized(out.close())
  }

  object FileBacked {
    private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

    private[service] def toJson(e: CatalogEvent): String = {
      val o = mapper.createObjectNode()
      o.put("event-type", e.eventType)
      o.put("warehouse-id", e.warehouseId.toString)
      val ns = o.putArray("namespace")
      e.ident.namespace.foreach(ns.add)
      o.put("name", e.ident.name)
      o.put("table-id", e.tableId.toString)
      o.put("sequence-number", e.sequenceNumber)
      o.put("timestamp-ms", e.timestampMs)
      mapper.writeValueAsString(o)
    }

    /** Replay a sink file (consumer side / tests). */
    def readAll(path: java.nio.file.Path): Seq[CatalogEvent] = {
      if (!java.nio.file.Files.exists(path)) return Nil
      java.nio.file.Files.readAllLines(path).asScala.toSeq
        .filter(_.nonEmpty).map { line =>
          val n = mapper.readTree(line)
          CatalogEvent(
            n.get("event-type").asText(),
            UUID.fromString(n.get("warehouse-id").asText()),
            TableIdent(
              n.get("namespace").elements().asScala.map(_.asText()).toSeq,
              n.get("name").asText()),
            UUID.fromString(n.get("table-id").asText()),
            n.get("sequence-number").asLong(),
            n.get("timestamp-ms").asLong())
        }
    }
  }
}

/** Bounded async publisher: the commit path never blocks on the event
  * sink — a full queue drops the event after a short offer timeout and
  * logs, exactly the reference's fire-and-forget contract (1000-slot
  * channel, 50 ms enqueue timeout, event_publisher.rs:16-53). */
final class QueueingEventPublisher(
    backend: CloudEventBackend,
    capacity: Int = 1000,
    enqueueTimeoutMs: Long = 50) extends AutoCloseable {

  private val queue = new ArrayBlockingQueue[CatalogEvent](capacity)
  private val seq = new AtomicLong(0)
  @volatile private var running = true

  private val worker = new Thread(() => {
    while (running || !queue.isEmpty) {
      val e = queue.poll(20, TimeUnit.MILLISECONDS)
      if (e != null)
        try backend.publish(e)
        catch { case ex: Exception =>
          System.err.println(s"[graft-events] backend failed: ${ex.getMessage}")
        }
    }
  }, "graft-event-publisher")
  worker.setDaemon(true)
  worker.start()

  def nextSequenceNumber(): Long = seq.incrementAndGet()

  /** Fire-and-forget: drops with a log line when the queue stays full
    * past the timeout. */
  def emit(event: CatalogEvent): Unit =
    if (!queue.offer(event, enqueueTimeoutMs, TimeUnit.MILLISECONDS))
      System.err.println(
        s"[graft-events] queue full, dropping ${event.eventType} for ${event.ident.name}")

  def close(): Unit = { running = false; worker.join(2000) }
}
