package graft.service

import graft.catalog.{CatalogError, TableIdent}
import graft.core.{TableMetadata, TableUpdate}

import java.util.UUID
import java.util.concurrent.{ArrayBlockingQueue, TimeUnit}
import java.util.concurrent.atomic.AtomicLong

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
