package graft.catalog

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

/** Object-store seam for the METADATA plane — table metadata JSON,
  * manifest lists/shards, and their Iceberg-spec avro twins (the same
  * byte-addressed surface the reference's FileIO trait covers,
  * /root/reference/crates/iceberg-catalog/src/catalog/io.rs:7-85 and
  * the storage profile probe in storage/s3.rs:438-487).
  *
  * Every metadata read/write in the engine resolves its backend from
  * the location's URI scheme at the call site ([[FileIO.forLocation]]):
  * `file:`/bare paths hit [[LocalFileIO]]; any other scheme must have a
  * registered backend — an S3 implementation slots in by registering
  * `"s3"` once at startup (on a cluster: in an executor plugin, since
  * manifest shards are parsed executor-side by the distributed metadata
  * tables). [[InMemoryFileIO]] is the test stand-in with object-store
  * semantics: a flat key→bytes namespace, no directories, no rename —
  * code that round-trips through it provably makes no local-filesystem
  * assumptions.
  *
  * The DATA plane (parquet files) deliberately does NOT route through
  * this trait: data files are written and scanned by Spark's own file
  * source, whose Hadoop filesystem layer already speaks object stores.
  *
  * Unregistered-scheme POLICY (one rule per direction, applied
  * everywhere): CONTENT writes — manifests, the bytes a commit's
  * snapshot will point at — resolve via [[FileIO.forLocation]] and
  * THROW, because silently dropping them would corrupt the table.
  * MIRROR writes (the gzip metadata.json copy, [[MetadataIO.write]])
  * SKIP — the catalog store row is authoritative, the file is a
  * convenience copy (reference behavior until a storage profile is
  * configured). READS split by what the bytes MEAN: mirror reads go
  * through [[FileIO.readBytes]]/[[FileIO.readString]] and DEGRADE to
  * absent (the store row is authoritative), but CONTENT reads — bytes a
  * committed snapshot points at, i.e. manifest lists/shards — go
  * through [[FileIO.readContentBytes]] and THROW on an unregistered
  * scheme: a driver or executor missing its backend registration must
  * fail loudly, not read the table as silently empty (the reference
  * errors when a storage profile is unresolvable). Both degrade to None
  * only for a genuinely ABSENT object.
  */
trait FileIO {
  /** Create-or-replace the object at `location` (object-store PUT —
    * atomicity is per-object, there is no append). */
  def write(location: String, bytes: Array[Byte]): Unit

  /** Full object content, or None when absent. */
  def read(location: String): Option[Array[Byte]]

  /** Existence probe. NOTE for remote impls: this default is a full
    * GET — override with a HEAD request. Engine hot paths avoid
    * exists+read double round trips by calling [[read]] once and
    * branching on None. */
  def exists(location: String): Boolean = read(location).isDefined

  /** Object size in bytes, or None when absent (HEAD, not GET — local
    * and remote impls answer without fetching content). */
  def size(location: String): Option[Long]

  def delete(location: String): Unit

  /** All object locations under `prefix`, lazily, in lexicographic
    * order (object-store LIST). STREAMING contract: remote impls yield
    * page by page (S3 ListObjectsV2 pages are already in ascending key
    * order), so a consumer that processes-and-drops never holds more
    * than one page — at 10⁷ objects the listing must not materialize. */
  def list(prefix: String): Iterator[String]

  /** One-level listing under `prefix`, split at the next '/': the
    * sub-prefixes ("directories") and the direct-child objects — the
    * S3 `delimiter=/` shape. Lets a distributed consumer fan a deep
    * tree out across tasks by sub-prefix instead of paging the whole
    * tree through one JVM. Default derives from [[list]] (correct
    * everywhere, not cheaper); remote impls override with a real
    * delimiter request so only the shard names cross the wire. */
  def listDir(prefix: String): FileIO.DirListing = {
    val subs = scala.collection.mutable.SortedSet.empty[String]
    val objs = Seq.newBuilder[String]
    list(prefix).foreach { p =>
      val rest = p.stripPrefix(prefix)
      val i = rest.indexOf('/')
      if (i < 0) objs += p else subs += prefix + rest.substring(0, i + 1)
    }
    FileIO.DirListing(subs.toSeq, objs.result())
  }

  /** Last-modified epoch millis, or None when absent/unknown. Unknown
    * is SAFE-side for consumers like the orphan sweep: a file whose
    * age can't be established is never deleted. */
  def modifiedAt(location: String): Option[Long] = None
}

/** `file:` URIs and bare paths via java.nio. Parent directories are
  * created on write (object stores have no directories; local FS needs
  * them). */
object LocalFileIO extends FileIO {
  def toPath(location: String): Path =
    if (location.startsWith("file:")) Paths.get(java.net.URI.create(location))
    else Paths.get(location)

  override def write(location: String, bytes: Array[Byte]): Unit = {
    val p = toPath(location)
    Option(p.getParent).foreach(Files.createDirectories(_))
    Files.write(p, bytes)
  }

  override def read(location: String): Option[Array[Byte]] = {
    val p = toPath(location)
    if (Files.exists(p)) Some(Files.readAllBytes(p)) else None
  }

  override def exists(location: String): Boolean = Files.exists(toPath(location))

  override def size(location: String): Option[Long] = {
    val p = toPath(location)
    if (Files.exists(p)) Some(Files.size(p)) else None
  }

  override def delete(location: String): Unit =
    Files.deleteIfExists(toPath(location))

  override def modifiedAt(location: String): Option[Long] = {
    val p = toPath(location)
    if (Files.exists(p)) Some(Files.getLastModifiedTime(p).toMillis) else None
  }

  override def list(prefix: String): Iterator[String] = {
    // walk the DEEPEST existing directory of the prefix (a prefix that
    // names a directory walks it directly, not its parent tree), and
    // return locations in the caller's form (file: URI vs bare path).
    // Local walks materialize to sort; the streaming contract matters
    // for the REMOTE impls (S3 pages arrive pre-sorted).
    val isUri = prefix.startsWith("file:")
    val p = toPath(prefix)
    val dir = if (Files.isDirectory(p)) p else p.getParent
    if (dir == null || !Files.isDirectory(dir)) Iterator.empty
    else {
      val stream = Files.walk(dir)
      try stream.iterator().asScala
        .filter(Files.isRegularFile(_))
        .filter(_.toString.startsWith(p.toString))
        .map(f => if (isUri) f.toUri.toString else f.toString)
        .toSeq.sorted.iterator
      finally stream.close()
    }
  }

  /** One directory level via `Files.list` — never walks the subtree. */
  override def listDir(prefix: String): FileIO.DirListing = {
    val isUri = prefix.startsWith("file:")
    val p = toPath(prefix)
    val dir = if (Files.isDirectory(p)) p else p.getParent
    if (dir == null || !Files.isDirectory(dir)) return FileIO.DirListing(Nil, Nil)
    val stream = Files.list(dir)
    try {
      val (dirs, files) = stream.iterator().asScala
        .filter(_.toString.startsWith(p.toString))
        .partition(Files.isDirectory(_))
      FileIO.DirListing(
        dirs.map(d => (if (isUri) d.toUri.toString else d.toString + "/")).toSeq.sorted,
        files.filter(Files.isRegularFile(_))
          .map(f => if (isUri) f.toUri.toString else f.toString).toSeq.sorted)
    } finally stream.close()
  }
}

/** Flat key→bytes store with S3-like semantics (PUT/GET/HEAD/DELETE,
  * no directories, no partial writes visible). Used by specs to prove
  * the metadata plane never touches the local filesystem — and, via
  * the per-operation counters, to pin I/O complexity (e.g. the orphan
  * sweep reads each distinct manifest shard ONCE, not once per
  * snapshot). */
final class InMemoryFileIO extends FileIO {
  private val objects = TrieMap.empty[String, Array[Byte]]
  private val mtimes = TrieMap.empty[String, Long]

  /** Op counters (GET / LIST / DELETE / mtime HEAD) for complexity
    * assertions in specs. */
  val reads = new java.util.concurrent.atomic.AtomicLong(0)
  val lists = new java.util.concurrent.atomic.AtomicLong(0)
  val deletes = new java.util.concurrent.atomic.AtomicLong(0)
  val mtimeProbes = new java.util.concurrent.atomic.AtomicLong(0)
  /** Delimiter (one-level) listings — the cheap fan-out probe. */
  val dirLists = new java.util.concurrent.atomic.AtomicLong(0)
  /** Largest key count any single [[list]] call matched — specs pin
    * "no task pages the whole tree" as listKeysMax ≪ total objects. */
  val listKeysMax = new java.util.concurrent.atomic.AtomicLong(0)
  def resetCounters(): Unit =
    Seq(reads, lists, deletes, mtimeProbes, dirLists, listKeysMax)
      .foreach(_.set(0L))

  override def write(location: String, bytes: Array[Byte]): Unit = {
    objects.put(location, bytes.clone())
    mtimes.put(location, System.currentTimeMillis())
  }

  override def modifiedAt(location: String): Option[Long] = {
    mtimeProbes.incrementAndGet()
    mtimes.get(location)
  }

  /** Test seam for the sweep's unknown-age keep rule: forget the mtime
    * while keeping the object. */
  def clearMtime(location: String): Unit = mtimes.remove(location)

  /** Test seam for age-based rules: pin an object's mtime. */
  def setMtime(location: String, ms: Long): Unit = mtimes.put(location, ms)

  override def read(location: String): Option[Array[Byte]] = {
    reads.incrementAndGet()
    objects.get(location).map(_.clone())
  }

  override def size(location: String): Option[Long] =
    objects.get(location).map(_.length.toLong)

  override def delete(location: String): Unit = {
    deletes.incrementAndGet()
    objects.remove(location)
  }

  override def list(prefix: String): Iterator[String] = {
    lists.incrementAndGet()
    val matched = objects.keys.filter(_.startsWith(prefix)).toSeq.sorted
    listKeysMax.getAndUpdate(m => math.max(m, matched.size.toLong))
    matched.iterator
  }

  /** Emulates S3 `delimiter=/`: answered from the key index without a
    * full-tree [[list]], so it never touches [[listKeysMax]]. */
  override def listDir(prefix: String): FileIO.DirListing = {
    dirLists.incrementAndGet()
    val subs = scala.collection.mutable.SortedSet.empty[String]
    val objs = scala.collection.mutable.SortedSet.empty[String]
    objects.keys.filter(_.startsWith(prefix)).foreach { p =>
      val rest = p.stripPrefix(prefix)
      val i = rest.indexOf('/')
      if (i < 0) objs += p else subs += prefix + rest.substring(0, i + 1)
    }
    FileIO.DirListing(subs.toSeq, objs.toSeq)
  }

  def keys: Seq[String] = objects.keys.toSeq
}

object FileIO {
  /** One level of an object tree: the immediate sub-prefixes (each
    * ending in '/') and the direct-child object locations. */
  final case class DirListing(subPrefixes: Seq[String], objects: Seq[String])

  private val registry = TrieMap.empty[String, FileIO]

  /** Register the backend for a URI scheme (e.g. `"s3"`, `"mem"`).
    * Per-JVM: on a real cluster, register from an executor plugin too.
    * Returns any previously registered backend. */
  def register(scheme: String, io: FileIO): Option[FileIO] =
    registry.put(scheme.toLowerCase, io)

  def unregister(scheme: String): Unit = registry.remove(scheme.toLowerCase)

  private def schemeOf(location: String): Option[String] = {
    val i = location.indexOf("://")
    if (i <= 0) None else Some(location.substring(0, i).toLowerCase)
  }

  /** Backend for a location: bare paths and `file:` → [[LocalFileIO]];
    * other schemes must be registered (same failure mode as the
    * reference when a warehouse lacks a storage profile for its
    * location). */
  def forLocation(location: String): FileIO = schemeOf(location) match {
    case None | Some("file") => LocalFileIO
    case Some(s) => registry.getOrElse(s,
      throw new IllegalStateException(
        s"no FileIO registered for scheme '$s' (location: $location)"))
  }

  /** True when some backend can serve this location. */
  def canHandle(location: String): Boolean = schemeOf(location) match {
    case None | Some("file") => true
    case Some(s) => registry.contains(s)
  }

  /** Live write → read-back → delete round trip under `location` — the
    * storage validation the reference runs at warehouse create/update
    * (storage/s3.rs:438-487). Backend-agnostic: exercises whatever
    * implementation serves the location's scheme. Returns the failure
    * message when the storage is not actually usable. */
  def probe(location: String): Either[String, Unit] = {
    val loc = s"${location.stripSuffix("/")}/.graft/probe-${java.util.UUID.randomUUID()}"
    try {
      val io = forLocation(loc)
      val payload = s"graft-probe-${System.nanoTime()}".getBytes(StandardCharsets.UTF_8)
      io.write(loc, payload)
      val back = io.read(loc)
      io.delete(loc)
      if (back.exists(java.util.Arrays.equals(_, payload))) Right(())
      else Left(s"storage probe read-back mismatch at $location")
    } catch {
      case e: Exception =>
        Left(s"storage validation failed for $location: ${e.getMessage}")
    }
  }

  def writeString(location: String, s: String): Unit =
    forLocation(location).write(location, s.getBytes(StandardCharsets.UTF_8))

  /** Degrading MIRROR read (see trait policy): unregistered schemes and
    * missing objects both answer None, in ONE round trip. For
    * snapshot-referenced content use [[readContentBytes]]. */
  def readBytes(location: String): Option[Array[Byte]] =
    if (!canHandle(location)) None else forLocation(location).read(location)

  def readString(location: String): Option[String] =
    readBytes(location).map(new String(_, StandardCharsets.UTF_8))

  /** CONTENT read for snapshot-referenced objects (manifest lists and
    * shards): an absent object degrades to None, but an unregistered
    * scheme THROWS via [[forLocation]] — a JVM that cannot resolve the
    * backend for a committed snapshot's manifests must not serve the
    * table as empty. */
  def readContentBytes(location: String): Option[Array[Byte]] =
    forLocation(location).read(location)

  def readContentString(location: String): Option[String] =
    readContentBytes(location).map(new String(_, StandardCharsets.UTF_8))
}
