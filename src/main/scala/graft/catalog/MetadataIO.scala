package graft.catalog

import graft.core.{JsonCodecs, TableMetadata}

import java.io.{BufferedInputStream, BufferedOutputStream}
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths}
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

/** Gzip'd `*.gz.metadata.json` file I/O (the Iceberg-standard mirror the
  * reference writes next to the authoritative store row,
  * /root/reference/crates/iceberg-catalog/src/catalog/io.rs:7-85).
  * Local-FS locations only (`file:` URIs or bare paths) — an S3 FileIO
  * backend slots in behind the same two calls.
  */
object MetadataIO {

  def toPath(location: String): Path =
    if (location.startsWith("file:")) Paths.get(java.net.URI.create(location))
    else Paths.get(location)

  /** Only `file:`/bare-path locations are writable here; for object
    * stores (s3://…) the authoritative copy is the store row and the
    * mirror write is the FileIO backend's job — no-op locally. */
  def isLocal(location: String): Boolean =
    location.startsWith("file:") || !location.contains("://")

  def write(location: String, metadata: TableMetadata): Unit = {
    if (!isLocal(location)) return
    val path = toPath(location)
    Files.createDirectories(path.getParent)
    val out = new GZIPOutputStream(
      new BufferedOutputStream(Files.newOutputStream(path)))
    try out.write(JsonCodecs.metadataToJson(metadata).getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def read(location: String): Either[String, TableMetadata] = {
    val path = toPath(location)
    if (!Files.exists(path)) Left(s"metadata file not found: $location")
    else {
      val in = new GZIPInputStream(new BufferedInputStream(Files.newInputStream(path)))
      try JsonCodecs.metadataFromJson(
        new String(in.readAllBytes(), StandardCharsets.UTF_8))
      finally in.close()
    }
  }
}
