package graft.llm

import graft.Tables.load
import graft.llm.Portable._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Multimodal-column plumbing: treat media as an opaque `binary`
  * payload column with typed metadata, and run the standard pipeline
  * stages — metadata extraction, frame/chunk sampling, decode — as
  * Spark-native columnar operators.
  *
  * The container has no image/audio codecs and the driver testdata has
  * no media files, so the payload is the document's UTF-8 bytes
  * (`cast(text as binary)`) standing in for an opaque blob, and the
  * DECODE STEP IS A CLEARLY-MARKED DETERMINISTIC STUB (see
  * [[qDecodeStub]]): the Spark-side plumbing — binary column handling,
  * frame slicing, schema shapes, per-row derivations — is real and
  * oracle-checked; only the codec math is fake.
  *
  * Scale notes: every operator here is a narrow per-row projection
  * (no shuffle at all except the explode of bounded frame indexes), so
  * the pipeline is embarrassingly parallel over any corpus size; frames
  * explode to ≤ payload/FRAME_BYTES rows with a generator whose child
  * is a cheap integer sequence.
  */
object Multimodal {

  private val FrameBytes = 64
  private val FrameStride = 4 // sample every 4th frame

  /** Binary metadata extraction: byte length, leading magic bytes, and
    * a content checksum — computed from the binary payload column
    * (length/substring/md5 all operate on binary natively in Spark). */
  def qMmMetadata(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr("doc_id", "cast(text as binary) as payload")
      .selectExpr(
        "doc_id",
        "cast(length(payload) as bigint) as num_bytes",
        "hex(substring(payload, 1, 4)) as magic",
        "md5(payload) as checksum")
      .orderBy("doc_id")

  val qMmMetadataSql: String =
    """SELECT doc_id,
      |       octet_length(encode(text))::BIGINT AS num_bytes,
      |       substring(hex(encode(text)), 1, 8) AS magic,
      |       md5(text) AS checksum
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Frame sampling: slice the payload into fixed 64-byte frames, keep
    * every 4th, fingerprint each — the shape of video frame-sampling /
    * audio chunking. Spark slices the real binary column; the oracle
    * compares in the hex domain (DuckDB cannot slice blobs), which is
    * byte-exact because hex(substring(bin)) == substring(hex(bin)). */
  def qMmFrameSample(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr("doc_id", "cast(text as binary) as payload")
      .selectExpr("doc_id", "payload",
        s"explode(filter(sequence(0, cast(ceil(length(payload) / $FrameBytes.0d) as int) - 1), i -> i % $FrameStride = 0)) as frame_no")
      .selectExpr(
        "doc_id", "frame_no",
        s"cast(length(substring(payload, frame_no * $FrameBytes + 1, $FrameBytes)) as bigint) as frame_bytes",
        s"md5(hex(substring(payload, frame_no * $FrameBytes + 1, $FrameBytes))) as frame_fp")
      .orderBy("doc_id", "frame_no")

  val qMmFrameSampleSql: String =
    s"""WITH p AS (
       |  SELECT doc_id, hex(encode(text)) AS hx, octet_length(encode(text)) AS n
       |  FROM documents),
       |frames AS (
       |  SELECT doc_id, unnest(list_filter(range(0, CAST(ceil(n / $FrameBytes.0) AS INT)),
       |                 i -> i % $FrameStride = 0)) AS frame_no, hx
       |  FROM p)
       |SELECT doc_id, CAST(frame_no AS INT) AS frame_no,
       |       (length(substring(hx, frame_no * ${FrameBytes * 2} + 1, ${FrameBytes * 2})) / 2)::BIGINT AS frame_bytes,
       |       md5(substring(hx, frame_no * ${FrameBytes * 2} + 1, ${FrameBytes * 2})) AS frame_fp
       |FROM frames
       |ORDER BY doc_id, frame_no""".stripMargin

  /** ===== STUB DECODE =====
    * A real deployment plugs a codec here (e.g. image decode to
    * height×width×channels); this container has none, so the "decoded"
    * dimensions are a DETERMINISTIC FAKE derived from the content
    * checksum via the portable hash. Everything around the stub — the
    * typed output schema (format/width/height/channels/decoded_bytes),
    * per-row derivation, oracle parity — is the real plumbing a codec
    * UDF would drop into. */
  def qDecodeStub(s: SparkSession, dir: String): DataFrame =
    load(s, dir, "documents")
      .selectExpr("doc_id", "cast(text as binary) as payload")
      .selectExpr("doc_id", "md5(payload) as checksum",
        "cast(length(payload) as bigint) as num_bytes")
      .selectExpr(
        "doc_id",
        "'raw8' as format",
        s"cast(64 + ${hSpark("concat('w|', checksum)")} % 1985 as int) as width",
        s"cast(64 + ${hSpark("concat('h|', checksum)")} % 1985 as int) as height",
        "cast(1 + (num_bytes % 3) as int) as channels")
      .selectExpr("doc_id", "format", "width", "height", "channels",
        "cast(width as bigint) * height * channels as decoded_bytes")
      .orderBy("doc_id")

  val qDecodeStubSql: String = {
    val w = hDuck("('w|' || md5(text))")
    val h = hDuck("('h|' || md5(text))")
    s"""SELECT doc_id,
       |       'raw8' AS format,
       |       CAST(64 + $w % 1985 AS INT) AS width,
       |       CAST(64 + $h % 1985 AS INT) AS height,
       |       CAST(1 + (octet_length(encode(text)) % 3) AS INT) AS channels,
       |       CAST(64 + $w % 1985 AS BIGINT) * (64 + $h % 1985) * (1 + (octet_length(encode(text)) % 3)) AS decoded_bytes
       |FROM documents
       |ORDER BY doc_id""".stripMargin
  }

  // ----------------------------------------------------------- registry
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_mm_metadata" -> (qMmMetadata _),
    "q_mm_frame_sample" -> (qMmFrameSample _),
    "q_mm_decode_stub" -> (qDecodeStub _))

  val oracleSql: Map[String, String] = Map(
    "q_mm_metadata" -> qMmMetadataSql,
    "q_mm_frame_sample" -> qMmFrameSampleSql,
    "q_mm_decode_stub" -> qDecodeStubSql)
}
