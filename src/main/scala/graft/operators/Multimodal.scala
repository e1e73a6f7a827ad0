package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video as opaque binary columns
  * with typed metadata. The decode/feature-extract step is STUBBED (no
  * image/audio libraries in this container) behind a deterministic fake —
  * the Spark-side contract (schema, batching, partition shape) is real
  * and tested:
  *  - binary payloads are derived deterministically from the text column
  *    (utf-8 bytes), standing in for image bytes;
  *  - `decodeStub` maps binary → fixed-shape feature struct exactly where
  *    a Pandas-UDF / mapInPandas decode would sit on a cluster with the
  *    codec libs installed (signature and batch shape preserved);
  *  - frame-sampling is modeled as byte-range slicing with a stride.
  */
object Multimodal {

  private def docs(s: SparkSession, dir: String): DataFrame =
    s.read.parquet(s"$dir/documents.parquet")

  /** m1: binary ingestion + metadata — payload size, content digest, magic
    * prefix, and a deterministic stub "thumbnail" (first 8 bytes hex).
    * All expressible in any engine (md5 of the utf-8 payload == md5 of the
    * source string). */
  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("payload", encode($"text", "UTF-8")) // stand-in image bytes
      .select(
        $"doc_id",
        octet_length($"payload").cast("long").as("n_bytes"),
        md5($"payload").as("content_digest"),
        lower(hex(encode(substring($"text", 1, 8), "UTF-8"))).as("magic_hex"),
        (octet_length($"payload") / lit(256)).cast("long").as("n_blocks"))
      .orderBy($"doc_id")
  }

  val binaryMetaSql: String =
    """SELECT doc_id,
      |  octet_length(encode(text)) AS n_bytes,
      |  md5(text) AS content_digest,
      |  lower(hex(encode(substring(text, 1, 8)))) AS magic_hex,
      |  octet_length(encode(text)) // 256 AS n_blocks
      |FROM documents ORDER BY doc_id""".stripMargin

  /** m2: frame sampling — every k-th 64-byte "frame" of the payload (the
    * video-frame-sample plumbing: pos ranges are computed in the plan,
    * slicing is codegen'd; a real decoder replaces the digest). */
  def frameSample(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val frameLen = 64
    val stride = 4
    docs(s, dir)
      .withColumn("n_frames",
        greatest((length($"text") / frameLen).cast("int"), lit(1)))
      .select($"doc_id", $"text",
        explode(sequence(lit(0), (($"n_frames" - 1) / stride).cast("int"))).as("i"))
      .select(
        $"doc_id",
        ($"i" * stride).cast("long").as("frame_no"),
        md5(expr(s"substring(text, i * $stride * $frameLen + 1, $frameLen)"))
          .as("frame_digest"))
      .orderBy($"doc_id", $"frame_no")
  }

  val frameSampleSql: String =
    """WITH p AS (
      |  SELECT doc_id, text,
      |    greatest(length(text) // 64, 1) AS n_frames
      |  FROM documents)
      |SELECT doc_id, f.i * 4 AS frame_no,
      |  md5(substring(text, (f.i * 4 * 64 + 1)::INT, 64)) AS frame_digest
      |FROM p, LATERAL (SELECT unnest(generate_series(0, (n_frames - 1) // 4)) AS i) f
      |ORDER BY doc_id, frame_no""".stripMargin

  /** The stub decode seam: binary → fixed-shape feature vector. On a real
    * cluster this body is a Pandas UDF / mapInPandas calling the codec;
    * here it is a deterministic fake (byte histogram moments) with the
    * exact same signature and batch semantics. */
  def decodeStub(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    docs(s, dir)
      .withColumn("payload", encode($"text", "UTF-8"))
      .select($"doc_id",
        // "feature vector": first 4 bytes as ints — stands in for a
        // decoded image embedding; shape is fixed like a real decoder's
        array((1 to 4).map(i =>
          coalesce(ascii(substring($"text", i, 1)).cast("long"), lit(0L))): _*)
          .as("features"))
      .select($"doc_id",
        concat_ws(",", $"features").as("features_csv"))
      .orderBy($"doc_id")
  }

  val decodeStubSql: String =
    """SELECT doc_id,
      |  array_to_string([
      |    coalesce(ascii(substring(text, 1, 1)), 0),
      |    coalesce(ascii(substring(text, 2, 1)), 0),
      |    coalesce(ascii(substring(text, 3, 1)), 0),
      |    coalesce(ascii(substring(text, 4, 1)), 0)], ',') AS features_csv
      |FROM documents ORDER BY doc_id""".stripMargin
}
