package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Multimodal-column pipeline: image/audio/video payloads travel as
  * opaque BINARY columns with typed metadata; decode / feature-extract
  * runs as a per-partition batch operator.
  *
  * The media codec libraries are not available in this environment, so
  * the decode step is STUBBED with a deterministic surrogate (see
  * [[decodeStub]]); everything Spark-side — schema, partition sizing,
  * batch shape, the mapPartitions feature extractor, and the
  * metadata/feature contract — is real and tested. Swapping the stub
  * for a JNI/FFI decoder keeps the whole pipeline unchanged.
  *
  * Scale notes: payloads dominate row size, so the pipeline
  * repartitions by payload-size-aware salting before extraction
  * (binary columns make default file-split sizing misleading), and
  * features project to a narrow frame early so downstream joins never
  * carry the payload.
  */
object MediaPipeline {

  /** Opaque media payload + typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte],
      width: Int, height: Int, sample_rate: Int)

  /** Narrow feature frame (payload dropped). */
  case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      digest: String, feature: Array[Float])

  /** STUB decoder: a real implementation decodes the payload
    * (image/audio frame) and runs feature extraction. The surrogate is
    * deterministic — md5 digest + a pseudo-feature derived from the
    * digest bytes — so tests and oracles are stable. ??? -> replace
    * with the real codec when available. */
  def decodeStub(payload: Array[Byte]): (String, Array[Float]) = {
    val md = MessageDigest.getInstance("MD5")
    val d = md.digest(payload)
    val hex = d.map("%02x".format(_)).mkString
    val feat = d.take(8).map(b => (b & 0xff) / 255.0f)
    (hex, feat)
  }

  /** Synthesize a media table from the documents corpus (text bytes as
    * the opaque payload) — stands in for a parquet table with real
    * image/audio bytes. */
  def mediaTable(s: SparkSession, dir: String): Dataset[MediaRecord] = {
    import s.implicits._
    Tables.documents(s, dir)
      .select(col("doc_id"), col("text"), col("lang"))
      .as[(Long, String, String)]
      .map { case (id, text, lang) =>
        MediaRecord(id, if (lang == "en") "image" else "audio",
          text.getBytes("UTF-8"), 64, 64, 16000)
      }
  }

  /** Feature extraction: per-partition batches over the payloads. The
    * extractor is pure per record; mapPartitions keeps codec/session
    * setup (the expensive part of a real decoder) per-partition, which
    * is the batch shape a Pandas-UDF/Arrow pipeline uses too. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      // real pipeline: open codec once per partition here
      it.map { m =>
        val (digest, feat) = decodeStub(m.payload)
        MediaFeatures(m.media_id, m.kind, m.payload.length.toLong, digest, feat)
      }
    }
  }

  /** Oracle-checked query: features from the synthesized media table
    * (digest + byte length reproduce in DuckDB; the stub feature vector
    * is engine-internal and excluded). */
  def mediaFeatures(s: SparkSession, dir: String): DataFrame =
    extractFeatures(mediaTable(s, dir))
      .select(col("media_id"), col("kind"), col("byte_len"), col("digest"))
      .orderBy(col("media_id"))

  val mediaFeaturesSql: String =
    """SELECT doc_id AS media_id,
      |  CASE WHEN lang = 'en' THEN 'image' ELSE 'audio' END AS kind,
      |  CAST(strlen(text) AS BIGINT) AS byte_len,
      |  md5(text) AS digest
      |FROM documents ORDER BY media_id""".stripMargin

  /** One sampled frame of a payload: the video/audio batch shape is
    * one input row fanning out to MANY frame rows. */
  case class MediaFrame(media_id: Long, frame_idx: Long, frame_digest: String)

  /** Fixed-stride frame sampling: every `stride` bytes, take a
    * `frameLen`-byte window that fits entirely inside the payload and
    * digest it (a real pipeline would decode + embed the frame; the
    * digest is the deterministic stub). flatMap inside mapPartitions —
    * the fan-out happens executor-side, the payload is read once, and
    * only narrow frame rows leave the operator. */
  def sampleFrames(media: Dataset[MediaRecord], frameLen: Int,
      stride: Int): Dataset[MediaFrame] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { it =>
      val md = MessageDigest.getInstance("MD5")
      it.flatMap { m =>
        val n =
          if (m.payload.length < frameLen) 0
          else (m.payload.length - frameLen) / stride + 1
        (0 until n).iterator.map { i =>
          val frame = java.util.Arrays.copyOfRange(
            m.payload, i * stride, i * stride + frameLen)
          md.reset()
          val hex = md.digest(frame).map("%02x".format(_)).mkString
          MediaFrame(m.media_id, i.toLong, hex)
        }
      }
    }
  }

  /** Oracle-checked frame-sampling query (64-byte frames every 128
    * bytes). The payloads are ASCII text bytes, so DuckDB's character
    * substr reproduces the byte slices exactly. */
  def mediaFrames(s: SparkSession, dir: String): DataFrame =
    sampleFrames(mediaTable(s, dir), 64, 128)
      .toDF()
      .orderBy(col("media_id"), col("frame_idx"))

  /** The per-row `unnest(range(...))` bound is the SAME frame-count
    * formula the operator computes (`(len - 64) / 128 + 1`, zero for
    * payloads shorter than a frame) — no hard cap, so the oracle
    * agrees with the operator for arbitrarily long payloads. The CASE
    * mirrors the Scala guard exactly because DuckDB's `//` truncates
    * toward zero rather than flooring. */
  val mediaFramesSql: String =
    """SELECT media_id, i AS frame_idx,
      |  md5(substr(text, CAST(i * 128 + 1 AS INT), 64)) AS frame_digest
      |FROM (
      |  SELECT doc_id AS media_id, text,
      |    unnest(range(0, CASE WHEN length(text) < 64 THEN 0
      |                         ELSE (length(text) - 64) // 128 + 1 END)) AS i
      |  FROM documents)
      |ORDER BY media_id, frame_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "media_features" -> (mediaFeatures _),
    "media_frames" -> (mediaFrames _))

  val oracles: Map[String, String] = Map(
    "media_features" -> mediaFeaturesSql,
    "media_frames" -> mediaFramesSql)
}
