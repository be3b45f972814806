package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** The image path of the media pipeline does REAL PNG decode via the
  * JDK's ImageIO: encode → decode must recover exactly the dimensions
  * and per-channel means the encoding formulas prescribe, and
  * non-image bytes must be rejected (None), falling back to the
  * surrogate digest path. */
class MediaDecodeSpec extends AnyFunSuite {

  test("encodePng -> decodeImage round-trips dimensions and means") {
    for (id <- Seq(0L, 1L, 17L, 123456789L, 100000000042L)) {
      val png = MediaPipeline.encodePng(id)
      // a real PNG, not a surrogate: starts with the PNG magic bytes
      assert((png(0) & 0xff) === 0x89 && png(1) === 'P'.toByte &&
        png(2) === 'N'.toByte && png(3) === 'G'.toByte)
      val Some((w, h, ch, mr, mg, mb)) = MediaPipeline.decodeImage(png)
      assert(w === (8 + id % 9).toInt, s"width for id=$id")
      assert(h === (8 + id % 7).toInt, s"height for id=$id")
      assert(ch === 3)
      assert(mr === ((id * 31) % 256).toInt, s"mean_r for id=$id")
      assert(mg === ((id * 17) % 256).toInt, s"mean_g for id=$id")
      assert(mb === ((id * 7) % 256).toInt, s"mean_b for id=$id")
    }
  }

  test("decodeImage refuses non-image payloads") {
    assert(MediaPipeline.decodeImage("not a png".getBytes("UTF-8")).isEmpty)
    assert(MediaPipeline.decodeImage(Array.emptyByteArray).isEmpty)
  }

  test("encodeWav -> decodeAudio round-trips rate, frames, amplitude") {
    for (id <- Seq(0L, 1L, 17L, 4999L, 100000000042L)) {
      val wav = MediaPipeline.encodeWav(id)
      // a real WAV, not a surrogate: RIFF....WAVE container magic
      assert(wav(0) === 'R'.toByte && wav(1) === 'I'.toByte &&
        wav(2) === 'F'.toByte && wav(3) === 'F'.toByte, s"RIFF for id=$id")
      assert(wav(8) === 'W'.toByte && wav(9) === 'A'.toByte &&
        wav(10) === 'V'.toByte && wav(11) === 'E'.toByte)
      val Some((rate, ch, n, amp)) = MediaPipeline.decodeAudio(wav)
      assert(rate === MediaPipeline.wavRate(id), s"rate for id=$id")
      assert(ch === 1)
      assert(n === MediaPipeline.wavFrames(id).toLong, s"frames for id=$id")
      val frames = MediaPipeline.wavFrames(id)
      val expAmp = ((0 until frames)
        .map(i => math.abs(MediaPipeline.wavSample(id, i).toLong))
        .sum / frames).toInt
      assert(amp === expAmp, s"mean_amp for id=$id")
    }
  }

  test("decodeAudio refuses non-audio and non-16-bit-PCM payloads") {
    assert(MediaPipeline.decodeAudio("not a wav".getBytes("UTF-8")).isEmpty)
    assert(MediaPipeline.decodeAudio(Array.emptyByteArray).isEmpty)
    // a PNG is not an audio stream either
    assert(MediaPipeline.decodeAudio(MediaPipeline.encodePng(7L)).isEmpty)
  }

  /** The generic per-partition feature-extraction stage (the batch
    * shape a real codec/embedder plugs into): one narrow feature row
    * per payload, deterministic digest = md5 of the payload bytes,
    * 8-dim feature derived from the digest, payload dropped from the
    * output schema. */
  test("extractFeatures batches payloads to narrow deterministic features") {
    val spark = graft.SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    val media = MediaPipeline.mediaTable(spark, dir)
    val feats = MediaPipeline.extractFeatures(media).collect()
    assert(feats.length === media.count())
    // narrow frame: no payload column survives
    assert(!MediaPipeline.extractFeatures(media).schema
      .fieldNames.contains("payload"))
    val byId = feats.map(f => f.media_id -> f).toMap
    media.collect().take(20).foreach { m =>
      val f = byId(m.media_id)
      val md = java.security.MessageDigest.getInstance("MD5")
      val expect = md.digest(m.payload).map("%02x".format(_)).mkString
      assert(f.digest === expect)
      assert(f.byte_len === m.payload.length.toLong)
      assert(f.feature.length === 8)
      assert(f.kind === m.kind)
    }
    // deterministic across runs
    val again = MediaPipeline.extractFeatures(media).collect()
      .map(f => f.media_id -> f.digest).toMap
    assert(feats.forall(f => again(f.media_id) == f.digest))
  }

  test("builtin media_frames query equals the sampleFrames operator") {
    // the oracle-gated query is the codegen-native builtin composition
    // (explode(sequence) + binary substring + md5); sampleFrames is
    // the mapPartitions batch shape a real codec would plug into —
    // this parity pin is what lets the query take the fast tier
    // without the two paths drifting
    val spark = graft.SparkTestSession.spark
    val dir = "/root/testdata/sf0.001"
    val viaQuery = MediaPipeline.mediaFrames(spark, dir)
    val viaOperator = MediaPipeline
      .sampleFrames(MediaPipeline.mediaTable(spark, dir), 64, 128).toDF()
    assert(viaQuery.count() === viaOperator.count())
    assert(viaQuery.exceptAll(viaOperator).isEmpty)
    assert(viaOperator.exceptAll(viaQuery).isEmpty)
  }
}
