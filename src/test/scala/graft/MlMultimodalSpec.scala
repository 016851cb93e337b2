package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.ml.Forecast
import graft.operators.Multimodal

class MlSpec extends AnyFunSuite {
  import SparkTest._

  lazy val features = Forecast.buildDailyFeatures(Tables.events(spark, sf))

  test("feature table: lag/ma semantics (first rows null, ma7 = trailing mean)") {
    val rows = features.orderBy("trip_date").collect()
    assert(rows.head.isNullAt(rows.head.fieldIndex("avg_fare_lag1")))
    assert(rows(6).isNullAt(rows(6).fieldIndex("avg_fare_lag7")))
    assert(!rows(7).isNullAt(rows(7).fieldIndex("avg_fare_lag7")))
    // ma7 at row 7 = mean of avg_fare rows 1..7
    val expMa = (1 to 7).map(rows(_).getAs[Double]("avg_fare")).sum / 7
    assert(math.abs(rows(7).getAs[Double]("avg_fare_ma7") - expMa) < 1e-9)
  }

  test("train → forecast → eval chain produces sane outputs") {
    val trained = Forecast.train(features)
    assert(trained.holdoutMae >= 0 || trained.holdoutMae.isNaN)
    val fc = Forecast.recursiveForecast(spark, trained.model, features, horizon = 7)
    val fcRows = fc.collect()
    assert(fcRows.length == 7)
    assert(fcRows.forall(_.getAs[String]("model_version") == "rf_v1"))
    // forecast dates are the 7 days following the last feature date
    val lastDay = features.agg(max("trip_date")).head.getDate(0).toLocalDate
    val dates = fcRows.map(_.getAs[java.sql.Date]("forecast_date").toLocalDate).sorted
    assert(dates.head == lastDay.plusDays(1) && dates.last == lastDay.plusDays(7))

    val eval = Forecast.evaluate(trained.model, features, k = 7).collect()
    assert(eval.length == 8) // 7 days + ALL summary
    assert(eval.count(_.getAs[String]("day") == "ALL") == 1)
  }

  test("predictFilled (P12): null-lag rows score instead of being dropped") {
    val trained = Forecast.train(features)
    val n = features.count()
    // the first 7 days have null lag features → na.drop would lose them
    assert(features.na.drop().count() < n)
    val scored = Forecast.predictFilled(trained.model, features)
    assert(scored.count() == n, "fill(0) inference must keep every row")
    assert(scored.filter(col("prediction").isNull).count() == 0)
    // the filled early rows get finite predictions
    val early = scored.orderBy("trip_date").limit(3)
      .collect().map(_.getAs[Double]("prediction"))
    assert(early.forall(p => !p.isNaN && !p.isInfinite))
  }

  test("model save/load roundtrip predicts identically") {
    val trained = Forecast.train(features)
    val dir = java.nio.file.Files.createTempDirectory("graft_model").toString
    trained.model.write.overwrite().save(dir)
    val loaded = org.apache.spark.ml.regression.RandomForestRegressionModel.load(dir)
    val a = Forecast.recursiveForecast(spark, trained.model, features)
      .collect().map(_.getAs[Double]("predicted_avg_fare")).toSeq
    val b = Forecast.recursiveForecast(spark, loaded, features)
      .collect().map(_.getAs[Double]("predicted_avg_fare")).toSeq
    assert(a == b)
  }
}

class MultimodalSpec extends AnyFunSuite {
  import SparkTest._
  import spark.implicits._

  lazy val media = Multimodal.attachPayloads(Tables.documents(spark, sf))
    .as[Multimodal.MediaRow]

  test("payload plumbing: binary bytes survive the round trip") {
    val r = media.filter(col("doc_id") === 0).head
    val text = Tables.documents(spark, sf)
      .filter(col("doc_id") === 0).head.getAs[String]("text")
    assert(new String(r.payload, "UTF-8") == text)
  }

  lazy val realMedia = Multimodal.attachMediaPayloads(Tables.documents(spark, sf))

  test("real decode is deterministic, batch-shaped, and never 'unknown'") {
    val f1 = Multimodal.decodeFeatures(realMedia).collect().sortBy(_.doc_id)
    val f2 = Multimodal.decodeFeatures(realMedia).collect().sortBy(_.doc_id)
    assert(f1.map(_.checksum).toSeq == f2.map(_.checksum).toSeq)
    assert(f1.forall(f => f.brightness >= 0.0 && f.brightness <= 1.0))
    assert(f1.forall(_.byte_len > 0))
    // every encoded payload parses as its REAL container format
    assert(f1.filter(_.media_type == "image").forall(_.format == "bmp"))
    assert(f1.filter(_.media_type == "audio").forall(_.format == "wav"))
    assert(f1.filter(_.media_type == "video").forall(_.format == "gfv1"))
    // repartitioning must not change results (no partition-dependent state)
    val f3 = Multimodal.decodeFeatures(realMedia.repartition(7))
      .collect().sortBy(_.doc_id)
    assert(f1.map(_.checksum).toSeq == f3.map(_.checksum).toSeq)
  }

  test("BMP decode is pixel-exact on a hand-computed fixture") {
    // width 5 → row stride 16 (one pad byte): padding must NOT leak into
    // the brightness statistic
    val pixels = Array.tabulate(5 * 2 * 3)(i => (i * 7 % 256).toByte)
    val bmp = Multimodal.encodeBmp(pixels, 5, 2)
    val Some((w, h, mean)) = Multimodal.decodeBmpPixels(bmp)
    assert(w == 5 && h == 2)
    val expected = pixels.map(_ & 0xFF).sum.toDouble / pixels.length
    assert(math.abs(mean - expected) < 1e-12, s"$mean vs $expected")
    // corrupting the bpp field degrades to None, not garbage
    val bad = bmp.clone(); bad(28) = 8
    assert(Multimodal.decodeBmpPixels(bad).isEmpty)
  }

  test("WAV decode is sample-exact (chunk walk, PCM16 RMS)") {
    val samples = Array[Short](0, 16384, -16384, 32767, -32768, 0)
    val wav = Multimodal.encodeWav(samples, 8000)
    val Some((rate, n, rms)) = Multimodal.decodeWavSamples(wav)
    assert(rate == 8000 && n == samples.length)
    val expected = math.sqrt(
      samples.map(s => math.pow(s / 32768.0, 2)).sum / samples.length)
    assert(math.abs(rms - expected) < 1e-12)
  }

  test("audioEnergy: window census exact on a crafted silence/loud/clip WAV") {
    import spark.implicits._
    // 3 windows of 4 samples: silent, half-amplitude, clipped-loud
    val samples = Array[Short](0, 0, 0, 0,
      16384, -16384, 16384, -16384,
      32767, -32768, 32767, 32760)
    val wav = Multimodal.encodeWav(samples, 8000)
    val media = Seq((7L, wav)).toDF("doc_id", "payload")
    val r = Multimodal.audioEnergy(media, winSamples = 4, silenceRms = 0.01)
      .collect()
    assert(r.length == 1)
    val a = r.head
    assert(a.doc_id == 7L && a.sample_rate == 8000 && a.n_samples == 12)
    assert(a.n_windows == 3)
    assert(math.abs(a.silence_ratio - 1.0 / 3) < 1e-12)
    assert(a.peak_win == 2, s"loudest window must be the clipped one, got ${a.peak_win}")
    assert(math.abs(a.peak_rms - math.sqrt(
      Array(32767, -32768, 32767, 32760).map(s => math.pow(s / 32768.0, 2)).sum / 4)) < 1e-12)
    assert(math.abs(a.clip_ratio - 4.0 / 12) < 1e-12,
      s"all four samples of the last window clip, got ${a.clip_ratio}")
  }

  test("audioEnergy: trailing partial window is kept and mean_rms averages windows") {
    import spark.implicits._
    val samples = Array[Short](16384, 16384, 16384, 16384, 32767) // 4+1
    val wav = Multimodal.encodeWav(samples, 16000)
    val a = Multimodal.audioEnergy(Seq((1L, wav)).toDF("doc_id", "payload"),
      winSamples = 4, silenceRms = 0.01).collect().head
    assert(a.n_windows == 2, "5 samples at win=4 must give 2 windows")
    val w1 = 16384 / 32768.0
    val w2 = 32767 / 32768.0 // singleton window RMS = |sample|
    assert(math.abs(a.mean_rms - (w1 + w2) / 2) < 1e-12)
    assert(a.peak_win == 1)
  }

  test("mm_audio_energy: audio docs only, deterministic, no dead fixture rows") {
    val out = SparkEntry.queries("mm_audio_energy")(spark, sf).cache()
    val audioDocs = graft.operators.Multimodal
      .attachMediaPayloads(Tables.documents(spark, sf))
      .filter(org.apache.spark.sql.functions.col("media_type") === "audio").count()
    assert(out.count() == audioDocs, "every audio payload must decode")
    val again = SparkEntry.queries("mm_audio_energy")(spark, sf)
    assert(out.exceptAll(again).isEmpty && again.exceptAll(out).isEmpty,
      "decode census must be deterministic")
    val stats = out.agg(
      org.apache.spark.sql.functions.min("peak_rms"),
      org.apache.spark.sql.functions.max("n_windows")).head
    assert(stats.getDouble(0) > 0.0, "synthetic audio has no all-silent payloads")
    assert(stats.getInt(1) >= 1)
  }

  test("GFV1 container decodes every real BMP frame") {
    val frame = (f: Int) =>
      Multimodal.encodeBmp(Array.fill(4 * 4 * 3)((40 * f).toByte), 4, 4)
    val video = Multimodal.encodeFrames(Seq(frame(1), frame(2), frame(3)))
    val d = Multimodal.decodeOne(7L, "video", video)
    assert(d.format == "gfv1" && d.n_frames == 3 && d.width == 4 && d.height == 4)
    val expected = (40.0 + 80.0 + 120.0) / 3 / 255.0
    assert(math.abs(d.brightness - expected) < 1e-12)
  }

  test("resizeBmpGrid: 2x2 thumbnail equals per-pixel channel means, image-oriented") {
    // 2×2 image, one flat value per pixel (BGR equal), distinct per pixel:
    // top-left 10, top-right 20, bottom-left 30, bottom-right 40
    val px = Array(10, 10, 10, 20, 20, 20, 30, 30, 30, 40, 40, 40).map(_.toByte)
    val bmp = Multimodal.encodeBmp(px, 2, 2)
    val Some((w, h, grid, gmean)) = Multimodal.resizeBmpGrid(bmp, 2)
    assert(w == 2 && h == 2)
    // grid row 0 must be the TOP of the image despite bottom-up storage
    assert(grid.toSeq == Seq(10.0, 20.0, 30.0, 40.0))
    // the returned global mean is the block-size-weighted one and matches
    // the full decoder exactly
    val Some((_, _, mean)) = Multimodal.decodeBmpPixels(bmp)
    assert(math.abs(gmean - mean) < 1e-12)
  }

  test("sampleFrames: stride-2 keeps frames 0,2,4; deterministic; video-only") {
    import SparkTest._
    val media = Multimodal.attachMediaPayloads(
      Tables.documents(spark, sf)).filter(org.apache.spark.sql.functions
        .col("media_type") === "video")
    val a = Multimodal.sampleFrames(media, stride = 2).collect()
    val b = Multimodal.sampleFrames(media, stride = 2).collect()
    assert(a.nonEmpty)
    assert(a.map(f => (f.doc_id, f.frame_idx)).toSeq ==
      b.map(f => (f.doc_id, f.frame_idx)).toSeq)
    a.foreach { f =>
      assert(f.frame_idx % 2 == 0, s"frame ${f.frame_idx} not on the stride grid")
      assert(f.brightness >= 0.0 && f.brightness <= 1.0)
      assert(f.thumb.length == 16)
    }
    // per-doc sampled count = ceil(n_frames / 2) against the full decode
    val nf = Multimodal.decodeFeatures(media).collect()
      .map(d => d.doc_id -> d.n_frames).toMap
    a.groupBy(_.doc_id).foreach { case (id, fs) =>
      assert(fs.length == (nf(id) + 1) / 2, s"doc $id sampled ${fs.length}")
    }
  }

  test("malformed payloads degrade to unknown instead of failing the batch") {
    assert(Multimodal.decodeOne(1L, "image", "not media".getBytes).format == "unknown")
    assert(Multimodal.decodeOne(2L, "image", Array.empty[Byte]).format == "unknown")
    // truncated BMP: header promises more pixel data than the payload has
    val bmp = Multimodal.encodeBmp(Array.fill(4 * 4 * 3)(1.toByte), 4, 4)
    assert(Multimodal.decodeOne(3L, "image", bmp.take(40)).format == "unknown")
    assert(Multimodal.decodeOne(4L, "image", bmp.take(60)).format == "unknown")
  }

  test("parseHeader reads real PNG/JPEG/WAV headers from magic bytes") {
    // minimal hand-crafted PNG: signature + IHDR(len,type) + 640x480
    val png = Array[Int](0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A,
      0, 0, 0, 13, 'I', 'H', 'D', 'R',
      0, 0, 0x02, 0x80, /* width 640 */ 0, 0, 0x01, 0xE0 /* height 480 */
    ).map(_.toByte)
    assert(Multimodal.parseHeader(png) == Multimodal.MediaHeader("png", 640, 480))

    // JPEG: SOI + APP0 (len 4) + SOF0 with height 100, width 200
    val jpeg = Array[Int](0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x04, 0x00, 0x00,
      0xFF, 0xC0, 0x00, 0x11, 0x08, 0x00, 0x64 /* h=100 */, 0x00, 0xC8 /* w=200 */
    ).map(_.toByte)
    assert(Multimodal.parseHeader(jpeg) == Multimodal.MediaHeader("jpeg", 200, 100))

    // WAV: RIFF....WAVEfmt + 2 channels @ 44100 Hz (canonical 44-byte header)
    val wav = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    wav.put("RIFF".getBytes).putInt(36).put("WAVE".getBytes).put("fmt ".getBytes)
    wav.putInt(16).putShort(1).putShort(2).putInt(44100)
    val parsed = Multimodal.parseHeader(wav.array())
    assert(parsed.format == "wav" && parsed.width == 44100 && parsed.height == 2)

    // synthetic text payloads sniff as unknown
    assert(Multimodal.parseHeader("plain text".getBytes).format == "unknown")
  }

  test("sniffHeaders runs distributed over the binary column") {
    val sniffed = Multimodal.sniffHeaders(media).collect()
    assert(sniffed.length == media.count())
    assert(sniffed.forall(_.getAs[String]("format") == "unknown")) // text payloads
  }

  test("sampleFrames fans out every k-th frame for videos only") {
    val feats = Multimodal.decodeFeatures(realMedia)
    val frames = Multimodal.sampleFrames(feats, everyK = 2).collect()
    assert(frames.nonEmpty)
    assert(frames.forall(_.getAs[Int]("frame_idx") % 2 == 0))
    val videoIds = feats.filter(_.media_type == "video").collect().map(_.doc_id).toSet
    assert(frames.map(_.getAs[Long]("doc_id")).toSet.subsetOf(videoIds))
  }
}
