package graft

import graft.multimodal.{Codecs, Multimodal}

/** Real media codec correctness: PPM/WAV round-trips, real resize, feature
  * semantics, corrupt-input degradation, and the Spark pipeline over them. */
class CodecsSpec extends SparkSpec {

  test("PPM round-trip: decode(encode(img)) == img; comments tolerated; corrupt degrades") {
    val img = Codecs.Image(4, 2, Array.tabulate[Byte](24)(i => (i * 10).toByte))
    val back = Codecs.decodePpm(Codecs.encodePpm(img)).get
    assert(back.width == 4 && back.height == 2 && back.rgb.sameElements(img.rgb))
    // header comment per the spec
    val withComment = ("P6\n# a comment\n4 2\n255\n").getBytes ++ img.rgb
    assert(Codecs.decodePpm(withComment).get.rgb.sameElements(img.rgb))
    // corrupt inputs → None, never throw
    assert(Codecs.decodePpm(Array[Byte]()).isEmpty)
    assert(Codecs.decodePpm("P6\n4 2\n255\nxx".getBytes).isEmpty) // short payload
    assert(Codecs.decodePpm("JUNK".getBytes).isEmpty)
  }

  test("box-filter resize: solid color stays solid; 2x2 mean computed exactly") {
    val solid = Codecs.Image(8, 8, Array.fill[Byte](192)(100))
    val small = Codecs.resize(solid, 2, 2)
    assert(small.width == 2 && small.height == 2 && small.rgb.forall(_ == 100))
    // 2x1 image (r=0 and r=200) down to 1x1 → mean 100 in channel 0
    val two = Codecs.Image(2, 1, Array[Byte](0, 0, 0, 200.toByte, 0, 0))
    assert((Codecs.resize(two, 1, 1).rgb(0) & 0xFF) == 100)
  }

  test("image features: solid gray has mean 0.5-ish channels and one hot luminance bin") {
    val img = Codecs.Image(4, 4, Array.fill[Byte](48)(128.toByte))
    val f = Codecs.imageFeatures(img, 16)
    assert(math.abs(f(0) - 128 / 255.0f) < 1e-6 && f(0) == f(1) && f(1) == f(2))
    // luminance 128 → bin 4 holds all pixels
    assert(f(3 + 4) == 1.0f && (0 until 8).map(b => f(3 + b)).sum == 1.0f)
    assert(f(11) == 1.0f) // aspect ratio
  }

  test("WAV round-trip and sine RMS ≈ amplitude/√2") {
    val rate = 8000
    val amp = 12000.0
    val samples = Array.tabulate[Short](800)(j => (math.sin(2 * math.Pi * 200 * j / rate) * amp).toShort)
    val back = Codecs.decodeWav(Codecs.encodeWav(Codecs.Audio(rate, samples))).get
    assert(back.sampleRate == rate && back.samples.sameElements(samples))
    val f = Codecs.audioFeatures(back, 4)
    assert(math.abs(f(0) - amp / math.sqrt(2) / 32768.0) < 0.01, s"rms ${f(0)}")
    assert(f(1) > 0.0f) // sine crosses zero
    assert(Codecs.decodeWav("RIFFxxxx".getBytes).isEmpty)
  }

  test("pipeline decodes REAL payloads: image/audio decoded_ok, thumbnails resized") {
    val media = Multimodal.synthMedia(spark, 30L)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length == 30 && feats.forall(_.decoded_ok))
    // image features come from real pixels: channel means in (0, 1)
    val img = feats.filter(_.kind == "image")
    assert(img.nonEmpty && img.forall(m => m.feature(0) > 0.0f && m.feature(0) < 1.0f))
    // audio RMS from the real tone is near amp/√2/32768 ≈ 0.26
    val aud = feats.filter(_.kind == "audio")
    assert(aud.nonEmpty && aud.forall(m => m.feature(0) > 0.2f && m.feature(0) < 0.3f))
    // thumbnails are valid 8x8 PPMs
    val thumbs = Multimodal.thumbnails(media.filter(_.kind == "image")).collect()
    assert(thumbs.nonEmpty)
    thumbs.foreach { t =>
      val d = Codecs.decodePpm(t.thumb).get
      assert(d.width == 8 && d.height == 8)
    }
    // a corrupt image payload degrades (decoded_ok=false), does not throw
    import spark.implicits._
    val corrupt = Seq(Multimodal.MediaRow(99L, "c", "image", "JUNK".getBytes, 4, 4, 0L)).toDS
    val cf = Multimodal.extractFeatures(corrupt).head()
    assert(!cf.decoded_ok && cf.feature.forall(_ == 0.0f))
  }
}
