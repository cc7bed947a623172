package graft.operators

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.operators.Multimodal.MediaCodec

/** MediaCodec: honest container build + header-walk decode. The decoder
  * must recover the EMBEDDED dimensions from the bytes (not recompute
  * them from size) — proven by embedding dims that differ from
  * [[MediaCodec.dims]]'s size-derived values.
  */
class MultimodalSpec extends SparkSpec {

  private val content = "the quick brown fox".getBytes(StandardCharsets.UTF_8)

  test("PNG round-trip: decoder reads IHDR, not size arithmetic") {
    // deliberately NOT dims(payload length): parse must win over fallback
    val png = MediaCodec.buildPng(width = 1234, height = 777, content)
    val meta = MediaCodec.decode(42L, png)
    assert((meta.width, meta.height) === (1234, 777))
    assert(meta.n_bytes === content.length + 57)
    val sizeDerived = MediaCodec.dims(png.length)
    assert((meta.width, meta.height) !== sizeDerived)
  }

  test("JPEG round-trip: decoder walks markers to SOF0") {
    val jpg = MediaCodec.buildJpeg(width = 640, height = 480, content)
    val meta = MediaCodec.decode(7L, jpg)
    assert((meta.width, meta.height) === (640, 480))
    assert(meta.n_bytes === content.length + 17)
  }

  test("GIF round-trip: dims from the logical screen descriptor, frames COUNTED from descriptors") {
    val gif = MediaCodec.buildGif(width = 321, height = 654, frames = 5, content)
    val meta = MediaCodec.decode(11L, gif)
    assert((meta.width, meta.height) === (321, 654))
    assert(meta.n_frames === 5, "frame count must come from walking image descriptors")
    // size formula the oracle mirrors: content + 26 + sub-block len bytes + 12 per extra frame
    assert(meta.n_bytes === content.length + 26 + (content.length + 254) / 255 + 12 * 4)
  }

  test("GIF frame walk is not fooled by descriptor bytes inside pixel data") {
    // content full of 0x2C bytes: a byte-scan would over-count; the
    // sub-block walk must not
    val tricky = Array.fill(600)(0x2c.toByte)
    val gif = MediaCodec.buildGif(width = 100, height = 100, frames = 3, tricky)
    assert(MediaCodec.decode(1L, gif).n_frames === 3)
  }

  test("raw text beginning with 'GIF8' is NOT sniffed as a GIF container") {
    val tricky = "GIF8 is an image format from 1987, this doc discusses it at length".getBytes(StandardCharsets.UTF_8)
    val meta = MediaCodec.decode(3L, tricky)
    assert((meta.width, meta.height) === MediaCodec.dims(tricky.length), "text must take the raw path")
    assert(meta.n_frames === 1 + tricky.length % 7)
  }

  test("raw payload falls back to size-derived dimensions") {
    val meta = MediaCodec.decode(5L, content)
    assert((meta.width, meta.height) === MediaCodec.dims(content.length))
  }

  test("truncated JPEG (no SOF before scan) falls back, never throws") {
    // SOI + SOS marker straight away: marker walk hits 0xda and bails
    val bytes = Array(0xff, 0xd8, 0xff, 0xda, 0x00, 0x04, 0x01, 0x02, 0x03, 0x04).map(_.toByte)
    val meta = MediaCodec.decode(1L, bytes)
    assert((meta.width, meta.height) === MediaCodec.dims(bytes.length))
  }

  test("WAV round-trip: demux recovers the embedded fmt fields, mono and stereo") {
    for (n <- Seq(100, 101, 254, 255, 0)) {
      val content = Array.tabulate(n)(i => (i % 251).toByte)
      val (rate, ch, bits) = MediaCodec.audioParams(n)
      val wav = MediaCodec.buildWav(rate, ch, bits, content)
      val ba = ch * bits / 8
      val padded = (n + ba - 1) / ba * ba
      assert(wav.length === 44 + padded, s"n=$n container size")
      val m = MediaCodec.decodeWav(7L, wav).get
      assert((m.sample_rate, m.channels, m.bits) === ((rate, ch, bits)), s"n=$n fmt")
      assert(m.n_samples === padded / ba, s"n=$n samples")
      assert(m.ms === m.n_samples * 1000L / rate, s"n=$n duration")
    }
  }

  test("WAV demux walks past unknown RIFF chunks instead of assuming layout") {
    val wav = MediaCodec.buildWav(16000, 1, 8, Array.tabulate(40)(_.toByte))
    // splice an unknown 6-byte "LIST" chunk between WAVE and fmt
    val junk = "LIST".getBytes("US-ASCII") ++ Array[Byte](6, 0, 0, 0) ++ Array.fill(6)(0x55.toByte)
    val spliced = wav.take(12) ++ junk ++ wav.drop(12)
    val m = MediaCodec.decodeWav(1L, spliced).get
    assert((m.sample_rate, m.channels, m.n_samples) === ((16000, 1, 40L)))
  }

  test("WAV demux rejects non-RIFF payloads") {
    assert(MediaCodec.decodeWav(1L, "not a wav at all, nope".getBytes("UTF-8")).isEmpty)
    assert(MediaCodec.decodeWav(1L, Array.emptyByteArray).isEmpty)
  }

  test("mp4 box walk recovers the embedded movie parameters; corrupt payloads drop cleanly") {
    val content = "hello mp4 world, this is the mdat payload".getBytes("UTF-8")
    val b = MediaCodec.buildMp4(90000, 123456, 2, 640, 480, content)
    val m = MediaCodec.decodeMp4(7L, b).get
    assert(m.n_bytes === b.length)
    assert(b.length === 144 + 100 * 2 + content.length)
    assert(m.n_top_boxes === 3)
    assert(m.n_tracks === 2)
    assert(m.timescale === 90000)
    assert(m.duration_ms === 123456L * 1000 / 90000)
    assert((m.width, m.height) === ((640, 480)))
    // truncation anywhere inside the box tree must return None, not throw
    (1 until b.length by 17).foreach { cut =>
      assert(MediaCodec.decodeMp4(7L, b.take(cut)).isEmpty, s"truncated at $cut must not parse")
    }
    // a corrupted declared size must stop the walk, not run off the end
    val corrupt = b.clone(); corrupt(0) = 0x7f.toByte
    assert(MediaCodec.decodeMp4(7L, corrupt).isEmpty)
    assert(MediaCodec.decodeMp4(7L, Array.emptyByteArray).isEmpty)
  }

  test("mp4 trak child scan: tkhd is found even when another box (edts) precedes it") {
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload).array()
    }
    def putBe32(p: Array[Byte], off: Int, v: Int): Unit = {
      p(off) = (v >>> 24).toByte; p(off + 1) = (v >>> 16).toByte
      p(off + 2) = (v >>> 8).toByte; p(off + 3) = v.toByte
    }
    val mvhd = { val p = new Array[Byte](100); putBe32(p, 12, 90000); putBe32(p, 16, 4500); box("mvhd", p) }
    val tkhd = { val p = new Array[Byte](84); putBe32(p, 76, 320 << 16); putBe32(p, 80, 240 << 16); box("tkhd", p) }
    // edts BEFORE tkhd — a structurally valid layout the builder never emits
    val trak = box("trak", box("edts", new Array[Byte](16)) ++ tkhd)
    val bytes = box("ftyp", new Array[Byte](12)) ++ box("moov", mvhd ++ trak) ++ box("mdat", "x".getBytes("UTF-8"))
    val m = MediaCodec.decodeMp4(1L, bytes).get
    assert(m.n_tracks === 1)
    assert(m.timescale === 90000)
    assert((m.width, m.height) === ((320, 240)))
  }

  test("mp4 sample tables: stts/stsz/stsc read back per track, both stsz modes, corrupt tracks drop") {
    val content = ("x" * 137).getBytes("UTF-8")
    val n = content.length
    val b = MediaCodec.buildMp4Sampled(48000, 99999, 2, 320, 240, content)
    val rows = MediaCodec.decodeMp4Tracks(3L, b)
    assert(rows.map(_.track_id) === Seq(1, 2), "one row per track, in track order")
    rows.foreach { r =>
      val (ns, n1, d1, n2, d2, spc) = MediaCodec.mp4TrackSamples(n, r.track_id)
      assert(r.n_samples === ns)
      assert(r.duration_ticks === n1.toLong * d1 + n2.toLong * d2, "tick-exact duration from the two stts runs")
      assert(r.duration_ms === r.duration_ticks * 1000 / 48000)
      val expectBytes =
        if (r.track_id % 2 == 1) ns.toLong * (64 + n % 1024) // fixed-size stsz mode
        else (0 until ns).map(i => 32L + ((n + 11 * i) % 992)).sum // explicit table mode
      assert(r.total_bytes === expectBytes)
      assert(r.mean_sample_size === expectBytes / ns)
      assert(r.n_chunks === (ns + spc - 1) / spc)
    }
    // an stts/stsz sample-count mismatch is a corrupt track: flip the
    // stsz count field (first stsz is fixed-mode at a known offset
    // pattern — corrupt via searching the box) and assert the row drops
    val tag = "stsz".getBytes("US-ASCII")
    val at = b.indexOfSlice(tag)
    val corrupt = b.clone()
    corrupt(at + 4 + 8 + 3) = (corrupt(at + 4 + 8 + 3) + 1).toByte // sample_count += 1
    val survivors = MediaCodec.decodeMp4Tracks(3L, corrupt)
    assert(survivors.map(_.track_id) === Seq(2), "the mismatched track drops; the intact one survives")
    // truncation never throws
    (1 until b.length by 23).foreach(cut => MediaCodec.decodeMp4Tracks(3L, b.take(cut)))
    assert(MediaCodec.decodeMp4Tracks(3L, Array.emptyByteArray).isEmpty)
  }

  test("withVideoPayload → decodeVideo round-trips every doc's parameters") {
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents").limit(40)
    val decoded = Multimodal.decodeVideo(Multimodal.withVideoPayload(docs, "doc_id", "text")).toDF().collect()
    val texts = docs.select(col("doc_id").cast("long"), col("text")).collect()
    assert(decoded.length === texts.length)
    val byId = decoded.map(r => r.getLong(0) -> r).toMap
    texts.foreach { r =>
      val id = r.getLong(0)
      val n = r.getString(1).getBytes(StandardCharsets.UTF_8).length
      val (ts, tracks, dur) = MediaCodec.mp4Params(n)
      val (w, h) = MediaCodec.dims(n)
      val d = byId(id)
      assert(d.getInt(1) === 144 + 100 * tracks + n, s"doc $id n_bytes")
      assert(d.getInt(3) === tracks, s"doc $id tracks")
      assert(d.getInt(4) === ts, s"doc $id timescale")
      assert(d.getLong(5) === dur.toLong * 1000 / ts, s"doc $id duration")
      assert((d.getInt(6), d.getInt(7)) === ((w, h)), s"doc $id dims")
    }
  }

  test("withMediaPayload → decodeMetadata recovers every doc's embedded dims") {
    val docs = graft.sources.Tables.parquet(spark, sfDir, "documents").limit(60)
    val decoded = Multimodal.decodeMetadata(Multimodal.withMediaPayload(docs, "doc_id", "text")).toDF()
    val texts = docs.select(col("doc_id").cast("long"), col("text")).collect()
    val expected = texts.map { r =>
      val id = r.getLong(0)
      val n = r.getString(1).getBytes(StandardCharsets.UTF_8).length
      val (w, h) = MediaCodec.dims(n)
      val total = (id % 4) match {
        case 0 => n + 57
        case 1 => n + 17
        case 2 => n + 26 + (n + 254) / 255 + 12 * (n % 7)
        case _ => n
      }
      id -> ((w, h, total))
    }.toMap
    val got = decoded.collect()
    assert(got.length === texts.length)
    got.foreach { r =>
      val id = r.getLong(0)
      val (w, h, total) = expected(id)
      assert(r.getInt(1) === total, s"doc $id n_bytes")
      assert((r.getInt(2), r.getInt(3)) === ((w, h)), s"doc $id dims")
    }
  }
}
