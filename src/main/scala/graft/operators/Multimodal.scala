package graft.operators

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media as opaque `binary` columns with
  * typed metadata, processed per-partition.
  *
  * The Spark-side shape is the production thing — binary payload +
  * metadata struct in the schema, batched per-partition processing via
  * `mapPartitions` on a typed Dataset (the Scala analogue of a batched/
  * Arrow UDF), output schema declared by case-class encoder. The decode
  * kernel ([[MediaCodec.decode]]) does REAL byte parsing: PNG IHDR /
  * JPEG SOF header walks for dimensions, and a GIF block walk that
  * COUNTS image descriptors for frame count (pure JVM — no codec
  * libraries needed for any of it). Payloads are built by [[MediaCodec]]
  * as honest PNG / JPEG / animated-GIF containers (real signatures,
  * chunk CRCs, marker segments, sub-block framing) wrapping the
  * document bytes; only the container-less RAW path keeps an arithmetic
  * frame count (a true video demux needs codecs this environment
  * lacks — that residual stand-in is documented at
  * [[MediaCodec.frameCount]]).
  *
  * At scale: payloads never shuffle (all derivation is map-side), and
  * metadata-only queries prune the binary column at the parquet scan.
  */
object Multimodal {

  /** Typed metadata emitted by the decoder. */
  final case class MediaMeta(doc_id: Long, n_bytes: Int, width: Int, height: Int, n_frames: Int)

  /** Typed metadata emitted by the WAV demux. */
  final case class AudioMeta(doc_id: Long, n_bytes: Int, sample_rate: Int, channels: Int, bits: Int, n_samples: Long, ms: Long)

  /** Typed metadata emitted by the MP4 box walk. */
  final case class Mp4Meta(
      doc_id: Long,
      n_bytes: Int,
      n_top_boxes: Int,
      n_tracks: Int,
      timescale: Int,
      duration_ms: Long,
      width: Int,
      height: Int
  )

  /** Per-track sample-table metadata emitted by the full MP4 demux
    * (q359): what video keyframe sampling actually plans against —
    * frame counts, tick-exact durations, byte budgets and chunk
    * layout, all read back out of genuine stts/stsz/stsc boxes.
    */
  final case class Mp4TrackMeta(
      doc_id: Long,
      track_id: Int,
      timescale: Int,
      n_samples: Int,
      duration_ticks: Long,
      duration_ms: Long,
      total_bytes: Long,
      mean_sample_size: Long,
      n_chunks: Int
  )

  /** Per-track keyframe fetch plan (q362): which samples are sync
    * points (stss), what they cost to fetch (stsz prefix offsets), and
    * the fraction of the track a keyframe-only read touches — the plan
    * a video sampling job executes against object storage.
    */
  final case class KeyframePlan(
      doc_id: Long,
      track_id: Int,
      n_samples: Int,
      n_sync: Int,
      sync_stride: Int,
      planned_bytes: Long,
      total_bytes: Long,
      last_sync_offset: Long,
      fetch_permille: Long
  )

  /** Build + parse of real media containers (headers, not pixels). */
  object MediaCodec {

    private val PngSig = Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

    /** Deterministic dimensions for a payload of `n` content bytes —
      * the values the builders EMBED and the decoder must parse back.
      */
    def dims(n: Int): (Int, Int) = (64 + n % 577, 64 + (n * 31) % 417)

    /** RESIDUAL STAND-IN (documented): raw payloads model opaque video
      * whose frame count needs a real demuxer this environment lacks;
      * derived arithmetically from size instead. Containers that can be
      * demuxed in pure JVM are: GIF frames are genuinely COUNTED from
      * image descriptors ([[gifFrameCount]]), PNG/JPEG are genuinely
      * single-frame.
      */
    def frameCount(totalBytes: Int): Int = 1 + totalBytes % 7

    /** Minimal-but-real PNG: signature, IHDR (width/height big-endian,
      * real CRC32), one IDAT chunk carrying `content`, IEND.
      * Total size = content + 57 bytes.
      */
    def buildPng(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(content.length + 57)
      out.write(PngSig, 0, 8)
      val ihdr = new Array[Byte](13)
      writeBe32(ihdr, 0, width)
      writeBe32(ihdr, 4, height)
      ihdr(8) = 8 // bit depth
      ihdr(9) = 2 // color type: truecolor
      writeChunk(out, "IHDR", ihdr)
      writeChunk(out, "IDAT", content)
      writeChunk(out, "IEND", Array.emptyByteArray)
      out.toByteArray
    }

    /** Minimal-but-real JPEG: SOI, SOF0 segment (1 component; height
      * then width, big-endian — JPEG stores height first), entropy
      * bytes, EOI. Total size = content + 17 bytes.
      */
    def buildJpeg(width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(content.length + 17)
      out.write(0xff); out.write(0xd8) // SOI
      out.write(0xff); out.write(0xc0) // SOF0
      out.write(0x00); out.write(0x0b) // segment length: 2 + 9
      out.write(8) // precision
      out.write((height >> 8) & 0xff); out.write(height & 0xff)
      out.write((width >> 8) & 0xff); out.write(width & 0xff)
      out.write(1) // 1 component
      out.write(1); out.write(0x11); out.write(0) // component spec
      out.write(content, 0, content.length)
      out.write(0xff); out.write(0xd9) // EOI
      out.toByteArray
    }

    /** Minimal-but-real animated GIF89a: header + logical screen
      * descriptor (width/height little-endian), `frames` image
      * descriptors — frame 0 carries `content` as honest 255-byte-max
      * data sub-blocks, later frames are empty — and the trailer.
      * Total size = content + 26 + ceil(content/255) + 12·(frames−1).
      */
    def buildGif(width: Int, height: Int, frames: Int, content: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(content.length + 26 + 12 * frames)
      out.write("GIF89a".getBytes(StandardCharsets.US_ASCII), 0, 6)
      // logical screen descriptor: no global color table
      out.write(width & 0xff); out.write((width >> 8) & 0xff)
      out.write(height & 0xff); out.write((height >> 8) & 0xff)
      out.write(0); out.write(0); out.write(0)
      var f = 0
      while (f < frames) {
        out.write(0x2c) // image descriptor
        out.write(0); out.write(0); out.write(0); out.write(0) // left, top
        out.write(width & 0xff); out.write((width >> 8) & 0xff)
        out.write(height & 0xff); out.write((height >> 8) & 0xff)
        out.write(0) // no local color table
        out.write(8) // LZW minimum code size
        if (f == 0) {
          var off = 0
          while (off < content.length) {
            val len = math.min(255, content.length - off)
            out.write(len)
            out.write(content, off, len)
            off += len
          }
        }
        out.write(0) // sub-block terminator
        f += 1
      }
      out.write(0x3b) // trailer
      out.toByteArray
    }

    /** Parse dimensions out of the payload bytes: PNG → IHDR fields,
      * JPEG → SOF segment walk, GIF → logical screen descriptor plus a
      * REAL frame count from the block walk, anything else →
      * size-derived fallback (the pre-container behavior, kept for raw
      * payloads).
      */
    def decode(docId: Long, payload: Array[Byte]): MediaMeta = {
      val n = payload.length
      if (isPng(payload))
        MediaMeta(docId, n, readBe32(payload, 16), readBe32(payload, 20), 1)
      else if (isJpeg(payload)) {
        val (w, h) = jpegDims(payload).getOrElse(dims(n))
        MediaMeta(docId, n, w, h, 1)
      } else if (isGif(payload)) {
        val w = (payload(6) & 0xff) | ((payload(7) & 0xff) << 8)
        val h = (payload(8) & 0xff) | ((payload(9) & 0xff) << 8)
        MediaMeta(docId, n, w, h, gifFrameCount(payload))
      } else {
        val (w, h) = dims(n)
        MediaMeta(docId, n, w, h, frameCount(n))
      }
    }

    // full 6-byte signature: unlike PNG (0x89) and JPEG (0xFF), whose
    // magic bytes cannot start UTF-8 text, plain text CAN begin with
    // "GIF8" — demand the whole GIF87a/GIF89a version string so a raw
    // document that happens to mention GIFs is not sniffed as one
    private def isGif(b: Array[Byte]): Boolean =
      b.length > 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8' &&
        (b(4) == '7' || b(4) == '9') && b(5) == 'a'

    /** Count image descriptors by walking the GIF block structure —
      * descriptors, LZW data sub-blocks, extensions — exactly as a
      * real GIF demuxer does (a descriptor byte inside pixel data must
      * NOT count, hence the walk rather than a byte scan).
      */
    private def gifFrameCount(b: Array[Byte]): Int = {
      // skip global color table if the LSD flags announce one
      val gctFlag = (b(10) & 0x80) != 0
      val gctSize = if (gctFlag) 3 * (1 << ((b(10) & 0x07) + 1)) else 0
      var i = 13 + gctSize
      var frames = 0
      def skipSubBlocks(): Unit = {
        while (i < b.length && (b(i) & 0xff) != 0) i += 1 + (b(i) & 0xff)
        i += 1 // terminator
      }
      while (i < b.length) {
        (b(i) & 0xff) match {
          case 0x2c if i + 9 < b.length => // image descriptor (flags byte in range)
            frames += 1
            val flags = b(i + 9) & 0xff
            val lctSize = if ((flags & 0x80) != 0) 3 * (1 << ((flags & 0x07) + 1)) else 0
            i += 10 + lctSize + 1 // descriptor + local table + LZW min code size
            skipSubBlocks()
          case 0x21 => // extension: label byte then sub-blocks
            i += 2
            skipSubBlocks()
          case 0x3b => return math.max(frames, 1) // trailer
          case _ => return math.max(frames, 1) // corrupt: stop walking
        }
      }
      math.max(frames, 1)
    }

    private def isPng(b: Array[Byte]): Boolean =
      b.length > 24 && (0 until 8).forall(i => b(i) == PngSig(i))

    private def isJpeg(b: Array[Byte]): Boolean =
      b.length > 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8

    /** Walk JPEG marker segments up to start-of-scan; SOF0..SOF15
      * (minus the non-frame C4/C8/CC) carry height(2) width(2) after
      * the 3-byte segment header prefix.
      */
    private def jpegDims(b: Array[Byte]): Option[(Int, Int)] = {
      var i = 2
      while (i + 8 < b.length && (b(i) & 0xff) == 0xff) {
        val marker = b(i + 1) & 0xff
        val len = ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)
        if (marker >= 0xc0 && marker <= 0xcf && marker != 0xc4 && marker != 0xc8 && marker != 0xcc) {
          val h = ((b(i + 5) & 0xff) << 8) | (b(i + 6) & 0xff)
          val w = ((b(i + 7) & 0xff) << 8) | (b(i + 8) & 0xff)
          return Some((w, h))
        }
        if (marker == 0xda) return None // entropy data follows; no SOF seen
        i += 2 + len
      }
      None
    }

    /** Deterministic audio parameters for `n` content bytes — the
      * values [[buildWav]] EMBEDS and [[decodeWav]] must parse back.
      * Even n → mono 8-bit, odd n → stereo 16-bit; rate cycles the
      * standard ladder.
      */
    def audioParams(n: Int): (Int, Int, Int) = {
      val rates = Array(8000, 16000, 22050, 44100, 48000)
      (rates(n % 5), 1 + n % 2, 8 * (1 + n % 2))
    }

    /** Minimal-but-real PCM WAV: RIFF header, canonical 16-byte fmt
      * chunk (format tag 1, channels, sample rate, byte rate, block
      * align, bits), data chunk carrying `content` zero-padded to frame
      * alignment. Total size = 44 + content padded to blockAlign.
      */
    def buildWav(sampleRate: Int, channels: Int, bits: Int, content: Array[Byte]): Array[Byte] = {
      val blockAlign = channels * bits / 8
      val padded = ((content.length + blockAlign - 1) / blockAlign) * blockAlign
      val out = new ByteArrayOutputStream(44 + padded)
      def ascii(t: String): Unit = out.write(t.getBytes(StandardCharsets.US_ASCII), 0, 4)
      def le32(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff); out.write((v >> 16) & 0xff); out.write((v >>> 24) & 0xff) }
      def le16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
      ascii("RIFF"); le32(36 + padded); ascii("WAVE")
      ascii("fmt "); le32(16)
      le16(1) // PCM
      le16(channels)
      le32(sampleRate)
      le32(sampleRate * blockAlign) // byte rate
      le16(blockAlign)
      le16(bits)
      ascii("data"); le32(padded)
      out.write(content, 0, content.length)
      var p = content.length
      while (p < padded) { out.write(0); p += 1 }
      out.toByteArray
    }

    /** Parse audio metadata by genuinely walking the RIFF chunk list —
      * fmt fields little-endian, sample count from the data chunk size
      * over block align — exactly as a WAV demuxer does. Chunks the
      * parser doesn't know are SKIPPED by their declared size (the
      * behavior that makes RIFF extensible), not assumed absent.
      */
    def decodeWav(docId: Long, b: Array[Byte]): Option[AudioMeta] = {
      if (b.length < 44 || !isRiffTag(b, 0, "RIFF") || !isRiffTag(b, 8, "WAVE")) return None
      def le32(off: Int): Int =
        (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
      def le16(off: Int): Int = (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
      var i = 12
      var rate = 0; var channels = 0; var bits = 0; var blockAlign = 0; var dataLen = -1
      while (i + 8 <= b.length) {
        val size = le32(i + 4)
        if (size < 0) return None // corrupt size: stop the walk, not the task
        // a declared chunk body past EOF means a truncated payload —
        // drop the row (None), never index out of bounds in the task
        if (i + 8 + size > b.length) return None
        if (isRiffTag(b, i, "fmt ") && size >= 16) {
          channels = le16(i + 10)
          rate = le32(i + 12)
          blockAlign = le16(i + 20)
          bits = le16(i + 22)
        } else if (isRiffTag(b, i, "data")) {
          dataLen = size
        }
        i += 8 + size + (size & 1) // RIFF chunks are word-aligned
      }
      if (rate <= 0 || blockAlign <= 0 || dataLen < 0) None
      else {
        val samples = dataLen.toLong / blockAlign
        Some(AudioMeta(docId, b.length, rate, channels, bits, samples, samples * 1000L / rate))
      }
    }

    private def isRiffTag(b: Array[Byte], off: Int, tag: String): Boolean =
      off + 4 <= b.length && (0 until 4).forall(i => (b(off + i) & 0xff) == tag.charAt(i))

    private def writeChunk(out: ByteArrayOutputStream, typ: String, data: Array[Byte]): Unit = {
      val len = new Array[Byte](4)
      writeBe32(len, 0, data.length)
      out.write(len, 0, 4)
      val t = typ.getBytes(StandardCharsets.US_ASCII)
      out.write(t, 0, 4)
      out.write(data, 0, data.length)
      val crc = new CRC32
      crc.update(t)
      crc.update(data)
      val c = new Array[Byte](4)
      writeBe32(c, 0, crc.getValue.toInt)
      out.write(c, 0, 4)
    }

    private def writeBe32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = ((v >>> 24) & 0xff).toByte
      b(off + 1) = ((v >>> 16) & 0xff).toByte
      b(off + 2) = ((v >>> 8) & 0xff).toByte
      b(off + 3) = (v & 0xff).toByte
    }

    private def readBe32(b: Array[Byte], off: Int): Int =
      ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

    /** Deterministic MP4 parameters from content size — (timescale,
      * track count, duration in timescale units); the builder embeds
      * them, the box walk must read them back.
      */
    def mp4Params(n: Int): (Int, Int, Int) = {
      val timescales = Array(600, 1000, 48000, 90000)
      (timescales(n % 4), 1 + n % 3, timescales(n % 4) + ((n.toLong * 3) % 100000).toInt)
    }

    private def mp4Box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(8 + payload.length)
      val sz = new Array[Byte](4)
      writeBe32(sz, 0, 8 + payload.length)
      out.write(sz, 0, 4)
      out.write(typ.getBytes(StandardCharsets.US_ASCII), 0, 4)
      out.write(payload, 0, payload.length)
      out.toByteArray
    }

    /** Minimal-but-real ISO-BMFF (MP4): ftyp, moov(mvhd, trak(tkhd)×k),
      * mdat carrying `content`. Box sizes/types are genuine big-endian
      * box headers; mvhd carries timescale/duration, each tkhd its
      * 16.16 fixed-point width/height and track id — everything a real
      * demuxer reads to answer "what is this file" without codecs.
      * Total size = 144 + 100·tracks + content.
      */
    def buildMp4(timescale: Int, duration: Int, nTracks: Int, width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
      val ftyp = {
        val p = new Array[Byte](12)
        "isom".getBytes(StandardCharsets.US_ASCII).copyToArray(p, 0)
        "isom".getBytes(StandardCharsets.US_ASCII).copyToArray(p, 8)
        mp4Box("ftyp", p)
      }
      val mvhd = {
        val p = new Array[Byte](100)
        writeBe32(p, 12, timescale)
        writeBe32(p, 16, duration)
        writeBe32(p, 20, 0x00010000) // rate 1.0
        p(24) = 0x01 // volume 1.0 (8.8)
        // identity matrix
        writeBe32(p, 36, 0x00010000); writeBe32(p, 52, 0x00010000); writeBe32(p, 68, 0x40000000)
        writeBe32(p, 96, nTracks + 1) // next_track_ID
        mp4Box("mvhd", p)
      }
      val traks = (1 to nTracks).map { tid =>
        val p = new Array[Byte](84)
        writeBe32(p, 0, 0x00000007) // version 0, flags: enabled|in-movie|in-preview
        writeBe32(p, 12, tid)
        writeBe32(p, 20, duration)
        writeBe32(p, 40, 0x00010000); writeBe32(p, 56, 0x00010000); writeBe32(p, 72, 0x40000000)
        writeBe32(p, 76, width << 16) // 16.16 fixed
        writeBe32(p, 80, height << 16)
        mp4Box("trak", mp4Box("tkhd", p))
      }
      val moov = mp4Box("moov", (mvhd +: traks).reduce(_ ++ _))
      val mdat = mp4Box("mdat", content)
      ftyp ++ moov ++ mdat
    }

    private def boxType(b: Array[Byte], off: Int): String =
      new String(b, off + 4, 4, StandardCharsets.US_ASCII)

    /** Genuine ISO-BMFF box walk: top-level boxes counted by declared
      * size, moov children walked for trak count and mvhd fields, the
      * first tkhd's fixed-point dimensions decoded. Every declared size
      * is bounds-guarded (size < 8 or running past EOF ⇒ None — the WAV
      * truncation posture), so corrupt payloads drop rows, never throw.
      */
    def decodeMp4(docId: Long, b: Array[Byte]): Option[Mp4Meta] = {
      var i = 0
      var nTop = 0
      var nTracks = 0
      var timescale = 0
      var duration = 0
      var width = -1
      var height = -1
      while (i + 8 <= b.length) {
        val size = readBe32(b, i)
        if (size < 8 || i + size > b.length) return None
        nTop += 1
        if (boxType(b, i) == "moov") {
          var j = i + 8
          val end = i + size
          while (j + 8 <= end) {
            val csize = readBe32(b, j)
            if (csize < 8 || j + csize > end) return None
            boxType(b, j) match {
              case "mvhd" =>
                if (j + 8 + 20 > end) return None
                timescale = readBe32(b, j + 8 + 12)
                duration = readBe32(b, j + 8 + 16)
              case "trak" =>
                nTracks += 1
                // first trak bearing a tkhd: SCAN the trak's children
                // (tkhd need not be the first child — edts/udta may
                // precede it in a structurally valid file)
                if (width < 0) {
                  var c = j + 8
                  val tEnd = j + csize
                  while (width < 0 && c + 8 <= tEnd) {
                    val tsize = readBe32(b, c)
                    if (tsize < 8 || c + tsize > tEnd) return None
                    if (boxType(b, c) == "tkhd") {
                      if (tsize < 8 + 84) return None
                      width = readBe32(b, c + 8 + 76) >>> 16
                      height = readBe32(b, c + 8 + 80) >>> 16
                    }
                    c += tsize
                  }
                }
              case _ => ()
            }
            j += csize
          }
        }
        i += size
      }
      if (i != b.length || timescale <= 0 || nTracks == 0 || width < 0) None
      else Some(Mp4Meta(docId, b.length, nTop, nTracks, timescale, duration.toLong * 1000L / timescale, width, height))
    }

    // ——— sample tables (q359): stts/stsz/stsc under trak/mdia/minf/stbl ———

    /** Deterministic per-track sample parameters from (content size,
      * track id) — (n_samples, run1 count, run1 delta, run2 count,
      * run2 delta, samples per chunk). The builder writes them into
      * genuine stts/stsz/stsc boxes; the demux must read them back.
      */
    def mp4TrackSamples(n: Int, tid: Int): (Int, Int, Int, Int, Int, Int) = {
      val ns = 8 + ((n + 13 * tid) % 40)
      val n1 = ns / 2
      (ns, n1, 1 + n % 500, ns - n1, 1 + (3 * n + tid) % 500, 1 + (n + tid) % 7)
    }

    /** Sync-sample stride the builder writes into stss (every g-th
      * sample, 1-based, starting at 1) — the q362 plan reads it back.
      */
    def mp4SyncStride(n: Int, tid: Int): Int = 2 + ((n + tid) % 5)

    private def tkhdBox(tid: Int, duration: Int, width: Int, height: Int): Array[Byte] = {
      val p = new Array[Byte](84)
      writeBe32(p, 0, 0x00000007)
      writeBe32(p, 12, tid)
      writeBe32(p, 20, duration)
      writeBe32(p, 40, 0x00010000); writeBe32(p, 56, 0x00010000); writeBe32(p, 72, 0x40000000)
      writeBe32(p, 76, width << 16)
      writeBe32(p, 80, height << 16)
      mp4Box("tkhd", p)
    }

    /** [[buildMp4]] extended to FRAME granularity: each trak gains a
      * real mdia(mdhd, minf(stbl(stts, stsz, stsc))) subtree — the
      * decoding-time table (two stts runs), the sample-size table
      * (fixed-size mode on odd tracks, an explicit per-sample table on
      * even ones — both real ISO-BMFF modes), and the chunk map. This
      * is everything a keyframe-sampling plan reads without touching a
      * codec.
      */
    def buildMp4Sampled(timescale: Int, duration: Int, nTracks: Int, width: Int, height: Int, content: Array[Byte]): Array[Byte] = {
      val n = content.length
      val ftyp = {
        val p = new Array[Byte](12)
        "isom".getBytes(StandardCharsets.US_ASCII).copyToArray(p, 0)
        "isom".getBytes(StandardCharsets.US_ASCII).copyToArray(p, 8)
        mp4Box("ftyp", p)
      }
      val mvhd = {
        val p = new Array[Byte](100)
        writeBe32(p, 12, timescale)
        writeBe32(p, 16, duration)
        writeBe32(p, 20, 0x00010000)
        p(24) = 0x01
        writeBe32(p, 36, 0x00010000); writeBe32(p, 52, 0x00010000); writeBe32(p, 68, 0x40000000)
        writeBe32(p, 96, nTracks + 1)
        mp4Box("mvhd", p)
      }
      val traks = (1 to nTracks).map { tid =>
        val (ns, n1, d1, n2, d2, spc) = mp4TrackSamples(n, tid)
        val mdhd = {
          val p = new Array[Byte](24)
          writeBe32(p, 12, timescale)
          writeBe32(p, 16, n1 * d1 + n2 * d2)
          mp4Box("mdhd", p)
        }
        val stts = {
          val p = new Array[Byte](4 + 4 + 16)
          writeBe32(p, 4, 2)
          writeBe32(p, 8, n1); writeBe32(p, 12, d1)
          writeBe32(p, 16, n2); writeBe32(p, 20, d2)
          mp4Box("stts", p)
        }
        val stsz =
          if (tid % 2 == 1) {
            val p = new Array[Byte](12)
            writeBe32(p, 4, 64 + n % 1024) // fixed-size mode
            writeBe32(p, 8, ns)
            mp4Box("stsz", p)
          } else {
            val p = new Array[Byte](12 + 4 * ns)
            writeBe32(p, 4, 0) // table mode
            writeBe32(p, 8, ns)
            (0 until ns).foreach(i => writeBe32(p, 12 + 4 * i, 32 + ((n + 11 * i) % 992)))
            mp4Box("stsz", p)
          }
        val stsc = {
          val p = new Array[Byte](4 + 4 + 12)
          writeBe32(p, 4, 1)
          writeBe32(p, 8, 1); writeBe32(p, 12, spc); writeBe32(p, 16, 1)
          mp4Box("stsc", p)
        }
        val stss = {
          val g = mp4SyncStride(n, tid)
          val syncs = (1 to ns by g).toArray
          val p = new Array[Byte](8 + 4 * syncs.length)
          writeBe32(p, 4, syncs.length)
          syncs.indices.foreach(j => writeBe32(p, 8 + 4 * j, syncs(j)))
          mp4Box("stss", p)
        }
        val stbl = mp4Box("stbl", stts ++ stsz ++ stsc ++ stss)
        mp4Box("trak", tkhdBox(tid, duration, width, height) ++ mp4Box("mdia", mdhd ++ mp4Box("minf", stbl)))
      }
      val moov = mp4Box("moov", (mvhd +: traks).reduce(_ ++ _))
      ftyp ++ moov ++ mp4Box("mdat", content)
    }

    /** Child box offsets of the container at [start, end), or None on
      * any malformed size — the shared bounds-guarded walk.
      */
    private def childOffsets(b: Array[Byte], start: Int, end: Int): Option[List[Int]] = {
      var c = start
      val acc = List.newBuilder[Int]
      while (c + 8 <= end) {
        val sz = readBe32(b, c)
        // bound check in Long: a corrupt sz near 2^31 would wrap
        // c + sz negative in Int, pass the guard, and walk off the end
        if (sz < 8 || c.toLong + sz > end) return None
        acc += c
        c += sz
      }
      if (c != end) None else Some(acc.result())
    }

    /** The full demux (q359): per-track sample tables read back out of
      * the bytes — n_samples cross-checked between stts and stsz (a
      * mismatched pair is a corrupt track and drops), tick-exact
      * duration from the stts runs, byte totals from either stsz mode,
      * and the chunk count walked from the stsc runs. Corrupt payloads
      * yield no rows, never throw.
      */
    def decodeMp4Tracks(docId: Long, b: Array[Byte]): Seq[Mp4TrackMeta] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[Mp4TrackMeta]
      val top = childOffsets(b, 0, b.length).getOrElse(return Seq.empty)
      for (m <- top if boxType(b, m) == "moov") {
        val kids = childOffsets(b, m + 8, m + readBe32(b, m)).getOrElse(return Seq.empty)
        for (t <- kids if boxType(b, t) == "trak") {
          val tKids = childOffsets(b, t + 8, t + readBe32(b, t)).getOrElse(return Seq.empty)
          var trackId = -1
          var mTs = 0
          var nStts = 0L
          var ticks = 0L
          var nStsz = -1
          var totalBytes = 0L
          var chunksBeforeLast = 0L
          var coveredBeforeLast = 0L
          var lastSpc = -1
          for (c <- tKids) boxType(b, c) match {
            case "tkhd" if readBe32(b, c) >= 8 + 84 =>
              trackId = readBe32(b, c + 8 + 12)
            case "mdia" =>
              for (mc <- childOffsets(b, c + 8, c + readBe32(b, c)).getOrElse(return Seq.empty))
                boxType(b, mc) match {
                  case "mdhd" if readBe32(b, mc) >= 8 + 24 =>
                    mTs = readBe32(b, mc + 8 + 12)
                  case "minf" =>
                    for (
                      sc <- childOffsets(b, mc + 8, mc + readBe32(b, mc)).getOrElse(return Seq.empty)
                      if boxType(b, sc) == "stbl";
                      sb <- childOffsets(b, sc + 8, sc + readBe32(b, sc)).getOrElse(return Seq.empty)
                    ) boxType(b, sb) match {
                      case "stts" =>
                        val ec = readBe32(b, sb + 12)
                        // entry-count guards compare in Long: an
                        // attacker-controlled count near 2^30 wraps the
                        // Int product negative and slips past an Int
                        // comparison, turning the documented "corrupt
                        // payloads yield no rows" contract into an
                        // ArrayIndexOutOfBoundsException
                        if (ec < 0 || 16 + 8L * ec > readBe32(b, sb)) return Seq.empty
                        (0 until ec).foreach { e =>
                          val cnt = readBe32(b, sb + 16 + 8 * e)
                          nStts += cnt
                          ticks += cnt.toLong * readBe32(b, sb + 20 + 8 * e)
                        }
                      case "stsz" =>
                        val ss = readBe32(b, sb + 12)
                        nStsz = readBe32(b, sb + 16)
                        if (nStsz < 0) return Seq.empty
                        if (ss != 0) totalBytes = ss.toLong * nStsz
                        else {
                          if (20 + 4L * nStsz > readBe32(b, sb)) return Seq.empty
                          (0 until nStsz).foreach(i => totalBytes += readBe32(b, sb + 20 + 4 * i))
                        }
                      case "stsc" =>
                        val ec = readBe32(b, sb + 12)
                        if (ec <= 0 || 16 + 12L * ec > readBe32(b, sb)) return Seq.empty
                        // runs: entry e covers chunks first_e .. first_{e+1}-1
                        // at spc_e each; the LAST run's extent is resolved
                        // against the stts sample total AFTER the walk
                        // (box order inside stbl is writer-dependent)
                        (0 until ec - 1).foreach { e =>
                          val run = readBe32(b, sb + 16 + 12 * (e + 1)) - readBe32(b, sb + 16 + 12 * e)
                          chunksBeforeLast += run
                          coveredBeforeLast += run.toLong * readBe32(b, sb + 20 + 12 * e)
                        }
                        lastSpc = readBe32(b, sb + 20 + 12 * (ec - 1))
                      case _ => ()
                    }
                  case _ => ()
                }
            case _ => ()
          }
          val nChunks =
            if (lastSpc <= 0) -1
            else (chunksBeforeLast + (math.max(0L, nStts - coveredBeforeLast) + lastSpc - 1) / lastSpc).toInt
          if (trackId > 0 && mTs > 0 && nStts > 0 && nStts == nStsz && nChunks > 0)
            out += Mp4TrackMeta(
              docId,
              trackId,
              mTs,
              nStts.toInt,
              ticks,
              ticks * 1000L / mTs,
              totalBytes,
              totalBytes / nStts,
              nChunks
            )
        }
      }
      out.toSeq
    }

    /** The keyframe FETCH plan (q362): stss sync indices resolved
      * against stsz byte offsets — per track, how many samples a
      * keyframe-only read touches, their total bytes, the offset of
      * the last one, and the fetched fraction of the track. Sample
      * sizes come from either stsz mode; offsets are prefix sums over
      * the per-track table (≤ sample-count work in the JVM, map-side).
      */
    def decodeKeyframePlans(docId: Long, b: Array[Byte]): Seq[KeyframePlan] = {
      val out = scala.collection.mutable.ArrayBuffer.empty[KeyframePlan]
      val top = childOffsets(b, 0, b.length).getOrElse(return Seq.empty)
      for (m <- top if boxType(b, m) == "moov") {
        val kids = childOffsets(b, m + 8, m + readBe32(b, m)).getOrElse(return Seq.empty)
        for (t <- kids if boxType(b, t) == "trak") {
          val tKids = childOffsets(b, t + 8, t + readBe32(b, t)).getOrElse(return Seq.empty)
          var trackId = -1
          var sizes: Array[Long] = null
          var syncs: Array[Int] = null
          for (c <- tKids) boxType(b, c) match {
            case "tkhd" if readBe32(b, c) >= 8 + 84 =>
              trackId = readBe32(b, c + 8 + 12)
            case "mdia" =>
              for (
                mc <- childOffsets(b, c + 8, c + readBe32(b, c)).getOrElse(return Seq.empty)
                if boxType(b, mc) == "minf";
                sc <- childOffsets(b, mc + 8, mc + readBe32(b, mc)).getOrElse(return Seq.empty)
                if boxType(b, sc) == "stbl";
                sb <- childOffsets(b, sc + 8, sc + readBe32(b, sc)).getOrElse(return Seq.empty)
              ) boxType(b, sb) match {
                case "stsz" =>
                  val ss = readBe32(b, sb + 12)
                  val cnt = readBe32(b, sb + 16)
                  // negative counts throw from Array.fill/tabulate and
                  // Int-wrapped bound products slip the guard — reject
                  // both up front, compare in Long (same contract as
                  // the demux: corrupt payloads drop, never throw)
                  if (cnt < 0) return Seq.empty
                  if (ss != 0) sizes = Array.fill(cnt)(ss.toLong)
                  else {
                    if (20 + 4L * cnt > readBe32(b, sb)) return Seq.empty
                    sizes = Array.tabulate(cnt)(i => readBe32(b, sb + 20 + 4 * i).toLong)
                  }
                case "stss" =>
                  val cnt = readBe32(b, sb + 12)
                  if (cnt < 0 || 16 + 4L * cnt > readBe32(b, sb)) return Seq.empty
                  syncs = Array.tabulate(cnt)(j => readBe32(b, sb + 16 + 4 * j))
                case _ => ()
              }
            case _ => ()
          }
          if (trackId > 0 && sizes != null && syncs != null && syncs.nonEmpty &&
            syncs.forall(i => i >= 1 && i <= sizes.length)) {
            val offsets = sizes.scanLeft(0L)(_ + _) // offsets(i) = bytes before 1-based sample i+1
            val planned = syncs.map(i => sizes(i - 1)).sum
            val total = sizes.sum
            // all-zero sample sizes (corrupt): drop the track rather
            // than divide by zero in the permille below
            if (total > 0) out += KeyframePlan(
              docId,
              trackId,
              sizes.length,
              syncs.length,
              if (syncs.length >= 2) syncs(1) - syncs(0) else 0,
              planned,
              total,
              offsets(syncs.last - 1),
              planned * 1000L / total
            )
          }
        }
      }
      out.toSeq
    }
  }

  /** Media-ingest boundary: wrap each document's bytes in a real
    * container — PNG / JPEG / animated GIF / raw round-robin by doc_id
    * — with the dimensions [[MediaCodec.dims]] derives from content
    * size (in production these are the camera's; here they must be
    * arithmetic so the oracle can verify the decoder recovers them
    * bit-exactly; likewise the GIF's embedded frame count, which the
    * decoder must parse back out of the block structure). Typed
    * mapPartitions: payload construction is per-partition work, exactly
    * like the decode.
    */
  def withMediaPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val content = text.getBytes(StandardCharsets.UTF_8)
        val (w, h) = MediaCodec.dims(content.length)
        val payload = (id % 4) match {
          case 0 => MediaCodec.buildPng(w, h, content)
          case 1 => MediaCodec.buildJpeg(w, h, content)
          case 2 => MediaCodec.buildGif(w, h, 1 + content.length % 7, content)
          case _ => content
        }
        (id, payload)
      })
      .toDF("doc_id", "payload")
  }

  /** Per-partition decode: binary in, typed metadata out. */
  def decodeMetadata(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => MediaCodec.decode(id, bytes) })
  }

  /** Resize planning (metadata transform): clamp each media item to a
    * `maxDim` bounding box preserving aspect ratio — integer floor
    * arithmetic, so the oracle mirrors it exactly. The payload itself
    * passes through untouched (a real resampler would rewrite it in the
    * same per-partition kernel as the decode); the point at scale is
    * that resize PLANNING is metadata-only — the binary column is
    * neither read nor shuffled to decide target dimensions.
    */
  final case class ResizeMeta(doc_id: Long, width: Int, height: Int, new_width: Int, new_height: Int)

  def resizePlan(media: DataFrame, maxDim: Int): Dataset[ResizeMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeMetadata(media).map { m =>
      val mx = math.max(m.width, m.height)
      if (mx <= maxDim) ResizeMeta(m.doc_id, m.width, m.height, m.width, m.height)
      else ResizeMeta(m.doc_id, m.width, m.height, m.width * maxDim / mx, m.height * maxDim / mx)
    }
  }

  /** One row per sampled frame (generator/UDTF shape): frame index plus
    * its byte offset into the payload — the row-explosion pattern a
    * real frame sampler produces (frame count from
    * [[MediaCodec.frameCount]]). Offsets are integer arithmetic on
    * payload size, so the oracle mirrors them exactly.
    */
  /** Audio-ingest boundary: every document's bytes as a real PCM WAV
    * (RIFF/fmt/data, parameters [[MediaCodec.audioParams]] derives from
    * content size so the oracle can verify the demux recovers them
    * bit-exactly). Same per-partition shape as [[withMediaPayload]].
    */
  def withAudioPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val content = text.getBytes(StandardCharsets.UTF_8)
        val (rate, channels, bits) = MediaCodec.audioParams(content.length)
        (id, MediaCodec.buildWav(rate, channels, bits, content))
      })
      .toDF("doc_id", "payload")
  }

  /** Per-partition WAV demux: binary in, typed audio metadata out —
    * rows whose payload is not a parseable WAV are dropped (flatMap),
    * the corrupt-input posture of a production decode stage.
    */
  def decodeAudio(media: DataFrame): Dataset[AudioMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => MediaCodec.decodeWav(id, bytes) })
  }

  /** MP4 ingest boundary: each document's bytes wrapped in a real
    * ISO-BMFF container with [[MediaCodec.mp4Params]]-derived movie
    * parameters and [[MediaCodec.dims]] track dimensions.
    */
  def withVideoPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val content = text.getBytes(StandardCharsets.UTF_8)
        val (ts, tracks, duration) = MediaCodec.mp4Params(content.length)
        val (w, h) = MediaCodec.dims(content.length)
        (id, MediaCodec.buildMp4(ts, duration, tracks, w, h, content))
      })
      .toDF("doc_id", "payload")
  }

  /** Per-partition MP4 demux: binary in, typed movie metadata out —
    * unparseable payloads are dropped (flatMap), the corrupt-input
    * posture of a production decode stage.
    */
  def decodeVideo(media: DataFrame): Dataset[Mp4Meta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => MediaCodec.decodeMp4(id, bytes) })
  }

  /** The sample-table ingest boundary (q359): [[withVideoPayload]]'s
    * parameters with a full stbl subtree per trak.
    */
  def withSampledVideoPayload(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .mapPartitions(_.map { case (id, text) =>
        val content = text.getBytes(StandardCharsets.UTF_8)
        val (ts, tracks, duration) = MediaCodec.mp4Params(content.length)
        val (w, h) = MediaCodec.dims(content.length)
        (id, MediaCodec.buildMp4Sampled(ts, duration, tracks, w, h, content))
      })
      .toDF("doc_id", "payload")
  }

  /** Per-partition full demux: one typed row per (doc, track) out of
    * the stts/stsz/stsc walk; corrupt payloads drop (flatMap).
    */
  def decodeVideoTracks(media: DataFrame): Dataset[Mp4TrackMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => MediaCodec.decodeMp4Tracks(id, bytes) })
  }

  /** Per-partition keyframe-plan extraction (q362). */
  def decodeKeyframePlans(media: DataFrame): Dataset[KeyframePlan] = {
    val spark = media.sparkSession
    import spark.implicits._
    media
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) => MediaCodec.decodeKeyframePlans(id, bytes) })
  }

  def sampleFrames(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    decodeMetadata(media)
      .flatMap { m =>
        val stride = m.n_bytes / m.n_frames
        (0 until m.n_frames).map(i => (m.doc_id, i, i * stride, m.width, m.height))
      }
      .toDF("doc_id", "frame_idx", "byte_offset", "width", "height")
  }
}
