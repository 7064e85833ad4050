package graft.operators

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Deflater}

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media payloads are opaque `binary` columns
  * with typed metadata alongside. The Spark-side machinery — schema, batch
  * iteration shape (mapPartitions = the Scala analog of mapInPandas batches),
  * partition-parallel decode, metadata projection — is real and tested, and
  * the codecs operate on REAL container bytes end-to-end: payloads are
  * hand-encoded but structurally valid PNG / WAV / BMP files (correct magic
  * numbers, chunk/RIFF layout, CRCs, little/big-endian header fields),
  * `decodeMedia` dispatches on the magic bytes and parses width / height /
  * sample rate / frame count out of the actual headers, and the pixel/sample
  * layer is fully decoded for all three formats:
  *  - BMP: 24bpp padded pixel rows, read/written directly
  *  - WAV: 16-bit PCM sample frames from the data chunk
  *  - PNG: 8-bit truecolor scanlines — a real spec codec built on the JDK's
  *    zlib (java.util.zip.Deflater/Inflater) plus scanline filtering: the
  *    encoder filters each row with filter type y mod 5 (exercising None /
  *    Sub / Up / Average / Paeth) before deflating into IDAT, and the
  *    decoder inflates the concatenated IDAT stream and unfilters per the
  *    PNG specification (no codec library ships in this container; the
  *    filter arithmetic is ~60 lines of spec math, fixture-tested per type).
  * No stubs remain. Every decoder treats header fields as untrusted:
  * corrupt/truncated blobs yield "unknown" / no-feature sentinels, never a
  * task failure or an unbounded loop/allocation.
  */
object Multimodal {

  final case class MediaMeta(
      doc_id: Long,
      n_bytes: Long,
      media_type: String,
      width: Int,
      height: Int,
      n_frames: Int,
      sample_rate: Int)

  private def mix(x: Long): Long = graft.sources.TranscriptGen.mix(x)
  private def pick(h: Long, mod: Int): Int =
    java.lang.Long.remainderUnsigned(h, mod.toLong).toInt

  // ------------------------------------------------------------- encoders
  // Tiny but structurally real containers, deterministic per doc. These are
  // the synth-time stand-ins for actual media files (nothing in the sandbox
  // can produce real photographs); every header field below is the genuine
  // on-disk encoding a real decoder would read.

  // ---------------------------------------------------------- PNG codec
  // 8-bit truecolor (color type 2), bpp = 3. Spec references: PNG 1.2 §6
  // (filter algorithms) and §9 (Paeth predictor).

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a); val pb = math.abs(p - b); val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  /** filter raw top-down RGB rows into the PNG scanline stream: each row is
    * one filter-type byte + width*3 filtered bytes; filter type = y mod 5 so
    * every encoded image exercises all five spec filters
    */
  private[operators] def pngFilterScanlines(width: Int, height: Int, raw: Array[Byte]): Array[Byte] = {
    val stride = width * 3
    val out = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      val ft = y % 5
      out(y * (stride + 1)) = ft.toByte
      var i = 0
      while (i < stride) {
        val cur = raw(y * stride + i) & 0xff
        val left = if (i >= 3) raw(y * stride + i - 3) & 0xff else 0
        val up = if (y > 0) raw((y - 1) * stride + i) & 0xff else 0
        val ul = if (y > 0 && i >= 3) raw((y - 1) * stride + i - 3) & 0xff else 0
        val pred = ft match {
          case 0 => 0
          case 1 => left
          case 2 => up
          case 3 => (left + up) / 2
          case _ => paeth(left, up, ul)
        }
        out(y * (stride + 1) + 1 + i) = ((cur - pred) & 0xff).toByte
        i += 1
      }
      y += 1
    }
    out
  }

  private def deflateAll(data: Array[Byte]): Array[Byte] = {
    val deflater = new Deflater()
    deflater.setInput(data); deflater.finish()
    // drain until finished: one deflate() call can under-fill for
    // incompressible payloads (stored-block overhead) and would silently
    // truncate the stream
    val out = new java.io.ByteArrayOutputStream(data.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!deflater.finished()) out.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    out.toByteArray
  }

  private def pngChunk(typ: String, data: Array[Byte]): Array[Byte] = {
    val t = typ.getBytes(StandardCharsets.US_ASCII)
    val bb = ByteBuffer.allocate(12 + data.length).order(ByteOrder.BIG_ENDIAN)
    bb.putInt(data.length).put(t).put(data)
    val crc = new CRC32
    crc.update(t); crc.update(data)
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** PNG from raw top-down RGB pixel rows (width*height*3 bytes): signature
    * + IHDR + IDAT (zlib of the FILTERED scanline stream) + IEND, each chunk
    * with its correct big-endian length and CRC32.
    */
  private[operators] def encodePngPixels(width: Int, height: Int, raw: Array[Byte]): Array[Byte] = {
    require(raw.length == width * height * 3, s"raw pixels ${raw.length} != $width x $height x 3")
    val ihdr = ByteBuffer.allocate(13).order(ByteOrder.BIG_ENDIAN)
      .putInt(width).putInt(height)
      .put(8.toByte)  // bit depth
      .put(2.toByte)  // color type: truecolor
      .put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
      .array()
    val idat = deflateAll(pngFilterScanlines(width, height, raw))
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    sig ++ pngChunk("IHDR", ihdr) ++ pngChunk("IDAT", idat) ++ pngChunk("IEND", Array.empty)
  }

  /** synth-time entry: pixel bytes cycled from the payload (same convention
    * as the BMP encoder), then the real filter+deflate pipeline above
    */
  private[operators] def encodePng(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val raw = new Array[Byte](width * height * 3)
    if (payload.nonEmpty) {
      var i = 0
      while (i < raw.length) { raw(i) = payload(i % payload.length); i += 1 }
    }
    encodePngPixels(width, height, raw)
  }

  // decoded-pixel cap: our synth images top out near 1 MB of raw pixels; an
  // adversarial IHDR claiming giant dimensions must not drive allocation
  private val MaxPngPixelBytes = 1 << 26 // 64 MB

  /** Decode a PNG produced by any conforming encoder of 8-bit truecolor
    * non-interlaced images: inflate the concatenated IDAT stream, unfilter
    * every scanline (filter types 0-4), return raw top-down RGB rows.
    * Returns (width, height, pixels), or null for anything corrupt,
    * truncated, unsupported (other bit depths / color types / interlacing),
    * or oversized — never a throw, never an unbounded loop.
    */
  private[operators] def decodePngPixels(bytes: Array[Byte]): (Int, Int, Array[Byte]) = {
    if (bytes.length < 33 || bytes(0) != 0x89.toByte || !ascii(bytes, 1, "PNG") ||
        !ascii(bytes, 12, "IHDR")) return null
    val w = beInt(bytes, 16)
    val h = beInt(bytes, 20)
    val depth = bytes(24) & 0xff
    val colorType = bytes(25) & 0xff
    val interlace = bytes(28) & 0xff
    if (w <= 0 || h <= 0 || depth != 8 || colorType != 2 || interlace != 0) return null
    // bound the dimensions BEFORE forming products: 2^31-ish header values
    // would overflow even the Long arithmetic of the byte-count guard
    if (w > (1 << 15) || h > (1 << 15)) return null
    val stride = w.toLong * 3
    val filteredLen = (stride + 1) * h
    if (stride * h > MaxPngPixelBytes) return null
    // walk chunks (guarded like the RIFF walk), concatenating IDAT data —
    // the spec allows the zlib stream to be split across multiple IDATs
    val idat = new java.io.ByteArrayOutputStream(256)
    var off = 8
    var ok = true
    while (ok && off + 8 <= bytes.length) {
      val len = beInt(bytes, off)
      // Long arithmetic: a near-MaxInt declared length would wrap the Int
      // sum negative and slip past the guard it exists for
      if (len < 0 || off.toLong + 12 + len > bytes.length) ok = false
      else {
        if (ascii(bytes, off + 4, "IDAT")) idat.write(bytes, off + 8, len)
        off += 12 + len
      }
    }
    if (idat.size() == 0) return null
    val filt = new Array[Byte](filteredLen.toInt)
    val inflater = new java.util.zip.Inflater()
    try {
      inflater.setInput(idat.toByteArray)
      var got = 0
      var n = -1
      while (got < filt.length && n != 0 && !inflater.finished()) {
        n = inflater.inflate(filt, got, filt.length - got)
        got += n
      }
      if (got != filt.length) return null // truncated stream
    } catch {
      case _: java.util.zip.DataFormatException => return null
    } finally inflater.end()
    // unfilter in place: each reconstructed row feeds the next row's
    // predictors (PNG 1.2 §6.2-6.6). The filter type is dispatched ONCE per
    // row into a specialized byte loop — a per-byte match costs 2-3x on the
    // 100s-of-MB pixel streams this stage decodes.
    val s = stride.toInt
    val raw = new Array[Byte](s * h)
    var y = 0
    while (y < h) {
      val ft = filt(y * (s + 1)) & 0xff
      if (ft > 4) return null
      val src = y * (s + 1) + 1
      val dst = y * s
      val prior = dst - s // valid only when y > 0
      var i = 0
      ft match {
        case 0 =>
          System.arraycopy(filt, src, raw, dst, s)
        case 1 =>
          while (i < s) {
            val left = if (i >= 3) raw(dst + i - 3) & 0xff else 0
            raw(dst + i) = (((filt(src + i) & 0xff) + left) & 0xff).toByte
            i += 1
          }
        case 2 =>
          if (y == 0) System.arraycopy(filt, src, raw, dst, s)
          else while (i < s) {
            raw(dst + i) = (((filt(src + i) & 0xff) + (raw(prior + i) & 0xff)) & 0xff).toByte
            i += 1
          }
        case 3 =>
          while (i < s) {
            val left = if (i >= 3) raw(dst + i - 3) & 0xff else 0
            val up = if (y > 0) raw(prior + i) & 0xff else 0
            raw(dst + i) = (((filt(src + i) & 0xff) + (left + up) / 2) & 0xff).toByte
            i += 1
          }
        case _ =>
          while (i < s) {
            val left = if (i >= 3) raw(dst + i - 3) & 0xff else 0
            val up = if (y > 0) raw(prior + i) & 0xff else 0
            val ul = if (y > 0 && i >= 3) raw(prior + i - 3) & 0xff else 0
            raw(dst + i) = (((filt(src + i) & 0xff) + paeth(left, up, ul)) & 0xff).toByte
            i += 1
          }
      }
      y += 1
    }
    (w, h, raw)
  }

  /** REAL nearest-neighbor resize of a PNG payload: decode the actual
    * scanlines, sample to the target dimensions, re-encode through the
    * filter+deflate pipeline. Null for undecodable input.
    */
  private[operators] def resizePng(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val decoded = decodePngPixels(bytes)
    if (decoded == null) return null
    val (w, h, raw) = decoded
    val out = new Array[Byte](tw * th * 3)
    var ty = 0
    while (ty < th) {
      val sy = (ty.toLong * h / th).toInt
      var tx = 0
      while (tx < tw) {
        val sx = (tx.toLong * w / tw).toInt
        val src = sy * w * 3 + sx * 3
        val dst = ty * tw * 3 + tx * 3
        out(dst) = raw(src); out(dst + 1) = raw(src + 1); out(dst + 2) = raw(src + 2)
        tx += 1
      }
      ty += 1
    }
    encodePngPixels(tw, th, out)
  }

  /** WAV: RIFF/WAVE with a 16-byte PCM fmt chunk and a data chunk of the
    * payload truncated to whole sample frames — all sizes little-endian.
    */
  private[operators] def encodeWav(channels: Int, sampleRate: Int, payload: Array[Byte]): Array[Byte] = {
    val blockAlign = channels * 2 // 16-bit PCM
    val dataLen = (payload.length / blockAlign) * blockAlign
    val bb = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes(StandardCharsets.US_ASCII)).putInt(36 + dataLen)
      .put("WAVE".getBytes(StandardCharsets.US_ASCII))
      .put("fmt ".getBytes(StandardCharsets.US_ASCII)).putInt(16)
      .putShort(1)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * blockAlign)   // byte rate
      .putShort(blockAlign.toShort)
      .putShort(16)                      // bits per sample
      .put("data".getBytes(StandardCharsets.US_ASCII)).putInt(dataLen)
      .put(payload, 0, dataLen)
    bb.array()
  }

  /** BMP: BITMAPFILEHEADER + BITMAPINFOHEADER (40-byte, 24bpp) + pixel rows
    * padded to 4 bytes, pixels cycled from the payload. A fully valid file.
    */
  private[operators] def encodeBmp(width: Int, height: Int, payload: Array[Byte]): Array[Byte] = {
    val rowSize = ((width * 3 + 3) / 4) * 4
    val pixelBytes = rowSize * height
    val bb = ByteBuffer.allocate(54 + pixelBytes).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + pixelBytes)
      .putShort(0).putShort(0).putInt(54) // reserved + pixel offset
      .putInt(40).putInt(width).putInt(height)
      .putShort(1)                        // planes
      .putShort(24)                       // bpp
      .putInt(0)                          // BI_RGB
      .putInt(pixelBytes).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var i = 0
    while (i < pixelBytes) {
      bb.put(if (payload.isEmpty) 0.toByte else payload(i % payload.length))
      i += 1
    }
    bb.array()
  }

  /** Deterministic per-doc media payload: format, dimensions, and rate are
    * splitmix functions of doc_id; the document text supplies the body bytes.
    */
  def encodeMedia(docId: Long, text: String): Array[Byte] = {
    val payload = text.getBytes(StandardCharsets.UTF_8)
    val h = mix(docId * 7919L + 1L)
    val h2 = mix(docId * 7919L + 2L)
    pick(mix(docId), 3) match {
      case 0 => encodePng(16 + pick(h, 600), 16 + pick(h2, 400), payload)
      case 1 =>
        val rates = Array(8000, 16000, 22050, 44100)
        encodeWav(1 + pick(h, 2), rates(pick(h2, rates.length)), payload)
      case _ => encodeBmp(4 * (1 + pick(h, 40)), 1 + pick(h2, 40), payload)
    }
  }

  // ----------------------------------------------------------- transforms
  /** REAL nearest-neighbor resize of a BMP payload: decodes the actual
    * 24bpp pixel rows (4-byte padded, stored bottom-up), samples them to the
    * target dimensions, and re-encodes a valid BMP. (PNG takes the same
    * resize shape through its own inflate/unfilter/refilter codec —
    * resizePng.)
    */
  private[operators] def resizeBmp(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
    val w = leInt(bytes, 18)
    val h = math.abs(leInt(bytes, 22))
    val pixelOffset = leInt(bytes, 10)
    // row size in LONG: w near MaxInt/3 wraps w*3 negative in Int and a
    // negative h*rowSize product would sail under the truncation guard
    val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4
    // untrusted header: truncated pixel data → null (caller drops the row)
    if (w <= 0 || h <= 0 || pixelOffset < 0 ||
        pixelOffset.toLong + h.toLong * rowSizeL > bytes.length) return null
    val rowSize = rowSizeL.toInt // fits: bounded by bytes.length above
    val outRowSize = ((tw * 3 + 3) / 4) * 4
    val out = new Array[Byte](outRowSize * th)
    var ty = 0
    while (ty < th) {
      val sy = ty.toLong * h / th
      var tx = 0
      while (tx < tw) {
        val sx = tx.toLong * w / tw
        val src = pixelOffset + sy.toInt * rowSize + sx.toInt * 3
        val dst = ty * outRowSize + tx * 3
        out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
        tx += 1
      }
      ty += 1
    }
    val bb = ByteBuffer.allocate(54 + out.length).order(ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(54 + out.length)
      .putShort(0).putShort(0).putInt(54)
      .putInt(40).putInt(tw).putInt(th)
      .putShort(1).putShort(24).putInt(0)
      .putInt(out.length).putInt(2835).putInt(2835).putInt(0).putInt(0)
      .put(out)
    bb.array()
  }

  /** REAL frame decimation of a WAV payload: keeps every k-th PCM sample
    * frame from the actual data chunk and re-encodes with the proportionally
    * reduced sample rate (duration-preserving downsample). Frame count of
    * the result is ceil(frames / k).
    */
  private[operators] def sampleWavFrames(bytes: Array[Byte], k: Int): Array[Byte] = {
    var off = 12
    var sampleRate = 0
    var channels = 1
    var blockAlign = 0
    var dataOff = -1
    var dataLen = 0
    var ok = true
    while (ok && off + 8 <= bytes.length) {
      val size = leInt(bytes, off + 4)
      // a negative or overrunning declared size means a corrupt/truncated
      // chunk: stop the walk (a size of -8 would otherwise pin `off` in
      // place and spin the executor thread forever; the sum is Long so a
      // near-MaxInt size can't wrap negative past the guard)
      if (size < 0 || off.toLong + 8 + size > bytes.length) ok = false
      else {
        if (ascii(bytes, off, "fmt ") && off + 24 <= bytes.length) {
          channels = leShort(bytes, off + 10)
          sampleRate = leInt(bytes, off + 12)
          blockAlign = leShort(bytes, off + 20)
        } else if (ascii(bytes, off, "data")) { dataOff = off + 8; dataLen = size }
        off += 8 + size + (size & 1)
      }
    }
    // corrupt fmt: channels <= 0 with a nonzero blockAlign would send a
    // zero-channel spec into encodeWav, whose blockAlign = channels*2 = 0
    // divides payload.length — the one arithmetic fault a crafted header
    // could still raise here (ADVICE r4). Null = caller drops the row.
    if (channels <= 0) return null
    val frames = if (blockAlign > 0) dataLen / blockAlign else 0
    val kept = (frames + k - 1) / k
    val sampled = new Array[Byte](kept * blockAlign)
    var i = 0
    while (i < kept) {
      System.arraycopy(bytes, dataOff + i * k * blockAlign, sampled, i * blockAlign, blockAlign)
      i += 1
    }
    encodeWav(channels, sampleRate / k, sampled)
  }

  /** Resize / frame-sample stage over the binary column (mapPartitions
    * batches): BMP and PNG payloads are pixel-resized to (targetW, targetH)
    * — PNG through the full inflate/unfilter/refilter/deflate codec — and
    * WAV payloads are decimated by `frameStride`; the emitted metadata comes
    * from DECODING THE TRANSFORMED BYTES, so a header-arithmetic oracle
    * cross-checks the real byte transforms. Undecodable blobs are dropped,
    * never a task failure.
    */
  def transformMedia(docsWithPayload: DataFrame, targetW: Int = 32, targetH: Int = 24,
      frameStride: Int = 4): Dataset[MediaMeta] = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, bytes) =>
        decodeMedia(id, bytes).media_type match {
          case "bmp" => Option(resizeBmp(bytes, targetW, targetH)).map(decodeMedia(id, _))
          case "png" => Option(resizePng(bytes, targetW, targetH)).map(decodeMedia(id, _))
          case "wav" => Option(sampleWavFrames(bytes, frameStride)).map(decodeMedia(id, _))
          case _ => None
        }
      })
  }

  /** REAL feature extraction from the payload bytes, integer-exact so the
    * pinned-oracle compare is never float-hash-fragile:
    *  - BMP: mean pixel-channel intensity over the actual pixel rows
    *    (excluding row padding), in 1/1000 units
    *  - PNG: mean pixel-channel intensity over the inflated + unfiltered
    *    scanlines, in 1/1000 units
    *  - WAV: mean absolute 16-bit sample amplitude over the actual data
    *    chunk, in 1/1000 units
    *  - other / undecodable: -1
    */
  def featMilli(bytes: Array[Byte]): Long = {
    if (bytes.length >= 26 && ascii(bytes, 0, "BM")) {
      val w = leInt(bytes, 18)
      val h = math.abs(leInt(bytes, 22))
      val pixelOffset = leInt(bytes, 10)
      val rowSizeL = ((w.toLong * 3 + 3) / 4) * 4 // Long: w*3 can wrap Int
      // header fields are untrusted: a truncated/corrupt payload must yield
      // the no-feature sentinel, not an out-of-bounds task failure
      if (w <= 0 || h <= 0 || pixelOffset < 0 ||
          pixelOffset.toLong + h.toLong * rowSizeL > bytes.length) return -1L
      val rowSize = rowSizeL.toInt // fits: bounded by bytes.length above
      var sum = 0L
      var y = 0
      while (y < h) {
        var i = pixelOffset + y * rowSize
        val end = i + w * 3
        while (i < end) { sum += (bytes(i) & 0xff); i += 1 }
        y += 1
      }
      val n = w.toLong * h * 3
      if (n == 0) -1L else sum * 1000L / n
    } else if (bytes.length >= 24 && bytes(0) == 0x89.toByte && ascii(bytes, 1, "PNG")) {
      val decoded = decodePngPixels(bytes)
      if (decoded == null) -1L
      else {
        val raw = decoded._3
        var sum = 0L
        var i = 0
        while (i < raw.length) { sum += (raw(i) & 0xff); i += 1 }
        if (raw.length == 0) -1L else sum * 1000L / raw.length
      }
    } else if (bytes.length >= 44 && ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE")) {
      var off = 12
      var dataOff = -1
      var dataLen = 0
      var ok = true
      while (ok && off + 8 <= bytes.length) {
        val size = leInt(bytes, off + 4)
        if (size < 0 || off.toLong + 8 + size > bytes.length) ok = false // corrupt chunk: stop
        else {
          if (ascii(bytes, off, "data")) { dataOff = off + 8; dataLen = size }
          off += 8 + size + (size & 1)
        }
      }
      val samples = dataLen / 2
      if (samples == 0) -1L
      else {
        var sum = 0L
        var i = 0
        while (i < samples) {
          val v = ((bytes(dataOff + 2 * i) & 0xff) | (bytes(dataOff + 2 * i + 1) << 8)).toShort
          sum += math.abs(v.toLong)
          i += 1
        }
        sum * 1000L / samples
      }
    } else -1L
  }

  /** feature-extract stage over the binary column (mapPartitions batches) */
  def extractFeatures(docsWithPayload: DataFrame): DataFrame = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        (id, decodeMedia(id, bytes).media_type, featMilli(bytes))
      })
      .toDF("doc_id", "media_type", "feat_milli")
  }

  // -------------------------------------------------------------- decoder
  private def beInt(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) | ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)
  private def leInt(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) | ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def leShort(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  private def ascii(b: Array[Byte], off: Int, s: String): Boolean =
    b.length >= off + s.length && s.indices.forall(i => b(off + i) == s.charAt(i).toByte)

  /** Header decode from actual bytes: magic-number dispatch, then the
    * format's real field offsets/endianness. Unknown/truncated payloads come
    * back as media_type="unknown" with zeroed fields (never a throw — one
    * bad blob must not kill a 100 TB stage).
    */
  def decodeMedia(docId: Long, bytes: Array[Byte]): MediaMeta = {
    val n = bytes.length.toLong
    def meta(t: String, w: Int = 0, h: Int = 0, fr: Int = 0, sr: Int = 0) =
      MediaMeta(docId, n, t, w, h, fr, sr)
    if (bytes.length >= 24 && bytes(0) == 0x89.toByte && ascii(bytes, 1, "PNG") &&
        ascii(bytes, 12, "IHDR")) {
      meta("png", w = beInt(bytes, 16), h = beInt(bytes, 20), fr = 1)
    } else if (bytes.length >= 44 && ascii(bytes, 0, "RIFF") && ascii(bytes, 8, "WAVE")) {
      // walk RIFF chunks for fmt/data — their order is not fixed by the spec
      var off = 12
      var sampleRate = 0
      var blockAlign = 0
      var dataLen = 0
      var ok = true
      while (ok && off + 8 <= bytes.length) {
        val size = leInt(bytes, off + 4)
        // corrupt/adversarial declared size (negative, or past the payload
        // end): stop the walk rather than loop forever or read out of
        // bounds — Long sum so near-MaxInt sizes can't wrap past the guard
        if (size < 0 || off.toLong + 8 + size > bytes.length) ok = false
        else {
          if (ascii(bytes, off, "fmt ") && off + 24 <= bytes.length) {
            sampleRate = leInt(bytes, off + 12)
            blockAlign = leShort(bytes, off + 20)
          } else if (ascii(bytes, off, "data")) {
            dataLen = size
          }
          off += 8 + size + (size & 1) // RIFF chunks are 2-byte aligned
        }
      }
      meta("wav", fr = if (blockAlign > 0) dataLen / blockAlign else 0, sr = sampleRate)
    } else if (bytes.length >= 26 && ascii(bytes, 0, "BM")) {
      meta("bmp", w = leInt(bytes, 18), h = math.abs(leInt(bytes, 22)), fr = 1)
    } else meta("unknown")
  }

  /** Attach the binary payload column — the schema/write path any media
    * ingest job would use. Encoded inside mapPartitions (not a UDF): the
    * deterministic-UDF inlining trap re-evaluates expensive functions per
    * downstream reference (graft-spark-codegen-traps #1).
    */
  def withPayload(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)]
      .mapPartitions(_.map { case (id, text) => (id, encodeMedia(id, text)) })
      .toDF("doc_id", "payload")
  }

  /** Batched partition-parallel decode — the mapInPandas-shaped stage, now
    * reading real container headers out of the binary column.
    */
  def decodeMeta(docsWithPayload: DataFrame): Dataset[MediaMeta] = {
    val spark = docsWithPayload.sparkSession
    import spark.implicits._
    docsWithPayload
      .select(col("doc_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) => decodeMedia(id, bytes) })
  }

  /** Pure-column stand-in metadata (no UDF, codegen'd) used by the
    * SQL-verifiable mm_binary_meta query: byte length drives fake dimensions.
    * Kept alongside the real header decode as the zero-cost projection for
    * pipelines that only need a deterministic bucketing key, not real fields.
    */
  def metaColumns(docs: DataFrame): DataFrame = {
    val n = length(col("text")).cast("long") // ascii corpus: bytes == chars
    docs.select(
      col("doc_id"),
      n.as("n_bytes"),
      (lit(64) + (n % 576)).cast("int").as("width"),
      (lit(64) + ((n * 7) % 320)).cast("int").as("height"))
  }
}
