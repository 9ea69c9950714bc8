package graft.llm

import java.io.ByteArrayOutputStream
import java.nio.{ByteBuffer, ByteOrder}

/** Minimal spec-compliant RIFF-AVI container codec for UNCOMPRESSED
  * 8-bit-palette DIB video — the published AVI layout (Microsoft
  * "AVI RIFF File Reference"): a RIFF('AVI ') form holding
  * LIST('hdrl') with the `avih` main header and one LIST('strl')
  * stream (vids/DIB `strh` + BITMAPINFOHEADER-plus-palette `strf`),
  * then LIST('movi') with one `00db` chunk per frame. Every chunk is
  * fourcc + little-endian uint32 size + data, padded to an even byte
  * boundary — the parser walks that grammar generically (LIST
  * recursion included), so it reads any conforming writer's
  * uncompressed output (e.g. `ffmpeg -c:v rawvideo -pix_fmt pal8`),
  * not just its own.
  *
  * No JVM video codec exists, so unlike the PNG/WAV tiers (where JDK
  * does one side) both halves here are this file — kept deliberately
  * container-level: entropy-coded frames (H.264-class) are exactly
  * what the [[Multimodal]] batch seam would hand to an ffmpeg/JNI
  * decoder.
  */
private[llm] object AviCodec {

  /** `frameSums(f)` = unsigned byte sum of frame f's pixel payload, in
    * stream order — the total is `frameSums.sum`; frame-sampling ops
    * index into it. */
  case class Parsed(width: Int, height: Int, frameSums: Array[Long]) {
    def nFrames: Long = frameSums.length.toLong
    def sumPx: Long = { var s = 0L; var i = 0
      while (i < frameSums.length) { s += frameSums(i); i += 1 }; s }
  }

  private def fourcc(s: String): Int =
    (s.charAt(0) & 0xff) | ((s.charAt(1) & 0xff) << 8) |
      ((s.charAt(2) & 0xff) << 16) | ((s.charAt(3) & 0xff) << 24)

  private val RIFF = fourcc("RIFF")
  private val AVI_ = fourcc("AVI ")
  private val LIST = fourcc("LIST")
  private val HDRL = fourcc("hdrl")
  private val AVIH = fourcc("avih")
  private val STRL = fourcc("strl")
  private val STRF = fourcc("strf")
  private val MOVI = fourcc("movi")
  private val DB00 = fourcc("00db")
  private val DC00 = fourcc("00dc")

  /** Serialize one video: `px(x, y, f)` must return 0..255. Frames are
    * stored bottom-up (DIB row order); `w` must be a multiple of 4 so
    * rows need no stride padding. */
  def write(w: Int, h: Int, nFrames: Int, fps: Int,
            px: (Int, Int, Int) => Int): Array[Byte] = {
    require(w % 4 == 0, s"width $w not DIB stride-aligned")
    val frameBytes = w * h

    def chunk(cc: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(8 + body.length + 1)
      val hdr = ByteBuffer.allocate(8).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(fourcc(cc)); hdr.putInt(body.length)
      out.write(hdr.array()); out.write(body)
      if (body.length % 2 != 0) out.write(0) // even padding
      out.toByteArray
    }
    def list(listType: String, body: Array[Byte]): Array[Byte] = {
      val out = new ByteArrayOutputStream(12 + body.length)
      val hdr = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
      hdr.putInt(LIST); hdr.putInt(4 + body.length); hdr.putInt(fourcc(listType))
      out.write(hdr.array()); out.write(body)
      out.toByteArray
    }

    val avih = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    avih.putInt(1000000 / fps) // dwMicroSecPerFrame
      .putInt(frameBytes * fps) // dwMaxBytesPerSec
      .putInt(0)                // dwPaddingGranularity
      .putInt(0)                // dwFlags
      .putInt(nFrames)          // dwTotalFrames
      .putInt(0)                // dwInitialFrames
      .putInt(1)                // dwStreams
      .putInt(frameBytes)       // dwSuggestedBufferSize
      .putInt(w).putInt(h)      // dwWidth, dwHeight
      .putInt(0).putInt(0).putInt(0).putInt(0) // dwReserved

    val strh = ByteBuffer.allocate(56).order(ByteOrder.LITTLE_ENDIAN)
    strh.putInt(fourcc("vids")).putInt(fourcc("DIB ")) // fccType, fccHandler
      .putInt(0)                 // dwFlags
      .putShort(0).putShort(0)   // wPriority, wLanguage
      .putInt(0)                 // dwInitialFrames
      .putInt(1).putInt(fps)     // dwScale, dwRate
      .putInt(0)                 // dwStart
      .putInt(nFrames)           // dwLength (in frames)
      .putInt(frameBytes)        // dwSuggestedBufferSize
      .putInt(-1)                // dwQuality (default)
      .putInt(0)                 // dwSampleSize
      .putShort(0).putShort(0)   // rcFrame left, top
      .putShort(w.toShort).putShort(h.toShort) // rcFrame right, bottom

    // BITMAPINFOHEADER + 256-entry grayscale palette (b, g, r, reserved)
    val strf = ByteBuffer.allocate(40 + 256 * 4).order(ByteOrder.LITTLE_ENDIAN)
    strf.putInt(40)              // biSize
      .putInt(w).putInt(h)       // biWidth, biHeight (positive: bottom-up)
      .putShort(1)               // biPlanes
      .putShort(8)               // biBitCount
      .putInt(0)                 // biCompression = BI_RGB
      .putInt(frameBytes)        // biSizeImage
      .putInt(0).putInt(0)       // biXPelsPerMeter, biYPelsPerMeter
      .putInt(256).putInt(0)     // biClrUsed, biClrImportant
    var i = 0
    while (i < 256) {
      strf.put(i.toByte).put(i.toByte).put(i.toByte).put(0.toByte)
      i += 1
    }

    val hdrl = list("hdrl", chunk("avih", avih.array()) ++
      list("strl", chunk("strh", strh.array()) ++ chunk("strf", strf.array())))

    val movi = new ByteArrayOutputStream()
    var f = 0
    while (f < nFrames) {
      val frame = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        val rowOff = (h - 1 - y) * w // bottom-up
        var x = 0
        while (x < w) { frame(rowOff + x) = px(x, y, f).toByte; x += 1 }
        y += 1
      }
      movi.write(chunk("00db", frame))
      f += 1
    }

    val body = hdrl ++ list("movi", movi.toByteArray)
    val out = new ByteArrayOutputStream(12 + body.length)
    val hdr = ByteBuffer.allocate(12).order(ByteOrder.LITTLE_ENDIAN)
    hdr.putInt(RIFF); hdr.putInt(4 + body.length); hdr.putInt(AVI_)
    out.write(hdr.array()); out.write(body)
    out.toByteArray
  }

  /** Generic RIFF chunk walk. Returns None for anything that is not a
    * conforming uncompressed-8-bit AVI (wrong magic, truncated chunk,
    * non-8-bit `strf`, no frames). Frame pixel bytes are summed as
    * unsigned — row order cancels in the sum. */
  def parse(bytes: Array[Byte]): Option[Parsed] = {
    if (bytes.length < 12) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    if (buf.getInt(0) != RIFF || buf.getInt(8) != AVI_) return None
    val riffEnd = math.min(bytes.length.toLong, 8L + buf.getInt(4))

    var width = -1
    var height = -1
    var bitCount = -1
    val frameSums = scala.collection.mutable.ArrayBuffer.empty[Long]

    // walk chunks in [pos, end); descend into hdrl/strl/movi lists
    def walk(start: Long, end: Long): Unit = {
      var pos = start
      while (pos + 8 <= end) {
        val cc = buf.getInt(pos.toInt)
        val size = buf.getInt(pos.toInt + 4) & 0xffffffffL
        val dataStart = pos + 8
        val dataEnd = dataStart + size
        if (dataEnd > end) return // truncated chunk: stop, keep what parsed
        if (cc == LIST && size >= 4) {
          val listType = buf.getInt(dataStart.toInt)
          if (listType == HDRL || listType == STRL || listType == MOVI)
            walk(dataStart + 4, dataEnd)
        } else if (cc == AVIH && size >= 40) {
          width = buf.getInt(dataStart.toInt + 32)
          height = buf.getInt(dataStart.toInt + 36)
        } else if (cc == STRF && size >= 16) {
          bitCount = buf.getShort(dataStart.toInt + 14).toInt
        } else if (cc == DB00 || cc == DC00) {
          var s = 0L
          var i = dataStart.toInt
          while (i < dataEnd.toInt) { s += bytes(i) & 0xff; i += 1 }
          frameSums += s
        }
        pos = dataEnd + (size & 1) // chunks pad to even boundaries
      }
    }
    walk(12L, riffEnd)

    if (width <= 0 || height <= 0 || bitCount != 8 || frameSums.isEmpty) None
    else Some(Parsed(width, height, frameSums.toArray))
  }
}
