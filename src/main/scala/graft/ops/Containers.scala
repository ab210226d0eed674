package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}

/**
 * Pure-JVM media CONTAINER walks — the one real multimodal decode step
 * available without codec libraries: an MP4 (ISO BMFF) box walk and a
 * Matroska/WebM EBML walk that recover duration, track count, codec
 * identifiers, and KEYFRAME TIMESTAMPS from the container's own sample
 * tables (MP4 `stts`+`stss`, Matroska `Cues`) — no bitstream decoding
 * anywhere. This upgrades [[Multimodal.sampleFrames]] from stride
 * GUESSES to the container's real sync-sample times for payloads that
 * carry them (the reference's KeyFrameVideo/ShotVideo justifications
 * are keyed to exactly such frame/shot timestamps —
 * /root/reference/update_kg/Updater.py:430-460).
 *
 * Both parsers are defensive: malformed/truncated payloads THROW, and
 * the Spark face captures the failure per row (fail.log semantics),
 * same contract as [[Multimodal.extractFeatures]].
 */
object Containers {

  /** Parsed container metadata; `keyframes_ms` are presentation times
    * of sync samples (MP4 stss ⋈ stts, Matroska CueTime). */
  final case class ContainerMeta(
      media_id: String,
      container: String,       // mp4 | matroska | none
      duration_ms: Long,
      n_tracks: Int,
      track_types: Seq[String], // vide/soun (MP4 hdlr) or video/audio (EBML TrackType)
      codecs: Seq[String],      // stsd fourcc / EBML CodecID
      keyframes_ms: Seq[Long],
      ok: Boolean,
      error: String)

  // ---------------------------------------------------------------- MP4

  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def fourcc(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** True iff the payload leads with a plausible ISO-BMFF box ("ftyp"
    * first in every real MP4; "moov" accepted for header-only blobs). */
  def looksLikeMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && {
      val t = fourcc(b, 4)
      t == "ftyp" || t == "moov" || t == "styp" || t == "moof"
    }

  /** Matroska/WebM leads with the EBML magic. */
  def looksLikeMatroska(b: Array[Byte]): Boolean =
    b.length >= 4 && (b(0) & 0xff) == 0x1a && (b(1) & 0xff) == 0x45 &&
      (b(2) & 0xff) == 0xdf && (b(3) & 0xff) == 0xa3

  final case class Mp4Track(
      handler: String, codec: String, timescale: Long, duration: Long,
      sttsRuns: Seq[(Long, Long)], // (sampleCount, delta) in track timescale
      syncSamples: Seq[Long])      // 1-based sample numbers (empty stss box = none)

  /** Walk one level of boxes in b[from, until) calling f(type, payloadFrom,
    * payloadUntil). 64-bit sizes (size==1 + largesize) supported. */
  private def walkBoxes(b: Array[Byte], from: Int, until: Int)(
      f: (String, Int, Int) => Unit): Unit = {
    var o = from
    while (o < until) {
      require(o + 8 <= until, s"truncated box header at $o")
      var sz = be32(b, o)
      val t = fourcc(b, o + 4)
      var hdr = 8
      if (sz == 1) {
        require(o + 16 <= until, "truncated largesize box")
        sz = be64(b, o + 8); hdr = 16
      } else if (sz == 0) sz = (until - o).toLong // box extends to end
      require(sz >= hdr && o + sz <= until, s"bad box size $sz for $t at $o")
      f(t, o + hdr, o + sz.toInt)
      o += sz.toInt
    }
  }

  /** MP4 (ISO BMFF) metadata walk: ftyp/moov → mvhd (movie timescale +
    * duration) and per-trak mdia (mdhd timescale, hdlr handler, stbl's
    * stsd codec fourcc + stts time-to-sample + stss sync samples).
    * Keyframe times come from the REAL sample tables: time(sample n) =
    * Σ stts deltas before n, converted by the track's own timescale. */
  def parseMp4(b: Array[Byte]): (Long, Seq[Mp4Track]) = {
    var movieTimescale = 0L; var movieDuration = 0L
    val tracks = scala.collection.mutable.ArrayBuffer.empty[Mp4Track]
    walkBoxes(b, 0, b.length) {
      case ("moov", mf, mu) =>
        walkBoxes(b, mf, mu) {
          case ("mvhd", f, u) =>
            require(u - f >= 20, "truncated mvhd")
            val v = b(f) & 0xff
            if (v == 1) { movieTimescale = be32(b, f + 20); movieDuration = be64(b, f + 24) }
            else { movieTimescale = be32(b, f + 12); movieDuration = be32(b, f + 16) }
            require(movieTimescale > 0, "zero mvhd timescale")
          case ("trak", tf, tu) =>
            var handler = ""; var codec = ""
            var ts = 0L; var dur = 0L
            var stts = Seq.empty[(Long, Long)]
            var stss = Seq.empty[Long]
            walkBoxes(b, tf, tu) {
              case ("mdia", df, du) =>
                walkBoxes(b, df, du) {
                  case ("mdhd", f, u) =>
                    require(u - f >= 20, "truncated mdhd")
                    val v = b(f) & 0xff
                    if (v == 1) { ts = be32(b, f + 20); dur = be64(b, f + 24) }
                    else { ts = be32(b, f + 12); dur = be32(b, f + 16) }
                    require(ts > 0, "zero mdhd timescale")
                  case ("hdlr", f, u) =>
                    require(u - f >= 12, "truncated hdlr")
                    handler = fourcc(b, f + 8)
                  case ("minf", nf, nu) =>
                    walkBoxes(b, nf, nu) {
                      case ("stbl", sf, su) =>
                        walkBoxes(b, sf, su) {
                          case ("stsd", f, u) =>
                            require(u - f >= 16, "truncated stsd")
                            val n = be32(b, f + 4)
                            if (n > 0) codec = fourcc(b, f + 12) // first entry's format
                          case ("stts", f, u) =>
                            val n = be32(b, f + 4).toInt
                            require(u - f >= 8 + 8L * n, "truncated stts")
                            stts = (0 until n).map(i =>
                              (be32(b, f + 8 + i * 8), be32(b, f + 12 + i * 8)))
                          case ("stss", f, u) =>
                            val n = be32(b, f + 4).toInt
                            require(u - f >= 8 + 4L * n, "truncated stss")
                            stss = (0 until n).map(i => be32(b, f + 8 + i * 4))
                          case _ => ()
                        }
                      case _ => ()
                    }
                  case _ => ()
                }
              case _ => ()
            }
            tracks += Mp4Track(handler, codec, ts, dur, stts, stss)
          case _ => ()
        }
      case _ => () // ftyp, mdat, free, ...
    }
    require(movieTimescale > 0, "no mvhd box (not a movie header)")
    (movieDuration * 1000L / movieTimescale, tracks.toSeq)
  }

  /** Presentation times (ms) of a track's sync samples from its REAL
    * stts+stss tables: decode time of 1-based sample n is the stts
    * delta prefix sum over samples 1..n-1. */
  private def keyframeTimesMs(t: Mp4Track): Seq[Long] = {
    if (t.syncSamples.isEmpty || t.sttsRuns.isEmpty || t.timescale <= 0) return Nil
    // prefix-sum walk over runs; sync sample numbers are sorted in stss
    val sorted = t.syncSamples.sorted
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var runIdx = 0; var samplesBefore = 0L; var timeBefore = 0L
    for (sn <- sorted) {
      val target = sn - 1 // samples strictly before sn
      while (runIdx < t.sttsRuns.length &&
          samplesBefore + t.sttsRuns(runIdx)._1 <= target) {
        val (c, d) = t.sttsRuns(runIdx)
        samplesBefore += c; timeBefore += c * d; runIdx += 1
      }
      if (samplesBefore <= target && runIdx < t.sttsRuns.length) {
        val d = t.sttsRuns(runIdx)._2
        out += (timeBefore + (target - samplesBefore) * d) * 1000L / t.timescale
      }
      // sync samples past the stts table are ignored (corrupt but
      // recoverable — the parsed prefix is still real)
    }
    out.toSeq
  }

  // ---------------------------------------------------- Matroska / WebM

  /** EBML vint reader: (value, bytesRead). For IDs keep the marker bit
    * (IDs are compared with it, per the spec); for sizes strip it. */
  private def readVint(b: Array[Byte], o: Int, keepMarker: Boolean): (Long, Int) = {
    require(o < b.length, "truncated EBML vint")
    val first = b(o) & 0xff
    require(first != 0, "invalid EBML vint (zero lead byte)")
    val len = java.lang.Integer.numberOfLeadingZeros(first) - 24 + 1
    require(o + len <= b.length, "truncated EBML vint body")
    var v = if (keepMarker) first.toLong else (first & (0xff >>> len)).toLong
    var i = 1
    while (i < len) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
    (v, len)
  }

  private val EbmlHeader = 0x1a45dfa3L
  private val Segment = 0x18538067L
  private val Info = 0x1549a966L
  private val TimestampScale = 0x2ad7b1L
  private val Duration = 0x4489L
  private val Tracks = 0x1654ae6bL
  private val TrackEntry = 0xaeL
  private val TrackType = 0x83L
  private val CodecID = 0x86L
  private val Cues = 0x1c53bb6bL
  private val CuePoint = 0xbbL
  private val CueTime = 0xb3L

  private final case class MkvState(
      var timestampScaleNs: Long = 1000000L, // EBML default: 1ms
      var durationTicks: Double = 0.0,
      tracks: scala.collection.mutable.ArrayBuffer[(Long, String)] =
        scala.collection.mutable.ArrayBuffer.empty,
      cueTimes: scala.collection.mutable.ArrayBuffer[Long] =
        scala.collection.mutable.ArrayBuffer.empty)

  private def uintVal(b: Array[Byte], o: Int, len: Int): Long = {
    var v = 0L; var i = 0
    while (i < len) { v = (v << 8) | (b(o + i) & 0xff); i += 1 }
    v
  }
  private def floatVal(b: Array[Byte], o: Int, len: Int): Double = len match {
    case 4 => java.lang.Float.intBitsToFloat(uintVal(b, o, 4).toInt).toDouble
    case 8 => java.lang.Double.longBitsToDouble(uintVal(b, o, 8))
    case other => throw new IllegalArgumentException(s"bad EBML float size $other")
  }

  private def walkEbml(b: Array[Byte], from: Int, until: Int, st: MkvState,
      inTrackEntry: Boolean, inCuePoint: Boolean): Unit = {
    var o = from
    var curTrackType = -1L; var curCodec = ""
    while (o < until) {
      val (id, idLen) = readVint(b, o, keepMarker = true)
      val (sz, szLen) = readVint(b, o + idLen, keepMarker = false)
      val df = o + idLen + szLen
      val du = df + sz.toInt
      require(sz >= 0 && du <= until, s"truncated EBML element ${id.toHexString}")
      id match {
        case EbmlHeader | Segment | Info | Tracks | Cues =>
          walkEbml(b, df, du, st, inTrackEntry = false, inCuePoint = false)
        case TrackEntry =>
          walkEbml(b, df, du, st, inTrackEntry = true, inCuePoint = false)
        case CuePoint =>
          walkEbml(b, df, du, st, inTrackEntry = false, inCuePoint = true)
        case TimestampScale => st.timestampScaleNs = uintVal(b, df, sz.toInt)
        case Duration => st.durationTicks = floatVal(b, df, sz.toInt)
        case TrackType if inTrackEntry => curTrackType = uintVal(b, df, sz.toInt)
        case CodecID if inTrackEntry =>
          curCodec = new String(b, df, sz.toInt, "US-ASCII")
        case CueTime if inCuePoint => st.cueTimes += uintVal(b, df, sz.toInt)
        case _ => () // skip unknown/void elements wholesale
      }
      o = du
    }
    if (inTrackEntry && curTrackType >= 0) st.tracks += ((curTrackType, curCodec))
  }

  /** Matroska/WebM metadata walk (EBML): Segment→Info (TimestampScale +
    * Duration), Tracks→TrackEntry (TrackType + CodecID), and
    * Cues→CuePoint→CueTime — the container's real seek-point/keyframe
    * timestamps. */
  def parseMatroska(b: Array[Byte]): MkvMeta = {
    require(looksLikeMatroska(b), "not an EBML stream")
    val st = MkvState()
    walkEbml(b, 0, b.length, st, inTrackEntry = false, inCuePoint = false)
    require(st.timestampScaleNs > 0, "bad TimestampScale")
    val durMs = (st.durationTicks * st.timestampScaleNs / 1e6).round
    val types = st.tracks.map { case (t, _) =>
      t match { case 1 => "video"; case 2 => "audio"; case o => s"type$o" } }
    // CueTime is in TimestampScale ticks (ns-scaled)
    val kf = st.cueTimes.map(t => (t * st.timestampScaleNs / 1000000L)).toSeq
    MkvMeta(durMs, types.toSeq, st.tracks.map(_._2).toSeq, kf)
  }

  final case class MkvMeta(durationMs: Long, trackTypes: Seq[String],
      codecs: Seq[String], keyframesMs: Seq[Long])

  // ------------------------------------------------------- Spark face

  /** Single-payload probe — the per-row kernel. */
  private[graft] def probe(mediaId: String, payload: Array[Byte]): ContainerMeta =
    try {
      val b = if (payload == null) Array.emptyByteArray else payload
      if (looksLikeMp4(b)) {
        val (durMs, tracks) = parseMp4(b)
        ContainerMeta(mediaId, "mp4", durMs, tracks.length,
          tracks.map(_.handler), tracks.map(_.codec),
          tracks.filter(_.handler == "vide").flatMap(keyframeTimesMs).sorted,
          ok = true, null)
      } else if (looksLikeMatroska(b)) {
        val m = parseMatroska(b)
        ContainerMeta(mediaId, "matroska", m.durationMs, m.trackTypes.length,
          m.trackTypes, m.codecs, m.keyframesMs.sorted, ok = true, null)
      } else
        ContainerMeta(mediaId, "none", 0L, 0, Nil, Nil, Nil, ok = true, null)
    } catch {
      case e: Exception =>
        val kind = if (payload != null && looksLikeMatroska(payload)) "matroska"
                   else if (payload != null && looksLikeMp4(payload)) "mp4" else "none"
        ContainerMeta(mediaId, kind, 0L, 0, Nil, Nil, Nil, ok = false,
          if (e.getMessage == null) e.getClass.getSimpleName else e.getMessage)
    }

  /** Partition-parallel container probe over (media_id, payload) rows —
    * same mapPartitions batch shape and per-row failure capture as
    * [[Multimodal.extractFeatures]]. */
  def probeContainers(media: DataFrame): Dataset[ContainerMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("media_id", "payload").as[(String, Array[Byte])]
      .mapPartitions(rows => rows.map { case (id, p) => probe(id, p) })
  }

  // ------------------------------------------- deterministic synthesis
  // (tests/benches only — builds REAL container structure, garbage
  // media payload: the walk needs boxes/elements, never bitstreams)

  private def box(t: String, payload: Array[Byte]*): Array[Byte] = {
    val n = 8 + payload.map(_.length).sum
    val out = java.nio.ByteBuffer.allocate(n)
    out.putInt(n).put(t.getBytes("US-ASCII"))
    payload.foreach(out.put)
    out.array()
  }
  private def u32(vs: Long*): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(4 * vs.length)
    vs.foreach(v => out.putInt(v.toInt))
    out.array()
  }

  /** Minimal valid MP4: ftyp + moov(mvhd, trak(tkhd, mdia(mdhd, hdlr,
    * minf(stbl(stsd avc1, stts, stss, stsz, stco))))) + mdat. The
    * sample tables are REAL: `fps` samples/s for `durationS` seconds,
    * sync samples every `keyEvery` samples. */
  def syntheticMp4(durationS: Int = 4, fps: Int = 10, keyEvery: Int = 10,
      timescale: Int = 1000): Array[Byte] = {
    val nSamples = durationS * fps
    val delta = timescale / fps
    val syncs = (1 to nSamples by keyEvery).map(_.toLong)
    val mvhd = box("mvhd", u32(0L /*v0+flags*/, 0L, 0L, timescale,
      durationS.toLong * timescale, 0x00010000L, 0L), // rate, volume+reserved
      new Array[Byte](76)) // matrix + predefined + next_track_id padding
    val mdhd = box("mdhd", u32(0L, 0L, 0L, timescale, durationS.toLong * timescale, 0L))
    val hdlr = box("hdlr", u32(0L, 0L), "vide".getBytes("US-ASCII"),
      new Array[Byte](13)) // reserved + empty name
    val stsd = box("stsd", u32(0L, 1L), box("avc1", new Array[Byte](8)))
    val stts = box("stts", u32(0L, 1L, nSamples.toLong, delta.toLong))
    val stss = box("stss", u32((0L +: syncs.length.toLong +: syncs): _*))
    val stsz = box("stsz", u32(0L, 100L, nSamples.toLong)) // constant size
    val stco = box("stco", u32(0L, 0L))
    val stbl = box("stbl", stsd, stts, stss, stsz, stco)
    val minf = box("minf", stbl)
    val tkhd = box("tkhd", u32(0L, 0L, 0L, 1L), new Array[Byte](68))
    val trak = box("trak", tkhd, box("mdia", mdhd, hdlr, minf))
    val ftyp = box("ftyp", "isom".getBytes("US-ASCII"), u32(512L),
      "isomiso2".getBytes("US-ASCII"))
    val mdat = box("mdat", Array.tabulate(64)(i => (i * 7).toByte))
    ftyp ++ box("moov", mvhd, trak) ++ mdat
  }

  private def ebmlId(id: Long): Array[Byte] = {
    // IDs are stored WITH their length marker: byte length = ceil(bits/8)
    val len = (71 - java.lang.Long.numberOfLeadingZeros(id)) / 8
    (0 until len).map(i => ((id >>> (8 * (len - 1 - i))) & 0xff).toByte).toArray
  }
  private def ebmlSize(n: Long): Array[Byte] =
    // fixed 8-byte form: 0x01 marker + 7 payload bytes (always valid)
    (0x01.toByte +: (0 until 7).map(i => ((n >>> (8 * (6 - i))) & 0xff).toByte)).toArray
  private def ebmlEl(id: Long, payload: Array[Byte]*): Array[Byte] = {
    val body = payload.toArray.flatten
    ebmlId(id) ++ ebmlSize(body.length.toLong) ++ body
  }
  private def ebmlUint(v: Long, len: Int): Array[Byte] =
    (0 until len).map(i => ((v >>> (8 * (len - 1 - i))) & 0xff).toByte).toArray

  /** Minimal valid WebM/Matroska: EBML header + Segment(Info(
    * TimestampScale, Duration), Tracks(video V_VP9 + audio A_OPUS),
    * Cues(CuePoint(CueTime)…)). Cue times every `cueEveryMs`. */
  def syntheticWebm(durationMs: Long = 4000L, cueEveryMs: Long = 1000L): Array[Byte] = {
    val tsScale = 1000000L // 1ms ticks (the Matroska default)
    val info = ebmlEl(Info,
      ebmlEl(TimestampScale, ebmlUint(tsScale, 3)),
      ebmlEl(Duration, {
        val bb = java.nio.ByteBuffer.allocate(8)
        bb.putDouble(durationMs.toDouble); bb.array()
      }))
    val tracks = ebmlEl(Tracks,
      ebmlEl(TrackEntry, ebmlEl(TrackType, ebmlUint(1L, 1)),
        ebmlEl(CodecID, "V_VP9".getBytes("US-ASCII"))),
      ebmlEl(TrackEntry, ebmlEl(TrackType, ebmlUint(2L, 1)),
        ebmlEl(CodecID, "A_OPUS".getBytes("US-ASCII"))))
    val cues = ebmlEl(Cues,
      (0L until durationMs by cueEveryMs).map(t =>
        ebmlEl(CuePoint, ebmlEl(CueTime, ebmlUint(t, 4)))).toArray.flatten)
    val header = ebmlEl(EbmlHeader, Array.emptyByteArray)
    header ++ ebmlEl(Segment, info, tracks, cues)
  }
}
