package graft.extract

import java.security.MessageDigest

import org.apache.spark.sql.Dataset

import graft.schema.{EventArg, Mention, Statement, Turn}

/**
 * Per-turn mention + reified-statement extraction — the TA1 analog
 * (the reference assumes AIF from TA1 pre-exists, README.md:8; this
 * stage produces what the reference's json-heads carry:
 * update_kg/Updater.py:302-345).
 *
 * Realized as ONE typed flatMap (`Dataset[Turn] → Dataset[TurnKEs]`),
 * the single genuinely-custom operator called out in SURVEY.md §2.9:
 * pattern matching over token streams is not expressible in Column
 * algebra. Everything downstream is Column/DataFrame work. The
 * flatMap is embarrassingly parallel (no shuffle, no driver state);
 * per-turn failures are captured into an error side-channel rather
 * than failing the job (reference fail.log semantics,
 * json_head/get_json_head.py:96-110 — S6 in SURVEY.md §2.1).
 */
object MentionExtractor {

  /** All KEs of one turn, plus failure lineage. `events` are event
    * mentions (kind="event", etype = event type, name = trigger
    * surface text, offsets = trigger span — the reference's event
    * json-head trigger feature, update_kg/Updater.py:323-345);
    * `eventArgs` are their typed argument edges. */
  final case class TurnKEs(
      mentions: Seq[Mention],
      statements: Seq[Statement],
      events: Seq[Mention],
      eventArgs: Seq[EventArg],
      error: String)

  private val mdLocal: ThreadLocal[MessageDigest] = new ThreadLocal[MessageDigest] {
    override def initialValue(): MessageDigest = MessageDigest.getInstance("MD5")
  }
  private val hex = "0123456789abcdef".toCharArray

  /** Hot-path md5 hex: thread-local digest, no per-byte formatting. */
  def md5(s: String): String = {
    val d = mdLocal.get()
    d.reset()
    val b = d.digest(s.getBytes("UTF-8"))
    val out = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      out(i * 2) = hex((b(i) >> 4) & 0xf)
      out(i * 2 + 1) = hex(b(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  private final case class Tok(clean: String, start: Int, end: Int)
  /** startIdx/endIdx are TOKEN indices into the turn's token array —
    * carried so span-gap tests are O(1) field reads instead of a
    * per-turn token→index hash map (extraction is the volume-dominant,
    * allocation-bound stage; see BASELINE.md round-3). */
  private final case class Span(tokens: List[Tok], etype: String,
      startIdx: Int, endIdx: Int) {
    def start: Int = tokens.head.start
    def end: Int = tokens.last.end
    def name: String = tokens.map(_.clean).mkString(" ")
  }

  private val capTok = "^[A-Z][a-zA-Z.\\-]*$".r.pattern

  private def tokenize(text: String): Array[Tok] = {
    val out = Array.newBuilder[Tok]
    var i = 0
    val n = text.length
    while (i < n) {
      while (i < n && text.charAt(i) == ' ') i += 1
      val s = i
      while (i < n && text.charAt(i) != ' ') i += 1
      if (i > s) {
        var e = i
        // strip trailing sentence punctuation from the token value but
        // keep "F." person initials intact
        var clean = text.substring(s, i)
        while (clean.nonEmpty && ",.;:!?".indexOf(clean.last) >= 0 &&
          !(clean.length == 2 && clean.head.isUpper && clean.last == '.'))
          { clean = clean.dropRight(1); e -= 1 }
        if (clean.nonEmpty) out += Tok(clean, s, e)
      }
    }
    out.result()
  }

  private def isCap(t: Tok): Boolean =
    t.clean != "I" && capTok.matcher(t.clean).matches()

  /** Maximal runs of capitalized tokens → typed spans. */
  private def spans(toks: Array[Tok]): List[Span] = {
    val out = List.newBuilder[Span]
    var i = 0
    while (i < toks.length) {
      if (isCap(toks(i))) {
        val s = i
        while (i < toks.length && isCap(toks(i))) i += 1
        val run = toks.slice(s, i).toList
        out += Span(run, Lexicon.classify(run.map(_.clean)), s, i - 1)
      } else i += 1
    }
    out.result()
  }

  /** Deterministic pseudo-confidence in [0.75, 1.0) — replaces the
    * reference's store-supplied confidences with a content hash
    * (determinism requirement, SURVEY.md §7.4). */
  private def conf(key: String): Double =
    0.75 + (Math.floorMod(key.hashCode.toLong, 25L)) / 100.0

  def extractTurn(t: Turn): TurnKEs = {
    try {
      if (t.role == "tool" || t.text == null || t.text.isEmpty)
        return TurnKEs(Nil, Nil, Nil, Nil, null)
      val toks = tokenize(t.text)
      val sp = spans(toks)
      val mentions = sp.map { s =>
        val nm = s.name
        val norm = nm.toLowerCase.split(' ')
          .map(Lexicon.normToken).mkString(" ")
        val id = md5(s"${t.conv_id}|${t.turn_idx}|${s.start}|${s.end}|$nm")
        Mention(id, t.conv_id, t.turn_idx, "entity", s.etype, nm, norm,
          s.start, s.end, conf(id), Lexicon.kbDict.getOrElse(norm, null))
      }.toVector
      // trigger detection between consecutive spans: S1 <verb|phrase> S2
      val stmts = List.newBuilder[Statement]
      val events = List.newBuilder[Mention]
      val eventArgs = List.newBuilder[EventArg]
      val spArr = sp.toArray
      var k = 0
      while (k + 1 < spArr.length) {
        val s1 = spArr(k); val s2 = spArr(k + 1)
        // gap = tokens strictly between the two spans (index arithmetic,
        // no slices/maps on the non-trigger fast path)
        val gapStart = s1.endIdx + 1
        val gapLen = s2.startIdx - gapStart
        val verb: Option[String] =
          if (gapLen == 1) {
            val v = toks(gapStart).clean.toLowerCase
            if (Lexicon.triggers.contains(v)) Some(v) else None
          } else if (gapLen == 2) {
            Lexicon.phraseTriggers.get(
              toks(gapStart).clean.toLowerCase + " " +
                toks(gapStart + 1).clean.toLowerCase)
          } else None
        verb.foreach { v =>
          val pred = Lexicon.triggers(v)._1
          val m1 = mentions(k); val m2 = mentions(k + 1)
          stmts += Statement(
            md5(s"${t.conv_id}|${t.turn_idx}|$pred|${m1.mention_id}|${m2.mention_id}"),
            m1.mention_id, pred, m2.mention_id, conf(pred + m1.mention_id),
            t.conv_id, t.turn_idx, s1.start, s2.end,
            m1.etype, m1.norm_name, m1.link_target,
            m2.etype, m2.norm_name, m2.link_target)
          // event mention: the trigger span IS the event (kind="event",
          // etype = event type, name = trigger surface text — the
          // reference's event json head carries exactly trigger text +
          // typed args, update_kg/Updater.py:323-345)
          val evId = md5(s"${t.conv_id}|${t.turn_idx}|ev|$pred|${m1.mention_id}|${m2.mention_id}")
          val trigText =
            if (gapLen == 1) toks(gapStart).clean
            else toks(gapStart).clean + " " + toks(gapStart + 1).clean
          events += Mention(evId, t.conv_id, t.turn_idx, "event", pred,
            trigText, v, toks(gapStart).start,
            toks(gapStart + gapLen - 1).end, conf(evId), null)
          eventArgs += EventArg(evId, "Subject", m1.mention_id,
            m1.etype, m1.norm_name, m1.link_target)
          eventArgs += EventArg(evId, "Object", m2.mention_id,
            m2.etype, m2.norm_name, m2.link_target)
          // optional place clause: ... S2 in S3(GPE)
          var placeFound = false
          if (k + 2 < spArr.length) {
            val s3 = spArr(k + 2)
            if (s3.startIdx - s2.endIdx == 2 &&
              toks(s2.endIdx + 1).clean.toLowerCase == "in" &&
              s3.etype == Lexicon.GPE) {
              val m3 = mentions(k + 2)
              stmts += Statement(
                md5(s"${t.conv_id}|${t.turn_idx}|$pred.Place|${m1.mention_id}|${m3.mention_id}"),
                m1.mention_id, pred + ".Place", m3.mention_id, conf(pred + m3.mention_id),
                t.conv_id, t.turn_idx, s1.start, s3.end,
                m1.etype, m1.norm_name, m1.link_target,
                m3.etype, m3.norm_name, m3.link_target)
              eventArgs += EventArg(evId, "Place", m3.mention_id,
                m3.etype, m3.norm_name, m3.link_target)
              placeFound = true
            }
          }
          // optional participant clause — the arbitrary-arity role the
          // reference's event json head carries as per-type argument
          // LISTS (update_kg/Updater.py:329-345): ... [in S3] with
          // S4(PER) [and S5(PER)]* → one Participant argument edge per
          // person (arg-only, like the reference's entity lists; no
          // reified statement, so the relation/triple surface is
          // unchanged). "with" opens the list, "and" continues it.
          var pIdx = if (placeFound) k + 3 else k + 2
          var connector = "with"
          var more = true
          while (more && pIdx < spArr.length) {
            val prev = spArr(pIdx - 1); val sp = spArr(pIdx)
            if (sp.startIdx - prev.endIdx == 2 &&
              toks(prev.endIdx + 1).clean.toLowerCase == connector &&
              sp.etype == Lexicon.PER) {
              val mp = mentions(pIdx)
              eventArgs += EventArg(evId, "Participant", mp.mention_id,
                mp.etype, mp.norm_name, mp.link_target)
              connector = "and"
              pIdx += 1
            } else more = false
          }
        }
        k += 1
      }
      TurnKEs(mentions, stmts.result(), events.result(), eventArgs.result(), null)
    } catch {
      case e: Exception =>
        TurnKEs(Nil, Nil, Nil, Nil,
          s"${t.conv_id}/${t.turn_idx}: ${e.getClass.getSimpleName}: ${e.getMessage}")
    }
  }

  /** Distributed extraction. Callers persist the result before
    * fanning out to mentions/statements/errors. */
  def extract(turns: Dataset[Turn]): Dataset[TurnKEs] = {
    val spark = turns.sparkSession
    import spark.implicits._
    turns.map(extractTurn)
  }
}
