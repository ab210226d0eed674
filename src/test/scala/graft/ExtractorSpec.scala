package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.extract.{Lexicon, MentionExtractor}
import graft.schema.Turn

class ExtractorSpec extends AnyFunSuite {

  private def turn(text: String, role: String = "user"): Turn =
    Turn("c0", 0, role, text, null, new Timestamp(0L))

  test("extracts typed mentions from capitalized spans") {
    val ke = MentionExtractor.extractTurn(turn("fyi, John Smith met Maria Garcia in Paris."))
    val byName = ke.mentions.map(m => m.name -> m.etype).toMap
    assert(byName == Map(
      "John Smith" -> Lexicon.PER,
      "Maria Garcia" -> Lexicon.PER,
      "Paris" -> Lexicon.GPE))
    val paris = ke.mentions.find(_.name == "Paris").get
    assert(paris.link_target == Lexicon.kbDict("paris"))
    assert(ke.mentions.filter(_.etype == Lexicon.PER).forall(_.link_target == null))
  }

  test("offsets point at the original text") {
    val t = turn("note: Acme Corp acquired Globex Group.")
    val ke = MentionExtractor.extractTurn(t)
    ke.mentions.foreach { m =>
      assert(t.text.substring(m.start_off, m.end_off) == m.name)
    }
    assert(ke.mentions.forall(_.etype == Lexicon.ORG))
  }

  test("emits trigger statements with place clause") {
    val ke = MentionExtractor.extractTurn(turn("John Smith met Maria Garcia in Paris."))
    val preds = ke.statements.map(_.pred).toSet
    assert(preds == Set("Contact.Meet", "Contact.Meet.Place"))
    val meet = ke.statements.find(_.pred == "Contact.Meet").get
    val subj = ke.mentions.find(_.mention_id == meet.subj).get
    val obj = ke.mentions.find(_.mention_id == meet.obj).get
    assert(subj.name == "John Smith" && obj.name == "Maria Garcia")
  }

  test("phrase triggers normalize: works at / traveled to") {
    val ke1 = MentionExtractor.extractTurn(turn("Ivan Petrov works at Acme Corp."))
    assert(ke1.statements.map(_.pred) == List("Affiliation.Employment"))
    val ke2 = MentionExtractor.extractTurn(turn("Ivan Petrov traveled to Tokyo."))
    assert(ke2.statements.map(_.pred) == List("Movement.Travel"))
  }

  test("emits an event mention per trigger with typed args (C8)") {
    val t = turn("John Smith met Maria Garcia in Paris.")
    val ke = MentionExtractor.extractTurn(t)
    assert(ke.events.length == 1)
    val ev = ke.events.head
    assert(ev.kind == "event")
    assert(ev.etype == "Contact.Meet")
    assert(ev.name == "met")
    // trigger offsets point at the trigger text
    assert(t.text.substring(ev.start_off, ev.end_off) == "met")
    val roles = ke.eventArgs.map(a => a.role -> a.arg_id).toMap
    assert(ke.eventArgs.forall(_.event_id == ev.mention_id))
    def nameOf(id: String) = ke.mentions.find(_.mention_id == id).get.name
    assert(nameOf(roles("Subject")) == "John Smith")
    assert(nameOf(roles("Object")) == "Maria Garcia")
    assert(nameOf(roles("Place")) == "Paris")
  }

  test("participant lists: 'with A and B' yields one Participant arg per person") {
    val ke = MentionExtractor.extractTurn(
      turn("John Smith met Maria Garcia in Paris with Ivan Petrov and Wei Chen."))
    assert(ke.events.length == 1)
    def nameOf(id: String) = ke.mentions.find(_.mention_id == id).get.name
    val parts = ke.eventArgs.filter(_.role == "Participant").map(a => nameOf(a.arg_id))
    assert(parts.sorted == List("Ivan Petrov", "Wei Chen"))
    // and without a place clause
    val ke2 = MentionExtractor.extractTurn(
      turn("John Smith met Maria Garcia with Ivan Petrov and Wei Chen."))
    val parts2 = ke2.eventArgs.filter(_.role == "Participant").map(a => nameOf2(ke2, a.arg_id))
    assert(parts2.sorted == List("Ivan Petrov", "Wei Chen"))
  }

  private def nameOf2(ke: graft.extract.MentionExtractor.TurnKEs, id: String): String =
    ke.mentions.find(_.mention_id == id).get.name

  test("phrase trigger event keeps the surface text as name") {
    val ke = MentionExtractor.extractTurn(turn("Ivan Petrov works at Acme Corp."))
    assert(ke.events.map(e => (e.etype, e.name, e.norm_name)) ==
      List(("Affiliation.Employment", "works at", "joined")))
    assert(ke.eventArgs.map(_.role).sorted == List("Object", "Subject"))
  }

  test("tool turns and filler produce nothing") {
    assert(MentionExtractor.extractTurn(
      turn("""tool output: {"status": "ok"}""", "tool")).mentions.isEmpty)
    assert(MentionExtractor.extractTurn(
      turn("ok, let me check that for you.")).mentions.isEmpty)
  }

  test("person initial alias is a Person span") {
    val ke = MentionExtractor.extractTurn(turn("reportedly, J. Smith visited London."))
    val js = ke.mentions.find(_.name == "J. Smith")
    assert(js.exists(_.etype == Lexicon.PER))
    assert(ke.statements.map(_.pred) == List("Movement.Travel"))
  }

  test("extraction failure is captured, not thrown") {
    val ke = MentionExtractor.extractTurn(Turn("c0", 0, "user", null, null, new Timestamp(0)))
    assert(ke.mentions.isEmpty && ke.error == null) // null text → empty, no error
  }
}
