package graft.extract

/**
 * Public-knowledge lexicons shared by the mention extractor — the
 * analog of the TA1 system's EDL dictionaries that the reference
 * assumes pre-exist in its AIF input (reference README.md:8; KB links
 * arrive via aida:link/aida:linkTarget, update_kg/sparqls.py:92).
 *
 * The coarse entity-type vocabulary mirrors
 * /root/reference/namespaces.py:20-44 (ENTITY_TYPE_STR).
 */
object Lexicon {

  val PER = "Person"
  val ORG = "Organization"
  val GPE = "GeopoliticalEntity"

  /** Well-known place names (public gazetteer). Single-token by
    * construction so the extractor's span classifier stays simple. */
  val gpeGazetteer: Array[String] = Array(
    "Paris", "London", "Moscow", "Kyiv", "Berlin", "Tokyo", "Cairo",
    "Lagos", "Mumbai", "Beijing", "Madrid", "Rome", "Vienna", "Oslo",
    "Dublin", "Ottawa", "Ankara", "Baghdad", "Damascus", "Nairobi",
    "Caracas", "Havana", "Bogota", "Lima", "Santiago", "Geneva",
    "Brussels", "Warsaw", "Prague", "Budapest", "Athens", "Lisbon",
    "Helsinki", "Stockholm", "Copenhagen", "Amsterdam", "Seoul",
    "Jakarta", "Manila", "Bangkok")

  private val gpeSet: Set[String] = gpeGazetteer.toSet

  /** Entity-linking dictionary (norm name → KB id) — GPEs only; the
    * TA1-EDL analog of aida:linkTarget. Persons/orgs stay NIL and must
    * be clustered by name similarity, matching the reference's
    * DUMMY-link semantics (json_head/get_json_head.py:18-20: NILs
    * never block-match). */
  val kbDict: Map[String, String] =
    gpeGazetteer.zipWithIndex.map { case (g, i) => g.toLowerCase -> s"kb:GPE$i" }.toMap

  /** Organization-name suffixes → Organization classification. */
  val orgSuffixes: Set[String] =
    Set("corp", "corporation", "inc", "llc", "ltd", "limited", "group",
      "grp", "agency", "ministry", "bank", "university", "institute",
      "labs", "laboratories", "incorporated")

  /** Suffix-synonym normalization (public abbreviation knowledge) —
    * applied to norm_name so "Acme Corporation" and "Acme Corp" are
    * one surface form. */
  val suffixNorm: Map[String, String] = Map(
    "corporation" -> "corp", "incorporated" -> "inc",
    "limited" -> "ltd", "grp" -> "group", "laboratories" -> "labs")

  def normToken(t: String): String = suffixNorm.getOrElse(t, t)

  /** Event/relation trigger verbs → (predicate, object etype hint).
    * The predicate vocabulary is ours (the reference inherits TA1's
    * ontology); the shape — reified (subj, pred, obj) with confidence
    * and justification — is the reference's
    * (update_kg/sparqls.py:489-491,522-527). */
  val triggers: Map[String, (String, String)] = Map(
    "met" -> ("Contact.Meet", PER),
    "visited" -> ("Movement.Travel", GPE),
    "acquired" -> ("Transaction.Acquire", ORG),
    "joined" -> ("Affiliation.Employment", ORG),
    "attacked" -> ("Conflict.Attack", GPE),
    "called" -> ("Contact.Call", PER),
    "sanctioned" -> ("Government.Sanction", ORG),
    "founded" -> ("Organization.Found", ORG))

  /** Multi-word trigger phrases normalized by the extractor before
    * single-token trigger lookup. */
  val phraseTriggers: Map[String, String] = Map("works at" -> "joined", "traveled to" -> "visited")

  def isGpe(token: String): Boolean = gpeSet.contains(token)

  /** Classify a capitalized span into a coarse entity type. */
  def classify(tokens: Seq[String]): String = {
    val last = tokens.last.toLowerCase.stripSuffix(".")
    if (tokens.size == 1 && isGpe(tokens.head)) GPE
    else if (orgSuffixes.contains(last)) ORG
    else if (tokens.forall(t => t.length > 1 && t == t.toUpperCase)) ORG // "ACME"
    else PER
  }
}
