package graft.model

/** The synthetic knowledge-base universe: entities, surface aliases, priors.
  *
  * ≙ the reference's name-resolution world: `Function` nodes looked up by
  * normalized name (joern-fuzzyc `tools/icfg/CallResolver.java:70-80`), with
  * ambiguity handled as a multimap + scoring (joern-php
  * `cg/PHPCGFactory.java:41-47`). Here: persons / places / orgs with
  * deterministic aliases; some aliases are ambiguous (shared last names) to
  * exercise the candidate-scoring join.
  */
object KB {
  val FirstNames: Vector[String] = Vector(
    "Ada", "Alan", "Grace", "Edsger", "Donald", "Barbara", "John", "Dennis",
    "Ken", "Bjarne", "James", "Guido", "Linus", "Margaret", "Katherine",
    "Dorothy", "Mary", "Annie", "Radia", "Frances", "Jean", "Betty",
    "Marlyn", "Ruth", "Kathleen", "Adele", "Anita", "Karen", "Shafi",
    "Silvio", "Leslie", "Tim", "Vint", "Robert", "Claude", "Noam",
    "Andrey", "Alonzo", "Kurt", "David")

  val LastNames: Vector[String] = Vector(
    "Lovelace", "Turing", "Hopper", "Dijkstra", "Knuth", "Liskov", "Backus",
    "Ritchie", "Thompson", "Stroustrup", "Gosling", "Rossum", "Torvalds",
    "Hamilton", "Johnson", "Vaughan", "Keller", "Easley", "Perlman",
    "Allen", "Bartik", "Holberton", "Meltzer", "Teitelbaum", "Antonelli",
    "Goldstine", "Borg", "Jones", "Goldwasser", "Micali", "Lamport",
    "Lee", "Cerf", "Kahn", "Shannon", "Chomsky", "Kolmogorov", "Church",
    "Godel", "Hilbert", "Curry", "Floyd", "Hoare", "Milner", "Scott",
    "Rabin", "Karp", "Cook", "Tarjan", "Blum")

  val Places: Vector[String] = Vector(
    "London", "Cambridge", "Princeton", "Vienna", "Zurich", "Budapest",
    "Edinburgh", "Manchester", "Pasadena", "Berkeley", "Stanford",
    "Gottingen", "Paris", "Amsterdam", "Eindhoven", "Oslo", "Helsinki",
    "Moscow", "Kyoto", "Bombay", "Sydney", "Toronto", "Boston",
    "Pittsburgh", "Austin", "Seattle", "Dublin", "Geneva", "Rome", "Prague")

  /** Org names; several contain '&' to exercise HTML-entity decoding on the
    * byte-identity path (the generator escapes them in `html`). */
  val Orgs: Vector[String] = Vector(
    "Acme Computing Society", "Babbage & Sons", "Colossus Labs",
    "Difference Engine Works", "ENIAC Trust", "Ferranti & Partners",
    "General Logic Company", "Hollerith Tabulating Concern",
    "Imperial Analytics", "Jacquard Looms United", "Konrad Zuse Institute",
    "Lambda Research Group", "Manchester Baby Foundation",
    "Numerical Analysis Bureau", "Oracle of Delphi Computing",
    "Pascal & Leibniz Society", "Quantum Relay Works",
    "Recursive Functions Ltd", "Stored Program Agency", "Vacuum Tube Syndicate")

  val PlaceIdBase = 10000L
  val OrgIdBase   = 20000L

  def personFull(e: Long): String = {
    val f = FirstNames((e % FirstNames.size).toInt)
    val l = LastNames(((e / FirstNames.size) % LastNames.size).toInt)
    s"$f $l"
  }
  def personAbbrev(e: Long): String = {
    val full = personFull(e)
    full.head.toString + ". " + full.substring(full.indexOf(' ') + 1)
  }
  def personLast(e: Long): String =
    LastNames(((e / FirstNames.size) % LastNames.size).toInt)

  def placeName(p: Long): String = Places((p - PlaceIdBase).toInt)
  def orgFull(o: Long): String = Orgs((o - OrgIdBase).toInt)
  def orgAcronym(o: Long): String =
    orgFull(o).split(' ').filter(w => w.nonEmpty && w.head.isUpper).map(_.head).mkString

  /** Per-entity prior for candidate scoring — deterministic, distinct enough
    * that argmax(prior) has a unique winner after the min-id tiebreak. */
  def prior(e: Long): Double = 1.0 / (1.0 + (((e * 2654435761L) >>> 3) % 10).toDouble)

  /** Alias normalization shared by dict build and mention lookup (≙ callee
    * name normalization, joern-lang `taintTracking/interproc.groovy:33-36`). */
  def norm(alias: String): String = alias.toLowerCase

  final case class AliasEntry(alias: String, entityId: Long, prior: Double)

  /** The full alias dictionary for a universe of nPersons persons plus all
    * places and orgs. Ambiguity: bare last names map to every person sharing
    * them; org acronyms can collide. */
  def aliasEntries(nPersons: Int): Vector[AliasEntry] = {
    val persons = (0L until nPersons.toLong).flatMap { e =>
      Vector(
        AliasEntry(personFull(e), e, prior(e)),
        AliasEntry(personAbbrev(e), e, prior(e)),
        AliasEntry(personLast(e), e, prior(e)))
    }
    val places = Places.indices.map { i =>
      AliasEntry(Places(i), PlaceIdBase + i, 1.0)
    }
    val orgs = Orgs.indices.flatMap { i =>
      val id = OrgIdBase + i
      Vector(AliasEntry(Orgs(i), id, 1.0), AliasEntry(orgAcronym(id), id, 1.0))
    }
    (persons ++ places ++ orgs).toVector
  }
}
