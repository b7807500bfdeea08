package graft.cep

/** Shared helpers for the golden-output suites: the reference's exact
  * display formats (`/root/reference/tests/utils.py:29-33`,
  * `reflinkcep/event.py:19-22`) so expected strings can be compared
  * verbatim.
  */
object GoldenUtil {

  /** Build the test event stream: `e(id, name, price)` with a 1-based
    * sequence id, as in `/root/reference/tests/test_basic.py:19-28`.
    */
  def eventsOf(pairs: (Int, Int)*): Vector[Event] =
    pairs.zipWithIndex.map { case ((name, price), i) =>
      Event("e", Vector("id" -> (i + 1).toLong, "name" -> name.toLong,
        "price" -> price.toLong))
    }.toVector

  /** Python-dict repr of one match: `{'a': [e(1,1,0)], 'b': [e(2,2,0)]}`. */
  def dictRepr(m: Match): String = MatchSink.dictRepr(m)

  /** Python-list repr of a match stream. */
  def streamRepr(ms: Seq[Match]): String = MatchSink.streamRepr(ms)

  /** Fancy per-line repr: `a: e(..), e(..); b: e(..)`. */
  def fancyRepr(ms: Seq[Match]): String = MatchSink.fancyRepr(ms)

  val schemaNP: Vector[(String, Vector[String])] =
    Vector("e" -> Vector("name", "price"))
  val schemaINP: Vector[(String, Vector[String])] =
    Vector("e" -> Vector("id", "name", "price"))

  def runQuery(q: CepQuery, input: Vector[Event]): Vector[Match] =
    CepOperator.run(q, input)
}
