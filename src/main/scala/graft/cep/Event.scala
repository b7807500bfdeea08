package graft.cep

/** An event: a type tag plus a flat, *insertion-ordered* map of integer
  * attributes.
  *
  * Mirrors the reference data model (`/root/reference/reflinkcep/event.py:8-22`,
  * `defs.py:1`): the only scalar type is a 64-bit integer, and attribute
  * order is significant for display (`e(id,name,price)`).
  */
final case class Event(tpe: String, attrs: Vector[(String, Long)]) {

  def apply(key: String): Long =
    attrs.find(_._1 == key) match {
      case Some((_, v)) => v
      case None         => throw new NoSuchElementException(s"event attr $key")
    }

  def get(key: String): Option[Long] = attrs.find(_._1 == key).map(_._2)

  /** Attribute map used as the evaluation environment (cached — predicates
    * evaluate against it once per transition per event).
    */
  @transient lazy val attrMap: Map[String, Long] = attrs.toMap

  /** Display format pinned by the reference goldens: `type(v1,v2,...)`. */
  override def toString: String =
    s"$tpe(${attrs.map(_._2).mkString(",")})"
}

object Event {
  def apply(tpe: String, attrs: (String, Long)*): Event =
    Event(tpe, attrs.toVector)
}
