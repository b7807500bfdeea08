package graft

package object cep {
  /** A match: pattern name → ordered list of bound events, in output-map
    * insertion order (`/root/reference/reflinkcep/executor.py:7-8`; key
    * order is significant, SURVEY.md §1.4).
    */
  type Match = Vector[(String, Vector[Event])]
}
