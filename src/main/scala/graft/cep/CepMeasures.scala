package graft.cep

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import SparkCep.CepSpec

/** Per-match MEASURES projection — the MATCH_RECOGNIZE `MEASURES` clause
  * for the CEP SQL surface (`CepSql`): turn a match frame (key + one
  * `array<long>` of bound order ids per pattern name) into ONE FLAT ROW
  * PER MATCH of scalar aggregates, the relational-facing output shape.
  *
  * Two evaluation tiers, chosen per measure:
  *
  *  - POSITIONAL (`COUNT(a)`, `FIRST(a)`, `LAST(a)`): pure column
  *    expressions over the binding arrays (`size`/`get`) — no join, no
  *    shuffle, whole-stage codegen.
  *  - ATTRIBUTE (`SUM(a.v)`, `MIN/MAX(a.v)`, `FIRST/LAST(a.v)`): the
  *    match operator only retains order ids (keeping match state
  *    O(pattern) instead of O(events)), so attribute measures join the
  *    exploded bindings back to the event table on (key, order) and
  *    re-aggregate per match. One shuffle join + one aggregation per
  *    DISTINCT PATTERN NAME used (measures on the same name share the
  *    join); the match side is a fraction of the event side, so AQE
  *    picks a broadcast at typical selectivities.
  *
  * Empty bindings (a `{0,n}` loop that took zero events) yield COUNT 0
  * and NULL for every other measure — `get` out-of-bounds is NULL and
  * the attribute path left-joins — mirroring SQL aggregate-over-empty.
  */
object CepMeasures {

  sealed trait Fn extends Serializable { def sqlName: String }
  object Fn {
    case object Count extends Fn { val sqlName = "COUNT" }
    case object First extends Fn { val sqlName = "FIRST" }
    case object Last extends Fn { val sqlName = "LAST" }
    case object Sum extends Fn { val sqlName = "SUM" }
    case object Min extends Fn { val sqlName = "MIN" }
    case object Max extends Fn { val sqlName = "MAX" }
    val all: Vector[Fn] = Vector(Count, First, Last, Sum, Min, Max)
    def fromName(s: String): Fn = all.find(_.sqlName == s).getOrElse(
      throw new IllegalArgumentException(
        s"MEASURES: unknown function '$s' (expected one of " +
          all.map(_.sqlName).mkString(", ") + ")"))
  }

  /** One measure: `fn(name)` (positional — `attr` empty) or
    * `fn(name.attr)` (attribute). `COUNT` is positional-only;
    * `SUM`/`MIN`/`MAX` need an attribute; `FIRST`/`LAST` allow both
    * (`FIRST(a)` = order id of the first bound event, `FIRST(a.v)` =
    * attribute `v` of that event).
    */
  final case class Measure(fn: Fn, name: String, attr: Option[String],
      alias: String) {
    fn match {
      case Fn.Count => require(attr.isEmpty,
        s"MEASURES: COUNT($name) takes no attribute")
      case Fn.Sum | Fn.Min | Fn.Max => require(attr.isDefined,
        s"MEASURES: ${fn.sqlName}($name) needs an attribute " +
          s"(${fn.sqlName}($name.attr))")
      case _ => ()
    }
  }

  /** Project `measures` over a match frame produced by the `SparkCep`
    * operators from `events` under `spec`. Output: the key column (when
    * keyed) followed by one column per measure, in declared order.
    */
  def project(matches: DataFrame, events: DataFrame, query: CepQuery,
      spec: CepSpec, measures: Vector[Measure]): DataFrame = {
    require(measures.nonEmpty, "MEASURES: empty measure list")
    val names = SparkCep.patternNames(query.patseq)
    measures.foreach { m =>
      require(names.contains(m.name),
        s"MEASURES: '${m.name}' is not a pattern name " +
          s"(have ${names.mkString(", ")})")
      m.attr.foreach(a => require(
        a == spec.orderCol || spec.attrCols.contains(a),
        s"MEASURES: attribute '$a' is not in the CEP spec " +
          s"(order '${spec.orderCol}', attrs ${spec.attrCols.mkString(", ")})"))
    }
    measures.groupBy(_.alias).foreach { case (a, ms) =>
      require(ms.length == 1, s"MEASURES: duplicate alias '$a'") }

    def positional(m: Measure): Column = m.fn match {
      case Fn.Count => size(col(m.name)).cast(LongType)
      case Fn.First => get(col(m.name), lit(0))
      case Fn.Last  => get(col(m.name), size(col(m.name)) - 1)
      case other => throw new IllegalStateException(
        s"${other.sqlName} is attribute-only") // unreachable (ctor check)
    }

    val attrMeasures = measures.filter(_.attr.isDefined)
    val base =
      if (attrMeasures.isEmpty) matches
      else {
        // __mid identifies a match row across the explode/aggregate
        // round trip; its values never reach the output, only equality
        val withMid = matches.withColumn("__mid",
          monotonically_increasing_id())
        val keyed = spec.keyCol.isDefined
        val attrsNeeded = attrMeasures.flatMap(_.attr).distinct
        val evProj = events.select(
          SparkCep.keyExpr(events, spec).as("__k") +:
            col(spec.orderCol).cast(LongType).as("__ord") +:
            attrsNeeded.map(a =>
              col(a).cast(LongType).as(s"__a_$a")): _*)
        attrMeasures.groupBy(_.name).toVector.sortBy(_._1)
          .foldLeft(withMid) { case (acc, (nm, ms)) =>
            val keyCols =
              if (keyed) Seq(col(spec.keyCol.get).as("__k")) else Seq.empty
            val exploded = withMid.select(
              col("__mid") +: keyCols :+ explode(col(nm)).as("__ord"): _*)
            val joinKeys = if (keyed) Seq("__k", "__ord") else Seq("__ord")
            val joined = exploded.join(evProj, joinKeys)
            val aggs = ms.map { m =>
              val a = col(s"__a_${m.attr.get}")
              (m.fn match {
                case Fn.Sum   => sum(a)
                case Fn.Min   => min(a)
                case Fn.Max   => max(a)
                case Fn.First => min_by(a, col("__ord"))
                case Fn.Last  => max_by(a, col("__ord"))
                case Fn.Count => throw new IllegalStateException(
                  "COUNT is positional-only") // unreachable (ctor check)
              }).as(m.alias)
            }
            val perMatch = joined.groupBy(col("__mid"))
              .agg(aggs.head, aggs.tail: _*)
            // left: a measure over an empty binding stays NULL
            acc.join(perMatch, Seq("__mid"), "left")
          }
      }

    val keyOut = spec.keyCol.filter(matches.columns.contains)
      .map(col).toSeq
    val outCols = keyOut ++ measures.map { m =>
      if (m.attr.isEmpty) positional(m).as(m.alias) else col(m.alias)
    }
    base.select(outCols: _*)
  }

  /** One-call convenience: match `st.query` over `df` on the
    * Catalyst-planned operator and project `st.measures`.
    */
  def run(df: DataFrame, st: CepSql.CepSqlStatement,
      spec: CepSpec): DataFrame =
    project(SparkCep.matchPatternExec(df, st.query, spec), df, st.query,
      spec, st.measures)
}
