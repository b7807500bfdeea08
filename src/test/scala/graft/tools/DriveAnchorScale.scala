package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.cep._

/** Scale probe for the round-11 CEP additions:
  *
  *  1. ANCHOR SKIP AS A STATE BOUND — nd-relaxed pairs keep one waiting
  *     run per seen loop-head event under NoSkip (per-key state grows
  *     linearly with the key's lifetime: the shape that needs the
  *     maxRuns valve), while `SkipToLast` prunes every older taken run
  *     at each match — O(1) live runs per key REGARDLESS of lifetime,
  *     no valve needed. The probe runs the same pattern both ways on
  *     the same synthetic keyed volume and prints the skew gauge's max
  *     live-run count + wall time for each.
  *
  *  2. TIMEOUT SIDE OUTPUT AT VOLUME — `timedOutPartials` on a
  *     windowed funnel over the same volume: within-pruning bounds the
  *     run set by the window span, and the timeout projection adds no
  *     shuffle beyond the match operator's single key exchange.
  *
  * Event mix per synthetic id (deterministic splitmix hash): 2% "click",
  * 5% "purchase", 5% "signup", rest "view" — a sparse-pattern stream,
  * as in real entity logs.
  *
  * Usage: DriveAnchorScale [threads] [nEvents] [nKeys]
  */
object DriveAnchorScale {
  def main(args: Array[String]): Unit = {
    val threads = args.headOption.getOrElse("8")
    val spark = SparkSession.builder().master(s"local[$threads]")
      .config("spark.sql.shuffle.partitions", threads)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = args.lift(1).map(_.toLong).getOrElse(4000000L)
    val k = args.lift(2).map(_.toInt).getOrElse(1000)

    val mix = udf { (id: Long) =>
      var z = id + 0x9E3779B97F4A7C15L
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      z = z ^ (z >>> 31)
      val u = (z >>> 11) % 100L
      if (u < 2) "click" else if (u < 7) "purchase"
      else if (u < 12) "signup" else "view"
    }
    val events = spark.range(n).select(
      (col("id") % k).as("user_id"),
      col("id").as("event_id"),
      mix(col("id")).as("event_type"),
      (col("id") % 97).as("value")).cache()
    events.count()

    val spec = SparkCep.CepSpec(Some("user_id"), "event_id",
      "event_type", Seq("value"))
    val schema = Vector("click" -> Vector("event_id", "value"),
      "purchase" -> Vector("event_id", "value"),
      "signup" -> Vector("event_id", "value"),
      "view" -> Vector("event_id", "value"))
    val pairs = Pattern.lpat("a", "click", "True", Contiguity.NdRelaxed,
      2, 2)

    def probe(name: String, strat: AfterMatchStrategy,
        cap: Option[Int]): Unit = {
      val acc = CepSkewAccumulator.registered(spark, s"skew_$name")
      val t0 = System.nanoTime()
      val m = SparkCep.matchPattern(events,
        CepQuery(pairs, schema, strat), spec, maxRunsPerKey = cap,
        skewAcc = Some(acc)).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"$name%-14s matches=$m%9d maxLiveRuns=${acc.value.maxRuns}%6d " +
        f"wall=$sec%6.1f s  (${n / sec / 1e6}%4.1f M ev/s)")
    }
    println(s"== anchor-skip state bound: nd-relaxed pairs, n=$n k=$k ==")
    probe("NoSkip", AfterMatchStrategy.NoSkip, Some(100000))
    probe("SkipToLast", AfterMatchStrategy.SkipToLast("a"), Some(100000))

    println(s"== timeout side output: signup->purchase within 50 ==")
    val funnel = CepQuery(
      Pattern.Combine(Contiguity.Relaxed,
        Pattern.spat("s", "signup", "True"),
        Pattern.spat("p", "purchase", "True")),
      schema, within = Some(50))
    val t0 = System.nanoTime()
    val timeouts = SparkCep.timedOutPartials(events, funnel, spec).count()
    val sec0 = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val matches = SparkCep.matchPattern(events, funnel, spec).count()
    val sec1 = (System.nanoTime() - t1) / 1e9
    println(f"timeouts=$timeouts%9d wall=$sec0%6.1f s; " +
      f"matches=$matches%9d wall=$sec1%6.1f s")
    spark.stop()
  }
}
