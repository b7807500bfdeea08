package graft.ops

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoders, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016) — trained on the
  * corpus, committed as a merges artifact, applied distributedly.
  *
  * Training: word-frequency table → each word as characters + `</w>` →
  * repeatedly merge the globally most frequent adjacent symbol pair
  * (ties broken by (left, right) lexicographic order so the committed
  * artifact is deterministic), recording `(rank, l, r)`. Runs in
  * `graft.tools.TrainBpe`; inference never re-derives ranks.
  *
  * Application (the standard algorithm): start from characters +
  * `</w>`, repeatedly find the LOWEST-RANK pair present and merge all
  * its non-overlapping occurrences left to right, until no committed
  * pair applies. Each step removes ≥ 1 symbol, so a word of n chars
  * terminates in ≤ n steps — the bound the SQL oracle's unrolled
  * step chain relies on.
  *
  * Scale: the merge table is a few KB broadcast; tokenization is a
  * narrow per-partition pass with a per-partition word→tokens memo
  * (natural-language corpora repeat words heavily — the memo makes the
  * pass O(distinct words), not O(tokens)). No shuffle anywhere in
  * scoring; the vocab query aggregates (token, count) with map-side
  * combine.
  */
object Bpe {

  val endMark = "</w>"

  val mergesPath = s"${Codebooks.defaultDir}/bpe_merges.parquet"

  /** One committed merge rule: `l + r → lr` at priority `rank`. */
  final case class Merge(rank: Int, l: String, r: String)

  /** Word → initial symbol sequence (characters + the end marker). */
  def initSymbols(word: String): Vector[String] =
    word.map(_.toString).toVector :+ endMark

  /** Merge ALL non-overlapping occurrences of (l, r), left to right —
    * the single merge-pass semantics shared by training and inference
    * (and mirrored by the oracle's string `replace`).
    */
  def mergePass(syms: Vector[String], l: String, r: String)
      : Vector[String] = {
    val out = Vector.newBuilder[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
        out += (l + r)
        i += 2
      } else {
        out += syms(i)
        i += 1
      }
    }
    out.result()
  }

  /** Train `numMerges` rules from a word-frequency table. Deterministic:
    * pair counts are exact longs, the argmax tie-breaks on the pair
    * itself, and iteration order never matters.
    */
  def train(wordFreq: Seq[(String, Long)], numMerges: Int): Seq[Merge] = {
    var words: Vector[(Vector[String], Long)] =
      wordFreq.sortBy(_._1).map { case (w, f) => (initSymbols(w), f) }.toVector
    val merges = Vector.newBuilder[Merge]
    var rank = 0
    var done = false
    while (rank < numMerges && !done) {
      val counts = mutable.Map.empty[(String, String), Long]
      words.foreach { case (syms, f) =>
        var i = 0
        while (i + 1 < syms.length) {
          val k = (syms(i), syms(i + 1))
          counts(k) = counts.getOrElse(k, 0L) + f
          i += 1
        }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), c) = counts.toSeq
          .minBy { case ((l, r), c) => (-c, l, r) }
        if (c < 2L) done = true // a pair seen once compresses nothing
        else {
          merges += Merge(rank, l, r)
          words = words.map { case (syms, f) => (mergePass(syms, l, r), f) }
          rank += 1
        }
      }
    }
    merges.result()
  }

  /** Tokenize one word against the rank table: repeatedly apply the
    * lowest-rank pair present.
    */
  def tokenizeWord(word: String, ranks: Map[(String, String), Int])
      : Vector[String] = {
    var syms = initSymbols(word)
    var continue = true
    while (continue && syms.length > 1) {
      var best: Int = Int.MaxValue
      var bl: String = null
      var br: String = null
      var i = 0
      while (i + 1 < syms.length) {
        ranks.get((syms(i), syms(i + 1))).foreach { rk =>
          if (rk < best) { best = rk; bl = syms(i); br = syms(i + 1) }
        }
        i += 1
      }
      if (bl == null) continue = false
      else syms = mergePass(syms, bl, br)
    }
    syms
  }

  private def wordsOf(text: String): Array[String] =
    text.split(" ").filter(_.nonEmpty)

  private val statsSchema = StructType(Seq(
    StructField("doc_id", LongType, nullable = false),
    StructField("n_words", LongType, nullable = false),
    StructField("n_bpe_tokens", LongType, nullable = false),
    StructField("fertility_milli", LongType, nullable = false)))

  /** Per-doc tokenization stats: word count, BPE token count, and
    * fertility (tokens per word, permille, exact integral division;
    * 0 for empty docs). Narrow pass, ranks broadcast, word→length memo
    * per partition.
    */
  def tokenStats(df: DataFrame, idCol: String, textCol: String,
      merges: Seq[Merge]): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(
      merges.map(m => (m.l, m.r) -> m.rank).toMap)
    df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        val ranks = bc.value
        val memo = mutable.Map.empty[String, Long]
        rows.map { r =>
          val ws = wordsOf(r.getString(1))
          var toks = 0L
          ws.foreach { w =>
            toks += memo.getOrElseUpdate(w,
              tokenizeWord(w, ranks).length.toLong)
          }
          val nw = ws.length.toLong
          val fert = if (nw == 0L) 0L else toks * 1000L / nw
          Row(r.getLong(0), nw, toks, fert)
        }
      }(Encoders.row(statsSchema))
  }

  /** Corpus subword vocabulary: top-k learned tokens by occurrence —
    * the artifact-quality check (real subwords like `er</w>`/`st`
    * surface, not raw characters). One explode of the memoized
    * per-word tokenizations, map-side combined count.
    */
  def vocabTopK(df: DataFrame, textCol: String, merges: Seq[Merge],
      k: Int): DataFrame = {
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(
      merges.map(m => (m.l, m.r) -> m.rank).toMap)
    val tokSchema = StructType(Seq(
      StructField("token", StringType, nullable = false)))
    val toks = df.filter(col(textCol).isNotNull)
      .select(col(textCol))
      .mapPartitions { rows =>
        val ranks = bc.value
        val memo = mutable.Map.empty[String, Vector[String]]
        rows.flatMap { r =>
          wordsOf(r.getString(0)).iterator.flatMap(w =>
            memo.getOrElseUpdate(w, tokenizeWord(w, ranks)))
            .map(Row(_))
        }
      }(Encoders.row(tokSchema))
    import org.apache.spark.sql.expressions.Window
    toks.groupBy(col("token")).agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("token"))
      .limit(k)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("cnt").desc, col("token"))))
      .select(col("rnk"), col("token"), col("cnt"))
  }

  def writeMerges(spark: SparkSession, path: String,
      merges: Seq[Merge]): Unit = {
    val schema = StructType(Seq(
      StructField("rank", LongType, nullable = false),
      StructField("l", StringType, nullable = false),
      StructField("r", StringType, nullable = false)))
    spark.createDataFrame(
        spark.sparkContext.parallelize(
          merges.map(m => Row(m.rank.toLong, m.l, m.r)), 1), schema)
      .write.mode("overwrite").parquet(path)
  }

  def loadMerges(spark: SparkSession, path: String): Seq[Merge] =
    LocalParquet.collect(spark, path).getOrElse(
        graft.ops.ParquetSchema.read(spark, path).collect())
      .map(r => Merge(r.getLong(0).toInt, r.getString(1), r.getString(2)))
      .sortBy(_.rank).toSeq

  /** DuckDB CTE chain replaying BPE application EXACTLY, ending in
    * `bpe(word, toks)` for every distinct corpus word.
    *
    * The trick that makes the merge loop plain SQL: a tokenization
    * encodes as `~t1~~t2~…~tn~` (each symbol wrapped in `~`, adjacency
    * = `~~`), and one BPE merge pass — "merge all non-overlapping
    * (l, r) left to right" — is then literally
    * `replace(enc, '~l~~r~', '~lr~')`, because SQL `replace` scans left
    * to right without overlap and the wrapping keeps a consumed
    * separator from hiding the next occurrence. Each applied step
    * removes ≥ 1 symbol, so ≤ `steps` = max word length + 1 chained
    * CTEs reach the fixed point — no recursive CTE, no restricted
    * aggregation. Each step joins the current encodings against the
    * committed merges, takes the lowest-rank applicable pair per word
    * (`row_number` over rank), and rewrites; words with no applicable
    * pair pass through unchanged. Every CTE is MATERIALIZED: each step
    * references its predecessor twice, so inlining would double the
    * plan per step (2^steps scans of the corpus — observed as an
    * open-file explosion before the hint).
    *
    * Assumes `~` appears in no corpus word (the fixtures are alnum) —
    * the JVM side is list-based and has no such constraint.
    */
  def tokenizeSql(steps: Int, wordsCte: String): String = {
    val step = (k: Int) =>
      s"""s${k + 1} AS MATERIALIZED (
         |  SELECT s.word,
         |    CASE WHEN b.l IS NULL THEN s.enc
         |      ELSE replace(s.enc, '~' || b.l || '~~' || b.r || '~',
         |                   '~' || b.l || b.r || '~') END AS enc
         |  FROM s$k s LEFT JOIN (
         |    SELECT word, l, r FROM (
         |      SELECT s2.word, mm.l, mm.r,
         |        row_number() OVER (PARTITION BY s2.word ORDER BY mm.rank)
         |          AS rn
         |      FROM s$k s2 JOIN wm mm
         |        ON contains(s2.enc, '~' || mm.l || '~~' || mm.r || '~')
         |    ) WHERE rn = 1
         |  ) b ON b.word = s.word)""".stripMargin
    s"""wm AS MATERIALIZED (SELECT rank, l, r
       |       FROM read_parquet('$mergesPath/*.parquet')),
       |w0 AS MATERIALIZED ($wordsCte),
       |s0 AS MATERIALIZED (
       |  SELECT word, '~' || array_to_string(
       |    list_append(list_transform(generate_series(1, length(word)),
       |      i -> word[i]), '$endMark'), '~~') || '~' AS enc
       |  FROM w0),
       |${(0 until steps).map(step).mkString(",\n")},
       |bpe AS MATERIALIZED (
       |  SELECT word,
       |    string_split(substr(enc, 2, length(enc) - 2), '~~') AS toks
       |  FROM s$steps)""".stripMargin
  }
}
