package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Text-analysis operators for large-scale training-data pipelines: token
  * counting, quality scoring, language-ID, document fingerprinting.
  *
  * All are pure narrow transformations (no shuffle, fully codegen-friendly
  * `org.apache.spark.sql.functions` expressions — no UDFs), so they pipeline
  * into whatever scan/filter precedes them and scale linearly with input
  * splits. Every output is integer/string-typed so results hash identically
  * across engines (driver's DuckDB oracle compare).
  */
object TextOps {

  /** Whitespace tokens, empty-safe (multi-space gaps yield no empty tokens). */
  def tokens(text: Column): Column =
    // array_remove == the filter-HOF form (null in → null out, all empty
    // strings dropped, order kept) but fully codegen: HOF lambdas are
    // CodegenFallback and evaluate interpreted per element — measured
    // 15-30% slower on token-heavy stages (HofLab, round-18
    // optimization); equality spec-pinned in TextOpsSpec
    array_remove(split(text, " "), "")

  /** Exact long integral division (SQL `div` / Catalyst `IntegralDivide`):
    * stays in 64-bit integer arithmetic where `Column./` would round-trip
    * through double and lose exactness past 2^53.
    */
  private[graft] def longDiv(a: Column, b: Column): Column =
    org.apache.spark.sql.graftbridge.GraftColumnBridge.column(
      new org.apache.spark.sql.catalyst.expressions.IntegralDivide(
        org.apache.spark.sql.graftbridge.GraftColumnBridge.expression(a),
        org.apache.spark.sql.graftbridge.GraftColumnBridge.expression(b)))

  /** Canonical text normalization for dedup: strip punctuation, collapse
    * whitespace, trim, lowercase — the standard pre-dedup step so that
    * formatting variants of the same document collapse together.
    */
  def normalize(text: Column): Column =
    lower(trim(regexp_replace(translate(text, ".,!?;:", ""), "\\s+", " ")))

  /** Token count, distinct-token count, observed char length, punctuation
    * count, and a 0–1000 lexical-diversity quality score
    * (`1000 * distinct / total`, integer division).
    */
  def textStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    df.select(
      col(idCol),
      size(toks).cast(LongType).as("n_tokens"),
      size(array_distinct(toks)).cast(LongType).as("n_distinct"),
      length(col(textCol)).cast(LongType).as("n_chars_obs"),
      (length(col(textCol)) -
        length(translate(col(textCol), ".,!?;:", "")))
        .cast(LongType).as("n_punct"),
      // integer division via floor on an exact double quotient (counts are
      // far below 2^53); built from the same typed columns, so any textCol
      // name works (no SQL-string splicing)
      when(size(toks) > 0,
        floor(size(array_distinct(toks)).cast(DoubleType) * 1000d /
          size(toks).cast(DoubleType)))
        .otherwise(0L).cast(LongType).as("qscore_milli"))
  }

  /** Marker-token sets per language for the language-ID heuristic. Fixed,
    * deterministic, and small enough to replicate in the SQL oracle.
    * Alphabetical language order doubles as the arg-max tie-break.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "das"),
    "en" -> Seq("the", "a", "and", "of", "to"),
    "es" -> Seq("el", "la", "de", "que", "los"),
    "fr" -> Seq("le", "la", "les", "et", "des"),
    "zh" -> Seq("de5", "shi4", "le5", "zai4", "he2"))

  /** N-gram-free language-ID heuristic: score = number of token occurrences
    * from each language's marker set; predict the arg-max (ties broken by
    * language name order), `und` when every score is zero.
    */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val scored = df.select(
      col(idCol) +:
        langMarkers.map { case (lang, markers) =>
          size(filter(toks, t => t.isin(markers.map(lit): _*)))
            .cast(LongType).as(s"score_$lang")
        }: _*)
    val mx = greatest(langMarkers.map { case (l, _) => col(s"score_$l") }: _*)
    // Alphabetically-first language wins ties: fold so the first marker list
    // becomes the outermost WHEN (same CASE order as the SQL oracle).
    val pred = langMarkers.reverse.foldLeft(lit("und")) {
      case (other, (lang, _)) =>
        when(col(s"score_$lang") === mx && mx > 0, lit(lang)).otherwise(other)
    }
    scored.withColumn("lang_pred", pred)
  }

  /** English stopword set for quality heuristics (small, fixed,
    * replicable in the SQL oracle).
    */
  val stopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "of", "to", "in", "is", "it", "that",
    "for", "on", "with", "as", "was", "at", "by", "be", "this", "are")

  /** Document-quality heuristics in the standard pre-training-filter
    * style (all ratios in exact integer millis):
    *  - `stop_ratio_milli`: stopword fraction of tokens (natural prose
    *    has some; ~0 signals boilerplate/code/tables);
    *  - `mean_word_len_milli`: mean token length (extremes signal junk);
    *  - `punct_ratio_milli`: punctuation chars per char;
    *  - `quality_ok`: the composite gate (has tokens, some stopwords,
    *    sane word length, punctuation below 20%).
    */
  /** The quality-metric columns over a text column, shared by the scoring
    * frame and the inline gate predicate.
    */
  private def qualityCols(textCol: Column)
      : (Column, Column, Column, Column) = {
    val toks = tokens(textCol)
    val nTok = size(toks).cast(LongType)
    val nStop = size(filter(toks,
      t => lower(t).isin(stopwords.map(lit): _*))).cast(LongType)
    // Σ length(token) == chars left after deleting the split character —
    // one codegen translate instead of an interpreted aggregate∘transform
    // HOF pass per doc (HofLab; equality pinned in TextOpsSpec)
    val charSum = length(translate(textCol, " ", "")).cast(LongType)
    val nPunct = (length(textCol) -
      length(translate(textCol, ".,!?;:", ""))).cast(LongType)
    // floor of an exact double quotient == integer division for these
    // magnitudes (numerators < 2^53; an exactly-integer quotient divides
    // exactly in IEEE)
    val stopRatio =
      when(nTok > 0, floor(nStop * 1000.0 / nTok)).otherwise(0L)
        .cast(LongType)
    val meanLen =
      when(nTok > 0, floor(charSum * 1000.0 / nTok)).otherwise(0L)
        .cast(LongType)
    val punctRatio = when(length(textCol) > 0,
      floor(nPunct * 1000.0 / length(textCol))).otherwise(0L)
      .cast(LongType)
    (nTok, stopRatio, meanLen, punctRatio)
  }

  /** The composite quality gate as a single boolean Column — usable as an
    * inline `filter` predicate that fuses into the scan (no metric frame,
    * no self-join back onto the corpus).
    */
  def qualityOk(textCol: Column): Column = {
    val (nTok, stopRatio, meanLen, punctRatio) = qualityCols(textCol)
    nTok > 0 && stopRatio > 0 && meanLen >= 2000 && meanLen <= 12000 &&
      punctRatio < 200
  }

  def qualityScore(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val (nTok, stopRatio, meanLen, punctRatio) = qualityCols(col(textCol))
    df.select(
      col(idCol),
      nTok.as("n_tokens"),
      stopRatio.as("stop_ratio_milli"),
      meanLen.as("mean_word_len_milli"),
      punctRatio.as("punct_ratio_milli"),
      (nTok > 0 && stopRatio > 0 && meanLen >= 2000 && meanLen <= 12000 &&
        punctRatio < 200).cast("boolean").as("quality_ok"))
  }

  /** GPT-2-style pre-tokenizer regex, reduced to the engine-portable core:
    * optional leading space + (letter run | digit run | other-symbol run).
    * Both Java regex (Spark) and RE2 (DuckDB) match it leftmost-first with
    * identical results. The unit of LLM budget accounting: counts
    * approximate BPE token counts far better than whitespace splitting
    * (every punctuation run and digit run is its own token).
    */
  val bpeishPattern = " ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 ]+"

  /** Whitespace token count plus the BPE-ish subword-ish token count. */
  def tokenCounts(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      size(tokens(col(textCol))).cast(LongType).as("n_ws"),
      size(regexp_extract_all(col(textCol), lit(bpeishPattern), lit(0)))
        .cast(LongType).as("n_bpeish"))

  /** Intra-document repetition score (the Gopher/RefinedWeb-style quality
    * signal): the fraction of n-gram occurrences that are repeats of an
    * earlier n-gram in the same doc, `(total − distinct) / total` in
    * exact integer millis. High repetition flags boilerplate, templated
    * spam, and looping generations. Narrow, codegen-friendly HOFs —
    * no shuffle, no UDF; docs shorter than n grams score 0.
    */
  def repetitionScore(df: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val toks = tokens(col(textCol))
    val grams = when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => concat_ws(" ", slice(toks, i + 1, lit(n)))))
      .otherwise(typedLit(Array.empty[String]))
    val total = size(grams).cast(LongType)
    val distinctN = size(array_distinct(grams)).cast(LongType)
    df.select(
      col(idCol),
      total.as("n_grams"),
      distinctN.as("n_distinct_grams"),
      when(total > 0,
        floor((total - distinctN).cast(DoubleType) * 1000d /
          total.cast(DoubleType)))
        .otherwise(0L).cast(LongType).as("rep_milli"))
  }

  /** Gopher-style repetition rules (Rae et al. 2021, Appendix A,
    * adapted to token mass): per document, the occurrence count of the
    * MOST FREQUENT 2/3/4-gram and the permille of token mass it covers
    * (`top_cnt · n · 1000 / n_tokens`, exact integer), plus the
    * composite flag at the paper's thresholds (top-2gram > 20%,
    * top-3gram > 18%, top-4gram > 16%). This is the signal family that
    * catches looping generations and templated spam that the
    * distinct/total ratio (`repetitionScore`) under-weights: one
    * dominant repeated phrase moves the top-gram mass far more than it
    * moves the distinct count.
    *
    * Scale: per-doc top-gram counting is NOT done with per-doc
    * quadratic HOFs (10k-token docs would pay O(n²) per row); the
    * n-grams for all three n explode in one pass and reduce by
    * (doc, n, gram) with map-side combine, then max per (doc, n) —
    * two hash shuffles on 8-byte-ish keys, like the other span ops.
    */
  def gopherRepetition(df: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    val toks = tokens(col(textCol))
    val base = df
      .filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast(LongType).as(idCol), toks.as("__toks"),
        size(toks).cast(LongType).as("n_tokens"))
    def gramsOf(n: Int) = {
      val t = col("__toks")
      when(size(t) >= n,
        transform(sequence(lit(0), size(t) - n),
          i => struct(lit(n).as("n"),
            concat_ws(" ", slice(t, i + 1, lit(n))).as("g"))))
        .otherwise(array().cast("array<struct<n:int,g:string>>"))
    }
    val exploded = base.select(col(idCol),
      explode(concat(gramsOf(2), gramsOf(3), gramsOf(4))).as("ng"))
      .select(col(idCol), col("ng.n").as("n"), col("ng.g").as("g"))
    val top = exploded
      .groupBy(col(idCol), col("n"), col("g"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col(idCol), col("n"))
      .agg(max(col("c")).as("top_cnt"))
    val wide = top.groupBy(col(idCol)).agg(
      max(when(col("n") === 2, col("top_cnt"))).as("__t2"),
      max(when(col("n") === 3, col("top_cnt"))).as("__t3"),
      max(when(col("n") === 4, col("top_cnt"))).as("__t4"))
    def milli(cnt: Column, n: Int) =
      // Exact integral division (SQL `div`, mirrors DuckDB `//` on the
      // non-negative operands here): Column./ on longs is DOUBLE division,
      // so truncate-after-divide would only match while cnt*n*1000 < 2^53.
      // IntegralDivide keeps the whole computation in long arithmetic.
      when(col("n_tokens") > 0,
        longDiv(cnt * lit(n.toLong * 1000L), col("n_tokens"))).otherwise(0L)
        .cast(LongType)
    val t2 = coalesce(col("__t2"), lit(0L))
    val t3 = coalesce(col("__t3"), lit(0L))
    val t4 = coalesce(col("__t4"), lit(0L))
    base.select(col(idCol), col("n_tokens"))
      .join(wide, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        t2.as("top2_cnt"), milli(t2, 2).as("top2_milli"),
        t3.as("top3_cnt"), milli(t3, 3).as("top3_milli"),
        t4.as("top4_cnt"), milli(t4, 4).as("top4_milli"))
      .withColumn("rep_flagged",
        col("top2_milli") > 200L || col("top3_milli") > 180L ||
          col("top4_milli") > 160L)
  }

  /** Polynomial rolling hash of the whole text (base 31, mod 1e9+7) — a
    * deterministic document fingerprint computable in both Spark and the
    * DuckDB oracle via the same char-code fold. Runs as a native
    * codegen'd Catalyst expression (`graft.functions.PolyHash`); the
    * interpreted `aggregate(transform(split(...)))` HOF formulation of
    * the same fold is pinned equal by `PolyHashSpec`.
    */
  def fingerprint(text: Column): Column =
    graft.functions.PolyHash.polyHash(text, 31L)

  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol), fingerprint(col(textCol)).as("fp"))

  // ========================= PII scrubbing ==========================

  /** Conservative, engine-portable PII patterns. Only constructs with
    * identical semantics in Java regex (Spark codegen path) and RE2
    * (DuckDB oracle) are used: literal classes, bounded repetition,
    * non-capturing groups, `\b`, `\d` — no backreferences or lookaround
    * (RE2 has neither). Deliberately high-precision/lower-recall: a
    * training-pipeline scrub must not mangle code or math, so these hit
    * unambiguous shapes only (a standards-shaped email, a
    * `+CC-NNN-NNNNNNN` international phone, a dotted-quad IPv4).
    */
  val emailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val phoneRe = "\\+\\d{1,3}-\\d{3}-\\d{4,8}\\b"
  val ipv4Re = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"

  /** Masked text: emails → `<EMAIL>`, then phones → `<PHONE>`, then
    * IPv4s → `<IP>`, in that fixed order (email domains may contain
    * digit runs the later patterns could otherwise chew on; masking
    * emails first makes the passes order-independent for real text).
    * Pure `regexp_replace` chain — codegen'd, narrow, no UDFs.
    */
  def piiMask(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, emailRe, "<EMAIL>"),
        phoneRe, "<PHONE>"),
      ipv4Re, "<IP>")

  /** Per-document PII scrub report: match counts per category (each
    * counted on the text with the previous categories already masked,
    * mirroring exactly what the mask pass replaces) plus the masked
    * text. Narrow single-pass plan.
    */
  def piiScrub(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val e = regexp_replace(t, emailRe, "<EMAIL>")
    val p = regexp_replace(e, phoneRe, "<PHONE>")
    df.select(col(idCol),
      regexp_count(t, lit(emailRe)).cast(LongType).as("n_emails"),
      regexp_count(e, lit(phoneRe)).cast(LongType).as("n_phones"),
      regexp_count(p, lit(ipv4Re)).cast(LongType).as("n_ips"),
      regexp_replace(p, ipv4Re, "<IP>").as("masked"))
  }

  // ========================== URL operations ==========================

  /** URL shape for extraction: `http(s)://host[:port][/path][?query]
    * [#fragment]`, with every component a literal character class so the
    * pattern means the same thing under Java regex (Spark) and RE2
    * (DuckDB oracle) — same discipline as the PII patterns above. The
    * query class excludes `?` and the fragment class excludes `#`, so a
    * URL splits unambiguously at the FIRST `?` / `#` (which is also what
    * the normalizer's `split_part` assumes).
    */
  val urlRe: String =
    "https?://[A-Za-z0-9.-]+(?::\\d{1,5})?(?:/[A-Za-z0-9._~%/+-]*)?" +
      "(?:\\?[A-Za-z0-9._~%&=+-]*)?(?:#[A-Za-z0-9._~%-]*)?"

  /** Canonical URL form — the standard crawl-dedup key. Steps (each a
    * codegen'd string expression, no UDFs, all engine-portable):
    *  1. drop the fragment (`#...` never reaches the server);
    *  2. lowercase scheme+host+port (authority is case-insensitive per
    *     RFC 3986 §6.2.2.1) while PRESERVING path/query case (those are
    *     case-sensitive);
    *  3. strip the scheme's default port (`:443` on https, `:80` on
    *     http);
    *  4. remove `utm_*` tracking parameters, keeping the remaining
    *     query-string parameter order (reordering would merge URLs that
    *     real servers may treat differently).
    * Null-safe: a null input yields null.
    */
  def urlNormalize(u: Column): Column = {
    val noFrag = regexp_replace(u, "#.*", "")
    // authority prefix = scheme://host[:port]; everything after it keeps
    // its case. regexp_extract returns "" on no match (malformed input),
    // making the substr below the whole string — normalize degrades to
    // the utm/fragment strip instead of corrupting.
    val prefix = regexp_extract(noFrag,
      "^(https?://[A-Za-z0-9.-]+(?::\\d{1,5})?)", 1)
    val rest = noFrag.substr(length(prefix) + 1, length(noFrag))
    val auth = regexp_replace(
      regexp_replace(lower(prefix), "^(https://[a-z0-9.-]+):443$", "$1"),
      "^(http://[a-z0-9.-]+):80$", "$1")
    val joined = concat(auth, rest)
    val base = split_part(joined, lit("?"), lit(1))
    val q = split_part(joined, lit("?"), lit(2))
    val kept = array_join(
      filter(split(q, "&"), p => !startswith(p, lit("utm_"))), "&")
    when(u.isNull, lit(null).cast(StringType))
      .when(q === "" || kept === "", base)
      .otherwise(concat(base, lit("?"), kept))
  }

  /** Host of a NORMALIZED (lowercased) URL; "" if malformed. */
  def urlHost(normalized: Column): Column =
    regexp_extract(normalized, "^https?://([a-z0-9.-]+)", 1)

  /** Registered-domain heuristic: last two labels of the host. (A real
    * deployment would consult the public-suffix list — a broadcast map
    * lookup with identical plan shape; two labels keeps the oracle
    * dependency-free and is exact for the common gTLDs.)
    */
  def urlDomain(host: Column): Column =
    regexp_extract(host, "([a-z0-9-]+\\.[a-z0-9-]+)$", 1)

  /** Per-document URL report: every URL in the text, exploded with its
    * match position, normalized, plus host and registered domain.
    * Narrow plan: extract + explode fuse into the scan; the only row
    * growth is the per-URL explosion itself.
    */
  def urlExtract(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol),
      posexplode(regexp_extract_all(col(textCol), lit(urlRe), lit(0)))
        .as(Seq("pos", "url")))
      .select(col(idCol), col("pos").cast(LongType).as("pos"),
        urlNormalize(col("url")).as("url"))
      .withColumn("host", urlHost(col("url")))
      .withColumn("domain", urlDomain(col("host")))
}
