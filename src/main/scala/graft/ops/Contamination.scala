package graft.ops

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Benchmark decontamination and duplicated-passage analysis — the two
  * n-gram-span curation signals a pre-training pipeline runs after dedup:
  *
  *   - `contaminationReport`: for every training document, how many of its
  *     distinct token n-grams also occur anywhere in a held-out benchmark
  *     set (the classic 13-gram eval-decontamination check, n configurable
  *     since short documents need shorter spans).
  *   - `dupPassageStats`: per document, the fraction of its n-gram span
  *     *occurrences* that appear in at least one other document —
  *     passage-level duplication (the signal behind "remove documents made
  *     of boilerplate", complementary to whole-doc near-dedup).
  *
  * Scale notes (design target ~100 TB of documents):
  *   - Spans are hashed to 8-byte keys (`DedupOps.tokenHash60Jvm`) in one
  *     narrow per-partition pass; no n-gram strings are ever shuffled. The
  *     DuckDB oracle applies the same hash, so collisions (if any) are
  *     mirrored and the compare stays exact.
  *   - The benchmark span set is bounded (eval suites are fixed-size, MBs
  *     not TBs) — it is broadcast, so the contamination check is a
  *     map-side semi join: one scan of the corpus, zero corpus shuffles
  *     beyond the per-doc count aggregation.
  *   - `dupPassageStats` shuffles the span index twice (doc-frequency
  *     aggregation, then the frequency join back) — both on the 8-byte
  *     hash; the index is cached because both consumers read it (caller
  *     releases via `spark.catalog.clearCache()`, same contract as
  *     `DedupOps`).
  */
object Contamination {

  /** Exploded (id, span-hash) index with one row per span occurrence
    * (positional spans — `DedupOps.spansJvm` — NOT distinct per doc, so
    * repeated passages inside a document count every time).
    */
  def spanIndex(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("sh", LongType, nullable = false)))
    df.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.flatMap { row =>
          // null text/id ⇒ absent from the index (matches SQL unnest-drop)
          if (row.isNullAt(0) || row.isNullAt(1)) Iterator.empty
          else {
            val id = row.getLong(0)
            DedupOps.spansJvm(row.getString(1), n).iterator
              .map(s => Row(id, DedupOps.tokenHash60Jvm(s)))
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Per-train-doc contamination against a benchmark corpus: distinct
    * n-gram spans, how many of them occur in the benchmark, the permille
    * ratio, and the contaminated flag. Every train doc is reported (clean
    * docs with `n_hit = 0`), so the output doubles as the keep-list after
    * an anti-join on `contaminated`.
    */
  def contaminationReport(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    // distinct spans per doc — standard decontamination counts unique
    // n-grams, so the (already-distinct) shingle index is the right input;
    // cached because both the count and the hit aggregation read it (same
    // caller-releases contract as DedupOps)
    val trainIdx = DedupOps.shingleIndex(train, idCol, textCol, n).cache()
    val benchSet = DedupOps.shingleIndex(bench, idCol, textCol, n)
      .select(col("sh")).distinct()
    // benchmark span sets are fixed-size (an eval suite, not a corpus):
    // broadcast ⇒ map-side semi join, no shuffle of the train index
    val hits = trainIdx.join(broadcast(benchSet), "sh")
      .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit"))
    trainIdx.groupBy(col(idCol)).agg(count(lit(1)).as("n_spans"))
      .join(hits, Seq(idCol), "left")
      .select(col(idCol), col("n_spans"),
        coalesce(col("n_hit"), lit(0L)).as("n_hit"))
      // n_spans ≥ 1 by construction (short docs yield the whole-doc span)
      .withColumn("contam_milli",
        floor(col("n_hit").cast(DoubleType) * 1000d /
          col("n_spans").cast(DoubleType)).cast(LongType))
      .withColumn("contaminated", col("n_hit") > 0)
  }

  /** The decontamination *gate*: the subset of `train` sharing no n-gram
    * span with the benchmark — a broadcast semi-join on span hashes
    * followed by one anti-join, skipping the per-doc counting that
    * `contaminationReport` does (use the report when you want the
    * numbers; use this inside pipelines where only the keep-set
    * matters). Row set identical to
    * `contaminationReport.filter(!contaminated)`.
    */
  def decontaminate(train: DataFrame, bench: DataFrame, idCol: String,
      textCol: String, n: Int = 5): DataFrame = {
    val trainIdx = DedupOps.shingleIndex(train, idCol, textCol, n)
    val benchSet = DedupOps.shingleIndex(bench, idCol, textCol, n)
      .select(col("sh")).distinct()
    val contaminatedIds = trainIdx.join(broadcast(benchSet), "sh")
      .select(col(idCol)).distinct()
    // null id/text rows never enter the index, so the anti-join alone
    // would KEEP them — drop them explicitly to honor the row-set
    // identity with the report path (which omits them entirely)
    train.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .join(contaminatedIds, Seq(idCol), "left_anti")
  }

  /** Exploded (id, pos, slen, span-hash) index — `spanIndex` plus the
    * 1-based start token position and token length of every span
    * occurrence, for operators that must map spans back onto token
    * indices (the substring scrub).
    */
  def spanIndexPos(df: DataFrame, idCol: String, textCol: String,
      n: Int): DataFrame = {
    val outSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("pos", LongType, nullable = false),
      StructField("slen", LongType, nullable = false),
      StructField("sh", LongType, nullable = false)))
    df.select(col(idCol).cast(LongType), col(textCol))
      .mapPartitions { rows =>
        rows.flatMap { row =>
          if (row.isNullAt(0) || row.isNullAt(1)) Iterator.empty
          else {
            val id = row.getLong(0)
            DedupOps.spansPosJvm(row.getString(1), n).iterator
              .map { case (pos, slen, s) =>
                Row(id, pos.toLong, slen.toLong, DedupOps.tokenHash60Jvm(s))
              }
          }
        }
      }(Encoders.row(outSchema))
  }

  /** Exact substring-dedup removal (the Lee et al. "Deduplicating
    * Training Data" move, in its boilerplate-scrub form): delete every
    * token covered by an n-gram span that occurs in ≥ `minDocs` distinct
    * documents. Per doc: original token count, removed token count, and
    * the scrubbed text (surviving tokens re-joined on single spaces).
    *
    * Semantics notes:
    *   - Default (`keepFirst = false`): ALL occurrences of a
    *     cross-document span are scrubbed — the boilerplate-removal
    *     semantics (headers, license blocks, templated spam vanish
    *     everywhere). `keepFirst = true` is the dedup semantics: each
    *     span's canonical keeper (min doc id) retains its occurrences.
    *     Note the per-SPAN guarantee does not compose to per-passage:
    *     when overlapping spans have different keepers, a doc can lose
    *     tokens inside a span it keeps, so a long duplicated passage
    *     may survive nowhere intact (deletion is never weaker than
    *     documented, only stronger).
    *   - Docs shorter than n tokens are their own single span, so a
    *     short doc duplicated elsewhere scrubs to empty.
    *
    * Scale: span strings never shuffle — the index carries 8-byte
    * hashes + two small ints. Shuffles: span doc-frequency (on `sh`),
    * frequency join back (on `sh`), covered-index dedup + anti-join
    * (on (id, token-index)), final per-doc re-assembly (on id). All keys
    * are ≤ 16 bytes; the rebuilt text is the only wide payload and it
    * moves exactly once, partitioned by doc id.
    *
    * Persists the covered-token index (bounded by duplication mass, two
    * longs per row) because the lazy result reads it twice; caller
    * releases via `CacheScope.withCaches`, the same contract as
    * `DedupOps.shingleIndex`.
    */
  def scrubDupPassages(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2, keepFirst: Boolean = false)
      : DataFrame = {
    val base = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(textCol))
    // NOT cached: the positional span index is ~n× wider than the corpus
    // (one row per span occurrence); materializing it in storage memory
    // starved task execution memory in a single-box run (measured: 5M
    // docs OOM an 8 GiB JVM from the ~130M-row cache + 32 concurrent
    // shuffle sorters) and would be a per-executor memory tax at cluster
    // scale too. Its two consumers instead each recompute it with one
    // narrow scan+hash pass over the (cached) corpus — strictly cheaper
    // than building and evicting a multi-GB columnar cache.
    val spans = spanIndexPos(base, idCol, textCol, n)
    // keepFirst=true is the Lee et al. dedup form: the span's canonical
    // keeper (min doc id holding it) retains its occurrences, every
    // other doc scrubs them (per span — see scaladoc for the
    // overlapping-span caveat). keepFirst=false (default) is the
    // boilerplate form: ALL occurrences go. Same plan either way; the
    // keeper column rides the existing doc-frequency aggregate for free.
    val dupSh = spans.select(col(idCol), col("sh")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("__nd"),
        min(col(idCol)).as("__keep"))
      .filter(col("__nd") >= minDocs)
      .select(col("sh"), col("__keep"))
    // token indices covered by some duplicated span occurrence; slen = 0
    // (empty doc) covers nothing — guarded because Spark's sequence()
    // would COUNT DOWN for start > stop instead of yielding empty.
    // NOT deduplicated: the anti-join below is existence-only, so a
    // distinct here would move the same rows through one extra shuffle
    // for nothing (overlap multiplicity is bounded by n anyway)
    val covered = spans.join(dupSh, "sh")
      .filter(col("slen") > 0L &&
        (if (keepFirst) col(idCol) =!= col("__keep") else lit(true)))
      .select(col(idCol),
        explode(sequence(col("pos"), col("pos") + col("slen") - 1L))
          .as("tidx"))
    reassembleScrubbed(base, covered, idCol, textCol)
  }

  /** Shared scrub tail: drop the `(id, tidx)` covered tokens from each
    * doc and re-join the survivors on single spaces, reporting original
    * and removed token counts. `covered` need not be distinct — the
    * anti-join is existence-only.
    *
    * CLEAN-DOC FAST PATH: only docs that actually have a covered token
    * go through the posexplode → anti-join → sort-collect reassembly
    * (one (id, tidx) row PER TOKEN — by far the widest shuffle of the
    * scrub). Docs untouched by any duplicated span — the overwhelming
    * majority of a real corpus — take a narrow per-row expression
    * (`array_join(tokens, " ")`, identical output by definition since
    * nothing is removed) and never enter the token shuffle. Measured
    * 2.5× on the 5M-doc probe at 3% duplication.
    */
  private def reassembleScrubbed(base: DataFrame, covered0: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    // covered feeds both the dirty-id set and the anti-join; cache it
    // rather than recompute the whole span pipeline twice. It holds only
    // DUPLICATED-token indices (2 longs/row), bounded by the corpus's
    // duplication mass — orders of magnitude under the span index.
    val covered = covered0.persist()
    // no distinct: semi/anti joins deduplicate in their build hash table
    // anyway, and skipping it saves an exchange per branch
    val dirtyIds = covered.select(col(idCol))
    val dirtyBase = base.join(dirtyIds, Seq(idCol), "left_semi")
    val toks = dirtyBase
      .select(col(idCol), posexplode(TextOps.tokens(col(textCol))))
      .select(col(idCol), (col("pos") + 1L).as("tidx"), col("col").as("tok"))
    val kept = toks.join(covered, Seq(idCol, "tidx"), "left_anti")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("__n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("tidx"), col("tok")))),
            s => s.getField("tok")), " ").as("clean_text"))
    val dirty = dirtyBase
      .select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast(LongType).as("n_tokens"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"),
        (col("n_tokens") - coalesce(col("__n_kept"), lit(0L)))
          .as("n_removed"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
    val clean = base.join(dirtyIds, Seq(idCol), "left_anti")
      .select(col(idCol),
        size(TextOps.tokens(col(textCol))).cast(LongType).as("n_tokens"),
        lit(0L).as("n_removed"),
        array_join(TextOps.tokens(col(textCol)), " ").as("clean_text"))
    clean.unionByName(dirty)
  }

  /** Maximal-repeat substring scrub — the published Lee et al.
    * semantics: duplicated n-gram span occurrences are first merged into
    * MAXIMAL duplicated regions per document (maximal runs of covered
    * token indices — gaps-and-islands over the span intervals), and only
    * regions of at least `minRepeatLen` tokens are deleted. With a
    * suffix array, Lee et al. find maximal repeats ≥ 50 tokens directly;
    * the n-gram cover of a repeated passage is exactly the union of its
    * overlapping duplicated n-grams, so merging the cover reconstructs
    * the maximal region (to n-gram resolution: region boundaries land on
    * span ends, and repeats shorter than n are only seen when a short
    * doc's whole-text span duplicates). Relative to the plain cover
    * scrub, the region filter stops the scrub from nibbling isolated
    * boilerplate n-grams and deletes only genuine long repeats — at
    * `minRepeatLen <= n` every region passes and the output equals
    * `scrubDupPassages` (property-tested).
    *
    * Scale: same shuffles as `scrubDupPassages` plus one per-doc window
    * (partitioned by id, ordered by position — islands merge in a single
    * ordered pass per doc; a doc's duplicated occurrences are bounded by
    * its token count, so no task-sized skew beyond the longest doc).
    */
  def scrubDupPassagesMaximal(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8, minDocs: Int = 2, minRepeatLen: Int = 50): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(minRepeatLen >= 1, s"minRepeatLen $minRepeatLen")
    val base = df.filter(col(idCol).isNotNull && col(textCol).isNotNull)
      .select(col(idCol).cast(LongType), col(textCol))
    // not cached — see scrubDupPassages: the span index is the wide
    // frame; recomputing it per consumer beats holding it in storage
    val spans = spanIndexPos(base, idCol, textCol, n)
    val dupSh = spans.select(col(idCol), col("sh")).distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("sh"))
    val occ = spans.join(dupSh, "sh")
      .filter(col("slen") > 0L)
      .select(col(idCol), col("pos"),
        (col("pos") + col("slen") - 1L).as("endp"))
    // gaps-and-islands: a new region starts where this span's first token
    // is beyond every previous span's end + 1 (touching runs merge — a
    // region is a maximal run of covered token indices)
    val wOrd = Window.partitionBy(col(idCol)).orderBy(col("pos"), col("endp"))
    val prevEnd = max(col("endp"))
      .over(wOrd.rowsBetween(Window.unboundedPreceding, -1))
    val islands = occ
      .withColumn("__new",
        when(prevEnd.isNull || col("pos") > prevEnd + 1L, 1L).otherwise(0L))
      .withColumn("__isl",
        sum(col("__new")).over(wOrd.rowsBetween(Window.unboundedPreceding, 0)))
    val covered = islands.groupBy(col(idCol), col("__isl"))
      .agg(min(col("pos")).as("rstart"), max(col("endp")).as("rend"))
      .filter(col("rend") - col("rstart") + 1L >= minRepeatLen)
      .select(col(idCol),
        explode(sequence(col("rstart"), col("rend"))).as("tidx"))
    reassembleScrubbed(base, covered, idCol, textCol)
  }

  /** Cross-slice leakage matrix: for every pair of `groupCol` values
    * (sources, dumps, train/eval splits), the number of distinct token
    * n-grams present in both slices. The audit a pipeline runs before
    * mixing crawls: two sources sharing much of their passage mass
    * should not both be upweighted, and any span overlap between a
    * training source and an eval slice is contamination. Passage-level
    * (n-gram spans, not whole docs), so partially-copied content counts.
    *
    * Scale: spans reduce to 8-byte hashes in the scan (no text
    * shuffles); (group, hash) deduplicates with one shuffle; the pair
    * join runs on the hash with fan-out bounded by the number of groups
    * sharing it (dozens of sources, not data-sized), then aggregates to
    * one row per group pair.
    */
  def groupOverlapMatrix(df: DataFrame, textCol: String,
      groupCol: String, n: Int = 8): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("g", StringType, nullable = false),
      StructField("sh", LongType, nullable = false)))
    val idx = df.select(col(groupCol).cast(StringType), col(textCol))
      .mapPartitions { rows =>
        rows.flatMap { row =>
          if (row.isNullAt(0) || row.isNullAt(1)) Iterator.empty
          else {
            val g = row.getString(0)
            DedupOps.shinglesJvm(row.getString(1), n).iterator
              .map(s => Row(g, DedupOps.tokenHash60Jvm(s)))
          }
        }
      }(Encoders.row(outSchema))
      .distinct()
    idx.select(col("g").as("g1"), col("sh"))
      .join(idx.select(col("g").as("g2"), col("sh")), "sh")
      .filter(col("g1") < col("g2"))
      .groupBy(col("g1"), col("g2"))
      .agg(count(lit(1)).as("n_shared"))
  }

  /** Per-doc duplicated-passage statistics: total span occurrences, span
    * occurrences whose n-gram appears in ≥ 2 distinct documents, and the
    * permille duplicated fraction.
    */
  def dupPassageStats(df: DataFrame, idCol: String, textCol: String,
      n: Int = 8): DataFrame = {
    val spans = spanIndex(df, idCol, textCol, n).cache()
    // doc frequency per span hash: distinct (doc, span) first so intra-doc
    // repeats don't inflate the cross-document count
    val docFreq = spans.distinct()
      .groupBy(col("sh")).agg(count(lit(1)).as("__ndocs"))
    spans.join(docFreq, "sh")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_spans"),
        sum(when(col("__ndocs") >= 2, 1L).otherwise(0L)).as("n_dup"))
      .withColumn("dup_milli",
        floor(col("n_dup").cast(DoubleType) * 1000d /
          col("n_spans").cast(DoubleType)).cast(LongType))
  }

  /** Bloom-filter decontamination — the constant-memory scale path.
    *
    * The exact gate (`decontaminate`) broadcasts the benchmark's full
    * distinct span-hash set; fine for one eval suite, but a combined
    * benchmark battery can reach GBs of 8-byte hashes. A Bloom filter
    * caps the broadcast at `bitsPerSpan` BITS per benchmark span
    * (default 32 ⇒ 4 GB of hash set becomes 64 MB of filter) at the
    * price of a deterministic, oracle-mirrored false-positive rate of
    * ~`(1-e^(-k·n/m))^k` ≈ 8e-4 per probed span — conservative in the
    * right direction for decontamination (a false positive DROPS a
    * training doc, never leaks benchmark data in).
    *
    * Everything is integer arithmetic so a SQL oracle replays the
    * filter bit-for-bit: `m = max(1024, bitsPerSpan·|bench spans|)`,
    * probe positions by double hashing `p_j = (h mod m + j·(1 + h mod
    * (m-1))) mod m` for `j < k` — no floating point, no
    * engine-specific hash. The filter is built DISTRIBUTED: each
    * partition of the distinct benchmark hashes ORs its bits into a
    * local bitset and `treeAggregate` merges them, so the driver only
    * ever holds filter-sized arrays (the thing being shipped anyway) —
    * never the raw hash set. The filter ships as ONE broadcast read by
    * a per-partition probe — the corpus-side plan is a narrow scan +
    * the per-doc count aggregation, identical in shape to the exact
    * path.
    *
    * Output (one row per train doc): `n_spans`, `n_hit_exact`,
    * `n_hit_bloom`, `bloom_contaminated`. Invariant `n_hit_bloom ≥
    * n_hit_exact` (no false negatives) is property-tested; the exact
    * column makes the report double as a measured-FP audit, but it
    * joins the full benchmark span index against the corpus — at the
    * battery scale that motivates the Bloom path, pass
    * `exactAudit = false` to skip it (the column reads null) and keep
    * the constant-memory property the filter exists for.
    * Caches the train span index; caller releases (`clearCache`).
    */
  def bloomContaminationReport(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 5,
      bitsPerSpan: Int = 32, k: Int = 3,
      exactAudit: Boolean = true): DataFrame = {
    require(k >= 1, s"k=$k"); require(bitsPerSpan >= 1, s"bits=$bitsPerSpan")
    val spark = train.sparkSession
    import spark.implicits._
    val benchSh = DedupOps.shingleIndex(bench, idCol, textCol, n)
      .select(col("sh")).distinct()
    val nBench = benchSh.count()
    val m = math.max(1024L, bitsPerSpan.toLong * nBench)
    val bloom = buildBloomBits(benchSh, m, k)
    val trainIdx = DedupOps.shingleIndex(train, idCol, textCol, n).cache()
    val probed = probeBloom(trainIdx, idCol, bloom)
    val bloomAgg = probed.groupBy(col(idCol)).agg(
      count(lit(1)).as("n_spans"), sum(col("bhit")).as("n_hit_bloom"))
    val audited = if (exactAudit) {
      // no broadcast hint: the optimizer broadcasts a small bench index
      // on its own, and a battery-sized one must be allowed to shuffle
      val exactHits = trainIdx.join(benchSh, "sh")
        .groupBy(col(idCol)).agg(count(lit(1)).as("n_hit_exact"))
      bloomAgg.join(exactHits, Seq(idCol), "left")
        .withColumn("n_hit_exact",
          coalesce(col("n_hit_exact"), lit(0L)))
    } else bloomAgg.withColumn("n_hit_exact", lit(null).cast(LongType))
    audited.select(col(idCol), col("n_spans"), col("n_hit_exact"),
      col("n_hit_bloom"),
      (col("n_hit_bloom") > 0).as("bloom_contaminated"))
  }

  /** The broadcast-able Bloom bitset (k-fold double-hashed over 60-bit
    * span hashes). Building runs a `treeAggregate` over the DISTINCT
    * bench spans; probing is STATELESS, which is what makes the filter
    * usable unchanged on a stream (`StreamingDecontamSpec`): the bitset
    * is built once from the static benchmark and broadcast, each
    * micro-batch probes narrowly.
    */
  final case class BloomBits(words: Array[Long], m: Long, k: Int)

  def buildBloomBits(spanHashes: DataFrame, m: Long, k: Int): BloomBits = {
    val spark = spanHashes.sparkSession
    import spark.implicits._
    val nWords = ((m + 63) / 64).toInt
    val words = spanHashes.as[Long].rdd
      .treeAggregate(new Array[Long](nWords))(
        seqOp = { (w, h) =>
          var j = 0
          while (j < k) {
            val p = (h % m + j * (1L + h % (m - 1))) % m
            w((p >> 6).toInt) |= 1L << (p & 63)
            j += 1
          }
          w
        },
        combOp = { (a, b) =>
          var i = 0
          while (i < a.length) { a(i) |= b(i); i += 1 }
          a
        })
    BloomBits(words, m, k)
  }

  /** Probe a span index (`idCol`, `sh`) against the broadcast bitset:
    * one `bhit` row per span occurrence. Stateless narrow pass.
    */
  def probeBloom(spanIdx: DataFrame, idCol: String,
      bloom: BloomBits): DataFrame = {
    val spark = spanIdx.sparkSession
    val bc = spark.sparkContext.broadcast(bloom.words)
    val probeSchema = StructType(Seq(
      StructField(idCol, LongType, nullable = false),
      StructField("bhit", LongType, nullable = false)))
    val (mm, kk) = (bloom.m, bloom.k)
    spanIdx.select(col(idCol).cast(LongType), col("sh"))
      .mapPartitions { rows =>
        val w = bc.value
        rows.map { r =>
          val h = r.getLong(1)
          var j = 0
          var all = true
          while (all && j < kk) {
            val p = (h % mm + j * (1L + h % (mm - 1))) % mm
            all = ((w((p >> 6).toInt) >>> (p & 63).toInt) & 1L) == 1L
            j += 1
          }
          Row(r.getLong(0), if (all) 1L else 0L)
        }
      }(Encoders.row(probeSchema))
  }
}
