package graft.operators

import graft.{QueryModule, Tables}
import graft.functions.BloomPrune
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-data pipeline operators over `documents`/`orders`/`lineitem` —
  * the dataset-engineering layer a 100 TB corpus build needs around the
  * relay's raw stream (BASELINE north-star; the reference itself stops at
  * ingest, `/root/reference/kinesis.go:68-93`, so everything here is the
  * Spark-side continuation of that pipeline).
  *
  * Design rules shared by all five:
  *   - Determinism from content hashes, never RNG: splits and samples key
  *     on `md5(doc_id || salt)`, so assignment is stable across runs,
  *     executors, and engines (Spark and DuckDB md5 agree byte-for-byte) —
  *     the property a reproducible training run needs. No `rand()`, which
  *     is per-task-attempt nondeterministic and un-oracle-checkable.
  *   - Narrow per-row work: hashing/regex is O(len) per row with no
  *     row-proportional shuffle except the final small aggregates.
  *   - The bloom-pruned join demonstrates semi-join reduction for the case
  *     where BOTH sides are too big to broadcast: a byte-bounded bloom of
  *     the dimension keys prunes the fact scan before the only real
  *     shuffle, with an exact join after it so false positives never reach
  *     the result.
  */
object Pipeline extends QueryModule {

  private def docsTable(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")

  /** 64-bit-ish uniform bucket in [0, 100) from a salted md5 — the
    * engine-portable deterministic hash (see graft oracle rules: 15 hex
    * digits = 60 bits fits a signed long in both engines). */
  private def hashBucket(id: org.apache.spark.sql.Column, salt: String, mod: Int) =
    // native md5_hash60 ≡ conv(substring(md5(s),1,15),16,10) (property-
    // pinned); oracles keep the SQL idiom, values are bit-identical
    pmod(graft.functions.TextExpressions.md5Hash60Col(
      concat(id.cast("string"), lit(salt))), lit(mod))

  /** Deterministic train/val/test split (80/10/10) by salted content hash.
    * One narrow projection + one tiny aggregate; at 100 TB the per-split
    * assignment is a zero-shuffle map and downstream writers partition by
    * `split`. Changing the salt re-rolls the split; changing the corpus
    * does NOT move previously-assigned docs between splits (stability —
    * the property epoch-resumable training relies on). */
  def hashSplit(docs: DataFrame): DataFrame =
    docs
      .withColumn("bucket", hashBucket(col("doc_id"), ":split", 100))
      .withColumn("split",
        when(col("bucket") < 80, "train").when(col("bucket") < 90, "val").otherwise("test"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("sum_chars"),
        min(col("doc_id")).as("min_doc"), max(col("doc_id")).as("max_doc"))
      .orderBy(col("split"))

  def hashSplit(spark: SparkSession, dir: String): DataFrame =
    hashSplit(docsTable(spark, dir))

  /** Stratified deterministic sample: k docs per language, ranked by a
    * salted hash (so the sample is uniform-at-random w.r.t. the salt but
    * identical on every run). One shuffle on the stratum key; per-group
    * state is the rank counter only. For 100 TB strata a full sort per
    * stratum is wasteful — swap the window for a per-partition top-k
    * (the q25 pattern) once k ≪ stratum size; at sampling rates worth
    * training on, this exact form is the readable baseline. */
  def stratifiedSample(docs: DataFrame, k: Int = 10): DataFrame =
    docs
      .withColumn("rn", row_number().over(Window.partitionBy(col("lang"))
        .orderBy(graft.functions.TextExpressions.md5Hash60Col(
          concat(col("doc_id").cast("string"), lit(":sample"))), col("doc_id"))))
      .filter(col("rn") <= k)
      .select(col("lang"), col("doc_id"), col("rn"))
      .orderBy(col("lang"), col("rn"))

  def stratifiedSample(spark: SparkSession, dir: String): DataFrame =
    stratifiedSample(docsTable(spark, dir))

  /** q168 — WEIGHTED sample without replacement (Efraimidis–Spirakis
    * exponential keys), the quality-weighted corpus-sampling primitive the
    * uniform q69/q93/q146 family can't express: each doc draws priority
    * key ln(u)/w with u hash-uniform in (0,1] and w = its weight
    * (n_chars here; a quality score in production), and the global top-k
    * by key IS a weight-proportional sample — one distributed
    * TakeOrdered, no per-group state, no RNG (the repo's no-rand()
    * discipline: u comes from the salted md5 idiom, so the sample is
    * identical across runs, partitionings, and engines). At 100 TB the
    * top-k is the same per-partition-heap + driver-merge every
    * `ORDER BY … LIMIT k` compiles to — no global sort. The key is
    * rounded before ranking (q74 discipline; doc_id breaks residual
    * ties) so both engines rank identically. */
  def weightedSample(docs: DataFrame, k: Int = 50): DataFrame =
    docs
      .withColumn("u", (graft.functions.TextExpressions.md5Hash60Col(
          concat(col("doc_id").cast("string"), lit(":aes"))) + 1L).cast("double")
        / lit(1.152921504606846976e18))
      .withColumn("key", round(log(col("u")) / col("n_chars"), 12) + lit(0.0))
      .orderBy(col("key").desc, col("doc_id"))
      .limit(k)
      .select(col("doc_id"), col("n_chars").as("w"), col("key"))

  def weightedSample(spark: SparkSession, dir: String): DataFrame =
    weightedSample(docsTable(spark, dir))

  /** Boilerplate/stopword scrub: drop noise tokens, collapse whitespace,
    * emit a content signature + removed-char count per doc. The regex is
    * ASCII word-boundary only, so Java and RE2 agree; on a real corpus the
    * alternation comes from a boilerplate-ngram table instead of a literal
    * list. Pure map — no shuffle at all (the orderBy is presentation). */
  def scrub(docs: DataFrame): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(col("text"), "\\b(the|a|row|value|data)\\b", ""), " +", " "))
    docs.select(col("doc_id"), md5(cleaned).as("clean_sig"),
        (length(col("text")) - length(cleaned)).as("n_removed"))
      .orderBy(col("doc_id"))
  }

  def scrub(spark: SparkSession, dir: String): DataFrame =
    scrub(docsTable(spark, dir))

  /** Corpus heavy hitters: top-20 tokens by document frequency. The
    * explode→distinct→count shape is the exact form of the df() table the
    * dedup stop-shingle prune ([[Dedup]] MaxDf) and any tf-idf weighting
    * consume. Map-side: `array_distinct` dedupes within a doc BEFORE the
    * distinct shuffle, so the shuffle carries ≤ vocab-per-doc rows, and the
    * final count aggregates partially per partition. */
  def heavyHitters(docs: DataFrame, topK: Int = 20): DataFrame =
    docs
      .select(col("doc_id"), explode(array_distinct(split(col("text"), " "))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok"))
      .agg(count(lit(1)).cast("long").as("df"))
      .orderBy(col("df").desc, col("tok"))
      .limit(topK)

  def heavyHitters(spark: SparkSession, dir: String): DataFrame =
    heavyHitters(docsTable(spark, dir))

  /** q180 — PHRASE SEARCH over a positional inverted index: find documents
    * containing the EXACT token sequence `phrase`, with match count and
    * first position — the proximity primitive (quoted-query search,
    * boilerplate-phrase detection, n-gram provenance lookup) that the
    * bag-of-words ops (q71/q74/q116) cannot express because they discard
    * positions. The classic IR plan, Spark-shaped: the postings build is
    * ONE tokenize+explode emitting (token, doc, position) — the inverted
    * index every search engine materializes (at corpus scale it is written
    * once, partitioned by token, and probed by many queries) — and a
    * k-token phrase is (k−1) EQUI-joins on (doc_id, start) where each
    * term's postings are rebased by its phrase offset (pos − i), turning
    * positional adjacency into plain key equality that hash-joins and
    * co-partitions. The `tok IN phrase` prune sits directly on the
    * tokenizer output (plan-pinned), so only the phrase terms' postings
    * ever reach a shuffle — the posting-list-intersection cost model; on a
    * MATERIALIZED token-partitioned index the same predicate becomes
    * partition pruning and the corpus scan disappears entirely. Counts are
    * exact; positions 1-based like the oracle's `generate_subscripts`. */
  def phraseSearch(docs: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    val post = docs
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase: _*))
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      post.filter(col("tok") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    parts.reduce((l, r) => l.join(r, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("start")) + 1).cast("int").as("first_pos"))
      .orderBy(col("doc_id"))
  }

  def phraseSearch(spark: SparkSession, dir: String): DataFrame =
    phraseSearch(docsTable(spark, dir), Seq("table", "hash"))

  private[graft] val PhraseIndexBuckets = 64

  /** The q185 postings projection: one explode of the docs' token
    * stream, hash-bucketed by token — shared by the initial build and
    * every incremental append so all generations carry the identical
    * layout. `gen` tags the ingest batch that produced each posting
    * (generation 0 = the initial build); probes ignore it, ops use it. */
  private def postings(docs: DataFrame, gen: Int): DataFrame = docs
    .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
    .filter(col("tok") =!= "")
    .withColumn("gen", lit(gen))
    .withColumn("bucket",
      pmod(xxhash64(col("tok")), lit(PhraseIndexBuckets.toLong)).cast("int"))

  /** q185's index build: the q180 postings WRITTEN ONCE as parquet,
    * hive-partitioned by a hash bucket of the token — the materialized
    * inverted index a search deployment maintains. Probes then read ONLY
    * the phrase terms' bucket directories (partition pruning — proved
    * file-level in `PartitionPruningSpec`, the q165 discipline), so query
    * cost scales with the phrase's posting lists, not the corpus. At
    * 100 TB the build is the indexing job (one explode + one partitioned
    * write); each ingest batch then APPENDS its generation of postings via
    * [[phraseIndexAppend]] — new files land inside the existing bucket
    * dirs, so probe pruning is generation-oblivious. */
  def phraseIndexDir(spark: SparkSession, dir: String): String =
    Materialize.parquetDir(
      s"phrase-idx:$dir@${Materialize.snapshot(s"$dir/documents.parquet")}",
      "graft-phrase-idx-", Seq("bucket")) {
      postings(docsTable(spark, dir), gen = 0)
    }

  /** Incremental index append — the ingest-batch reality of a search
    * index (VERDICT r13 #7): a new batch of docs is exploded with the
    * SAME bucketing expression and appended as parquet files INSIDE the
    * existing `bucket=` dirs. No rewrite, no compaction needed for
    * correctness: a probe's partition filter selects bucket dirs, and
    * every generation's files for those buckets are read together —
    * access-path-identical to a fresh full build (spec-verified, plus a
    * file-listing proof that multi-generation probes stay pruned). */
  def phraseIndexAppend(indexDir: String, newDocs: DataFrame, gen: Int): Unit =
    postings(newDocs, gen)
      .write.partitionBy("bucket").mode("append").parquet(indexDir)

  /** q185 — [[phraseSearch]] answered from the MATERIALIZED index: same
    * result (the oracle is literally q180's), different access path — the
    * bucket literals are computed driver-side with the SAME catalyst
    * expression that bucketed the write, so the filter lands in
    * `PartitionFilters` and the non-phrase buckets' files are never
    * opened. */
  def phraseSearchIndexed(spark: SparkSession, dir: String,
                          phrase: Seq[String]): DataFrame =
    phraseIndexProbe(spark, phraseIndexDir(spark, dir), phrase)

  /** The probe against an EXPLICIT index dir — generation-oblivious by
    * construction (it never mentions `gen`), so a freshly-built index and
    * one that grew through [[phraseIndexAppend]] batches answer through
    * the identical plan. Shared by q185 and the multi-generation spec. */
  def phraseIndexProbe(spark: SparkSession, indexDir: String,
                       phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty)
    import org.apache.spark.sql.catalyst.expressions.{Literal, Pmod, XxHash64}
    def bucketOf(t: String): Int =
      Pmod(XxHash64(Seq(Literal(t)), 42L), Literal(PhraseIndexBuckets.toLong))
        .eval(null).asInstanceOf[Long].toInt
    val buckets = phrase.map(bucketOf).distinct
    val idx = spark.read.parquet(indexDir)
      .filter(col("bucket").isin(buckets: _*) && col("tok").isin(phrase: _*))
    val parts = phrase.zipWithIndex.map { case (t, i) =>
      idx.filter(col("tok") === t)
        .select(col("doc_id"), (col("pos") - i).as("start"))
    }
    parts.reduce((l, r) => l.join(r, Seq("doc_id", "start")))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_matches"),
        (min(col("start")) + 1).cast("int").as("first_pos"))
      .orderBy(col("doc_id"))
  }

  def phraseSearchIndexed(spark: SparkSession, dir: String): DataFrame =
    phraseSearchIndexed(spark, dir, Seq("table", "hash"))

  /** Threshold-triggered bucket compaction — the maintenance op the q185
    * append path eventually needs (VERDICT r14 #5): every ingest batch
    * appends one-or-more small files per touched bucket, and a bucket
    * whose file count passes `maxFiles` gets its generations rewritten
    * into ONE file, sorted by (tok, doc_id, pos) for probe row-group
    * locality. The `gen` VALUES are preserved (the rewrite is a physical
    * re-layout, not a logical merge), so generation-aware ops keep
    * working and the spec can prove both generations survive. Compaction
    * is per-bucket, so an index can be probed "mid-compaction" — some
    * buckets compacted, others still multi-file — and answers are
    * identical by construction (spec-pinned).
    *
    * Swap discipline on a plain filesystem: the replacement file is
    * written OUTSIDE the bucket dir — in a dot-prefixed scratch dir UNDER
    * THE INDEX ROOT, so (a) it lives on the same filesystem and the
    * ATOMIC_MOVE guarantee actually holds (ADVICE r15: a system-tmp
    * scratch dir throws AtomicMoveNotSupportedException whenever the
    * index is mounted elsewhere), and (b) Spark's data-source listing
    * skips it (dot-prefixed paths are hidden), so even a racing probe
    * never sees half-written parts — moved in under a unique name, and
    * only then are the superseded files deleted — a reader that races the
    * swap can transiently double-read postings between move-in and
    * delete, which a real deployment prevents with a table format's
    * atomic snapshot commit (Iceberg/Delta); single-writer maintenance
    * windows (this op's contract) never observe it. Stale Hadoop `.crc`
    * sidecars of deleted parts are removed alongside. Directory streams
    * (`Files.list`/`Files.walk`) are closed eagerly (ADVICE r15: the
    * unclosed streams leaked one fd per bucket).
    *
    * @return the compacted bucket ids (empty = nothing passed threshold) */
  def phraseIndexCompact(spark: SparkSession, indexDir: String,
                         maxFiles: Int = 4): Seq[Int] = {
    import graft.Tfs
    val fs = Tfs.of(indexDir)
    // purge scratch left by a previous crashed compaction (a crash between
    // the parquet write and the cleanup walk would otherwise leave the
    // half-written tree under the index root forever) — safe under this
    // op's single-writer maintenance contract
    fs.dirsWithPrefix(indexDir, ".graft-phrase-compact-").foreach(fs.rmTree)
    val bucketDirs = fs.dirsWithPrefix(indexDir, "bucket=").sorted
    val compacted = Seq.newBuilder[Int]
    bucketDirs.foreach { bd =>
      val old = fs.parquets(bd)
      if (old.length > maxFiles) {
        val bucketId = Tfs.name(bd).stripPrefix("bucket=").toInt
        // same-filesystem scratch (the Tfs move contract holds), hidden
        // from Spark's listing by the dot prefix
        val tmp = fs.mkScratch(indexDir, ".graft-phrase-compact-")
        try {
          spark.read.parquet(bd)
            .repartition(1).sortWithinPartitions("tok", "doc_id", "pos")
            .write.mode("overwrite").parquet(tmp)
          fs.parquets(tmp).zipWithIndex.foreach { case (nf, i) =>
            fs.move(nf, Tfs.child(bd,
              s"compacted-${java.util.UUID.randomUUID}-$i.parquet"))
          }
          old.foreach { f =>
            fs.deleteIfExists(f)
            fs.deleteIfExists(Tfs.crcSibling(f))
          }
        } finally fs.rmTree(tmp) // scratch never outlives the bucket's attempt
        compacted += bucketId
      }
    }
    compacted.result()
  }

  /** Bloom-pruned fact-dimension join: build a bloom filter over the
    * filtered dimension's keys (one scalar-subquery aggregate → a few KB),
    * prune the fact scan with `might_contain` BEFORE the join shuffle, then
    * run the exact join so false positives are eliminated — result is
    * bit-identical to the plain join. This is Spark's own runtime-filter
    * rewrite (`InjectRuntimeFilter`) made explicit and unconditional: at
    * 100 TB it cuts the shuffled fact rows to ~the matching fraction while
    * shipping only the bloom's bytes, where a broadcast join would ship the
    * whole dimension and a plain SMJ would shuffle every fact row. */
  def bloomPrunedJoin(spark: SparkSession, dir: String): DataFrame = {
    val urgent = Tables(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    val pruned = BloomPrune.bloomPrune(
      Tables(spark, dir, "lineitem"), col("l_orderkey"),
      urgent.select(col("o_orderkey")), expectedItems = 100000L)
    pruned
      .join(urgent.select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).cast("long").as("n_items"))
      .orderBy(col("l_returnflag"))
  }

  /** Shard-parallel sequence packing: assign docs to fixed-token-budget
    * training sequences. Real packers run per worker; this models that as
    * per-shard running sums (window over shard, never a global order —
    * a single global cumsum is the textbook anti-scale window). pack_id =
    * exclusive-prefix-tokens div budget: deterministic, one shuffle on the
    * shard key, per-shard state is one running sum. */
  def packSequences(docs: DataFrame, budget: Int = 2048, shards: Int = 8): DataFrame =
    manifestOf(packAssign(docs, budget, shards))

  /** The (shard, pack_id) manifest of a pack assignment — n_docs and
    * pack_tokens per training pack, the shared readout of q73/q220/q223. */
  def manifestOf(assign: DataFrame): DataFrame =
    assign
      .groupBy(col("shard"), col("pack_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).cast("long").as("pack_tokens"))
      .orderBy(col("shard"), col("pack_id"))

  /** The per-doc half of [[packSequences]]: each doc's (shard, pack_id,
    * n_tok) assignment — the manifest aggregates it; writers (the q220
    * curation export) join it back to payloads and lay files out by it. */
  def packAssign(docs: DataFrame, budget: Int, shards: Int): DataFrame =
    packAssignTok(docs.select(col("doc_id"),
      size(split(col("text"), " ")).as("n_tok")), budget, shards)

  /** [[packAssign]] over a frame already carrying `(doc_id, n_tok)` —
    * the token counter is the caller's choice (whitespace here,
    * BPE-encoded in the q223 tokenizer-true export); the window rule
    * (per-shard exclusive-prefix-sum div budget, one shuffle on the
    * shard key) is the ONE shared packing discipline. */
  def packAssignTok(toks: DataFrame, budget: Int, shards: Int): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toks
      .select(col("doc_id"), (col("doc_id") % shards).as("shard"),
        col("n_tok"))
      .withColumn("prefix", sum(col("n_tok")).over(w) - col("n_tok"))
      .select(col("doc_id"), col("shard"),
        expr(s"prefix div $budget").as("pack_id"), col("n_tok"))
  }

  def packSequences(spark: SparkSession, dir: String): DataFrame =
    packSequences(docsTable(spark, dir))

  /** TF-IDF top terms per document. df comes from the FULL corpus (one
    * token-shuffle aggregate, vocabulary-sized result) and joins back to
    * the per-doc tf table on the token — a uniform, vocabulary-cardinality
    * key; the corpus-size scalar rides in via a broadcast single-row
    * aggregate, NOT a driver-side count. Scores are rounded BEFORE ranking
    * so the rank order is identical across engines (ln differs from libm
    * log only past the 6th decimal, if at all). */
  def tfIdfTop(docs: DataFrame, probe: org.apache.spark.sql.Column, topN: Int = 3): DataFrame = {
    val tok = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
    val tf = tok.filter(probe).groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("tf"))
    val df = tok.groupBy(col("tok"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val n = docs.agg(count(lit(1)).as("n"))
    tf.join(df, "tok")
      .crossJoin(broadcast(n))
      .withColumn("tfidf",
        round(col("tf") * log(col("n").cast("double") / col("df")), 6))
      .withColumn("rnk", row_number().over(Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("tok"))))
      .filter(col("rnk") <= topN)
      .select(col("doc_id"), col("tok"), col("tfidf"), col("rnk"))
      .orderBy(col("doc_id"), col("rnk"))
  }

  def tfIdfTop(spark: SparkSession, dir: String): DataFrame =
    tfIdfTop(docsTable(spark, dir), col("doc_id") < 50)

  /** Benchmark decontamination (the GPT-3-style n-gram scrub): drop
    * training docs sharing any token 5-gram with the held-out set (here:
    * `source = src0` stands in for the benchmark corpus). The gram join is
    * an equi-join whose build side — the DISTINCT benchmark grams — is
    * benchmark-sized, i.e. tiny next to a 100 TB training corpus, so it
    * broadcasts and the corpus never shuffles for candidate detection;
    * only the contaminated doc-id set (smaller still) joins back. */
  def decontaminate(docs: DataFrame, isBenchmark: org.apache.spark.sql.Column,
                    n: Int = 5): DataFrame = {
    val grams = docs.select(col("doc_id"), isBenchmark.as("bench"),
      explode(graft.functions.TextExpressions.tokenShingles(col("text"), n)).as("gram"))
    val benchGrams = grams.filter(col("bench")).select(col("gram")).distinct()
    val contaminated = grams.filter(!col("bench"))
      .join(broadcast(benchGrams), "gram")
      .select(col("doc_id")).distinct()
      .withColumn("is_cont", lit(1))
    docs.filter(!isBenchmark)
      .join(contaminated, Seq("doc_id"), "left_outer")
      .groupBy(col("lang"))
      .agg(count(lit(1)).cast("long").as("n_docs"),
        count(col("is_cont")).cast("long").as("n_removed"))
      .orderBy(col("lang"))
  }

  def decontaminate(spark: SparkSession, dir: String): DataFrame =
    decontaminate(docsTable(spark, dir), col("source") === "src0")

  /** Data profiling (the Deequ-style pre-training sanity pass): per-column
    * non-null count, exact distinct count, min and max — for ANY DataFrame,
    * derived from its schema. All columns profile in ONE aggregation over
    * one scan; the exact multi-column distincts make Catalyst plan an
    * Expand (one shuffled pass per distinct column), which is the
    * oracle-checkable form — at 100 TB swap `countDistinct` for
    * `approx_count_distinct` and the Expand collapses to a single pass of
    * mergeable HLL sketches (the q21/q64 machinery). Output is long-format
    * `(col_name, n_nonnull, n_distinct, min_val, max_val)`, values cast to
    * string so the schema is uniform across column types. */
  def profile(df: DataFrame): DataFrame = {
    val cols = df.columns.sorted.toSeq
    // aggregation outputs are named positionally (_a0, _a1, ...) and the
    // long-format pivot is built with typed Columns, so source column names
    // containing spaces, dots, quotes, or backticks never enter a parsed
    // SQL string (the 'for ANY DataFrame' contract taken literally)
    val aggs = cols.zipWithIndex.flatMap { case (c, i) =>
      Seq(count(col(c)).as(s"_a${i * 4}"), countDistinct(col(c)).as(s"_a${i * 4 + 1}"),
        min(col(c)).cast("string").as(s"_a${i * 4 + 2}"),
        max(col(c)).cast("string").as(s"_a${i * 4 + 3}"))
    }
    val rows = cols.zipWithIndex.map { case (c, i) =>
      struct(lit(c).as("col_name"),
        col(s"_a${i * 4}").as("n_nonnull"), col(s"_a${i * 4 + 1}").as("n_distinct"),
        col(s"_a${i * 4 + 2}").as("min_val"), col(s"_a${i * 4 + 3}").as("max_val"))
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(rows: _*)).as("r"))
      .select(col("r.*"))
      .orderBy(col("col_name"))
  }

  def profile(spark: SparkSession, dir: String): DataFrame =
    profile(docsTable(spark, dir))

  /** Seeded deterministic global shuffle — the training-order permutation.
    * A training run needs every epoch's document order to be (a) uniform
    * w.r.t. a seed, (b) bit-identical on re-run/resume, and (c) computable
    * without a global sort bottleneck. Order key is `md5(seed ':' doc_id)`
    * (content-addressed, so re-running — or re-sharding — the corpus never
    * reorders previously-placed docs relative to each other).
    *
    * The global position is computed TeraSort-style in two phases rather
    * than one `row_number()` over an unpartitioned window (which would
    * funnel the whole corpus through a single task): (1) rank within each
    * of 256 buckets keyed by the hash's first byte — since the bucket is a
    * PREFIX of the order key, in-bucket order concatenated in bucket order
    * IS the global order; (2) add per-bucket offsets (exclusive prefix
    * sums of the 256 bucket counts — a 256-row window, driver-trivial,
    * broadcast back). At 100 TB each bucket ranks ~0.4% of the corpus in
    * parallel and nothing but the 256-row count table is ever centralized;
    * for 100k+ executors raise the prefix to 2 bytes (65 536 buckets) —
    * same plan. Writers then `repartitionByRange(pos)` into epoch shards. */
  def seededShuffle(docs: DataFrame, seed: String = "42"): DataFrame = {
    val d = docs.select(col("doc_id"),
        graft.functions.TextExpressions.md5Hash60Col(
          concat(lit(seed + ":"), col("doc_id").cast("string"))).as("h"))
      .withColumn("bucket", shiftright(col("h"), 52).cast("int"))
    val ranked = d.withColumn("rn", row_number()
      .over(Window.partitionBy(col("bucket")).orderBy(col("h"), col("doc_id")))
      .cast("long"))
    val offsets = d.groupBy(col("bucket")).agg(count(lit(1)).as("cnt"))
      .withColumn("off", coalesce(
        sum(col("cnt")).over(Window.orderBy(col("bucket"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("bucket"), col("off"))
    ranked.join(broadcast(offsets), Seq("bucket"))
      .select(col("doc_id"), (col("rn") + col("off")).as("pos"))
      .orderBy(col("pos"))
  }

  def seededShuffle(spark: SparkSession, dir: String): DataFrame =
    seededShuffle(docsTable(spark, dir))

  /** Domain-mixture resampling to fixed per-domain token budgets — the
    * DoReMi/Pile-style mixing step: given target token counts per language
    * (the domain weights a mixture law prescribes), select a deterministic
    * uniform subset of each language's docs that fills its budget. Docs
    * are ordered by a salted content hash (uniform-at-random w.r.t. the
    * salt, stable across runs) and taken while the tokens BEFORE the doc
    * are under budget — so each budget is exceeded by at most one doc,
    * and the selection is a prefix of a fixed permutation (growing a
    * budget only ADDS docs; re-mixing never churns the already-selected
    * set).
    *
    * Scale shape: the naive form is one `row_number` + running-sum window
    * per language — but a language is exactly the skewed partition key a
    * 100 TB corpus punishes (English would be one task). So the running
    * token sum is computed with the same two-phase trick as
    * [[seededShuffle]]: in-(lang, hash-prefix-bucket) cumulative sums in
    * parallel, plus per-(lang,bucket) exclusive offsets (a ≤ 256×n_langs
    * row aggregate, broadcast). Output is identical to the single-window
    * form — the oracle IS the single-window form — but no task ever sees
    * more than a bucket of one language. */
  def mixtureResample(docs: DataFrame): DataFrame = {
    val t = docs.select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("n_tok"))
      .withColumn("target_tok",
        when(col("lang") === "en", 2800L)
          .when(col("lang") === "de", 1600L)
          .when(col("lang") === "es", 1600L)
          .when(col("lang") === "fr", 1200L)
          .otherwise(800L))
      .withColumn("h", graft.functions.TextExpressions.md5Hash60Col(
        concat(col("doc_id").cast("string"), lit(":mix"))))
      .withColumn("bucket", shiftright(col("h"), 52).cast("int"))
    val inBucket = Window.partitionBy(col("lang"), col("bucket"))
      .orderBy(col("h"), col("doc_id"))
    val local = t
      .withColumn("rn_b", row_number().over(inBucket).cast("long"))
      .withColumn("cum_b", sum(col("n_tok"))
        .over(inBucket.rowsBetween(Window.unboundedPreceding, 0)))
    val acrossBuckets = Window.partitionBy(col("lang")).orderBy(col("bucket"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = t.groupBy(col("lang"), col("bucket"))
      .agg(count(lit(1)).as("cnt"), sum(col("n_tok")).as("tok_sum"))
      .withColumn("rk_off", coalesce(sum(col("cnt")).over(acrossBuckets), lit(0L)))
      .withColumn("tok_off", coalesce(sum(col("tok_sum")).over(acrossBuckets), lit(0L)))
      .select(col("lang"), col("bucket"), col("rk_off"), col("tok_off"))
    local.join(broadcast(offsets), Seq("lang", "bucket"))
      .withColumn("rk", (col("rn_b") + col("rk_off")).cast("int"))
      .withColumn("cum_tok", col("cum_b") + col("tok_off"))
      .filter(col("cum_tok") - col("n_tok") < col("target_tok"))
      .select(col("lang"), col("rk"), col("doc_id"), col("n_tok"), col("cum_tok"))
      .orderBy(col("lang"), col("rk"))
  }

  def mixtureResample(spark: SparkSession, dir: String): DataFrame =
    mixtureResample(docsTable(spark, dir))

  /** Per-source document quota — the domain-cap curation pass web-scale
    * corpus builds run so no single site dominates the training mix
    * (C4/RefinedWeb-style per-domain caps): keep at most `cap` docs per
    * source, highest-quality first (n_chars desc, doc_id tiebreak), and
    * report the kept/dropped funnel per source.
    *
    * Scale shape: the naive form is one `row_number` window over `source`
    * — a full shuffle where one hot domain (a handful of sites is a double
    * -digit share of any web crawl) lands on ONE reducer. Instead the cap
    * is selected in TWO phases, the window analogue of q54's salted
    * aggregation: a window over (source, salt) keeps each sub-shard's
    * local top-`cap` — only rows that could make the global cut survive,
    * because a global top-`cap` row is top-`cap` within its own shard too
    * — then the global window ranks that ≤ salts·cap bounded set. The
    * only row-proportional shuffle is keyed (source, salt), uniform by
    * construction (xxhash64 of the unique doc_id); the salt never reaches
    * the output, so the oracle is the naive single-window form. Per-source
    * totals ride a second narrow scan as a map-side-combined aggregate
    * (3-column pushdown), and the per-source stats join is a broadcast of
    * source-cardinality rows. */
  def sourceQuota(docs: DataFrame, cap: Int = 15, salts: Int = 16): DataFrame = {
    val salted = docs.select(col("doc_id"), col("source"), col("n_chars"))
      .withColumn("salt", pmod(xxhash64(col("doc_id")), lit(salts)))
    val wLocal = Window.partitionBy(col("source"), col("salt"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val wGlobal = Window.partitionBy(col("source"))
      .orderBy(col("n_chars").desc, col("doc_id"))
    val kept = salted
      .withColumn("rn1", row_number().over(wLocal))
      .filter(col("rn1") <= cap)
      .withColumn("rn", row_number().over(wGlobal))
      .filter(col("rn") <= cap)
    val totals = docs.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"))
    val keptStats = kept.groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"),
        sum(col("n_chars")).cast("long").as("kept_chars"))
    totals.join(broadcast(keptStats), Seq("source"))
      .select(col("source"), col("n_docs"), col("n_kept"),
        (col("n_docs") - col("n_kept")).as("n_dropped"),
        col("total_chars"), col("kept_chars"))
      .orderBy(col("source"))
  }

  def sourceQuota(spark: SparkSession, dir: String): DataFrame =
    sourceQuota(docsTable(spark, dir))

  /** BM25 (Okapi) top-k retrieval for a literal query-term set — the lexical
    * retrieval primitive behind training-corpus search and RAG indexing
    * (Robertson & Zaragoza 2009; the `k1`/`b` defaults are the standard
    * Lucene/Elasticsearch 1.2/0.75). Single-scan shape: one tokenize →
    * per-doc aggregate (map-side combine) yields BOTH the doc length and
    * one conditional tf counter per query term, so the corpus shuffles
    * exactly once on doc_id; `stack` melts the per-term counters without a
    * second scan, and df/N/avgdl are term-count- and single-row-sized
    * aggregates that broadcast back. Nothing corpus-sized is joined or
    * re-scanned: at 100 TB the plan is scan → combine → tiny broadcasts,
    * with the final top-k a rounded-then-ranked TakeOrdered (q74's
    * round-before-rank rule, so rank order is engine-identical). */
  def bm25TopK(docs: DataFrame, terms: Seq[String], k1: Double = 1.2,
               b: Double = 0.75, topN: Int = 20): DataFrame = {
    val tfCols = terms.map(t => count(when(col("tok") === t, 1)).as(s"tf_$t"))
    val perDoc = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("dl"), tfCols: _*)
    val stats = perDoc.agg(count(lit(1)).as("n"), avg(col("dl")).as("avgdl"))
    val matched = perDoc.select(col("doc_id"), col("dl"),
      expr(s"stack(${terms.length}, " +
        terms.map(t => s"'$t', tf_$t").mkString(", ") + ") AS (term, tf)"))
      .filter(col("tf") > 0)
    val dfc = matched.groupBy(col("term")).agg(count(lit(1)).as("df"))
    matched.join(broadcast(dfc), "term")
      .crossJoin(broadcast(stats))
      .withColumn("idf",
        log((col("n") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0)))
      .withColumn("s", col("idf") * col("tf") * lit(k1 + 1.0) /
        (col("tf") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl"))))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).cast("int").as("n_terms"),
        (round(sum(col("s")), 6) + lit(0.0)).as("score"))
      // top-k first via distributed TakeOrdered, THEN rank: the row_number
      // window runs over ≤ topN rows, never the corpus-sized score set.
      .orderBy(col("score").desc, col("doc_id"))
      .limit(topN)
      .withColumn("rnk",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))).cast("int"))
      .select(col("rnk"), col("doc_id"), col("n_terms"), col("score"))
      .orderBy(col("rnk"))
  }

  /** Default query terms: mid-frequency corpus vocabulary, so scores spread
    * across meaningfully different df values. */
  val Bm25Terms: Seq[String] = Seq("spark", "join", "vector", "customer")

  def bm25TopK(spark: SparkSession, dir: String): DataFrame =
    bm25TopK(docsTable(spark, dir), Bm25Terms)

  /** RAG-style sliding-window chunking: fixed-size token windows with
    * overlap (size 64, stride 48 → 16-token overlap), the retrieval-corpus
    * preparation step between cleaning and embedding. Emits one row per
    * chunk with its token span, boundary tokens, and character mass.
    *
    * Trailing partials are kept (standard practice: the tail tokens must
    * land in SOME chunk; dedup of tiny tails is the retriever's concern).
    * All outputs are integers/strings — bit-stable across engines by
    * construction.
    *
    * Scale: the only explode is ⌈n_tokens/stride⌉ per document — output-
    * proportional, shuffle-free until the final sort of the chunk table
    * itself. `slice` on the already-split array keeps per-chunk work O(size)
    * with no re-tokenization, and the whole plan is one parquet scan.
    */
  def ragChunks(docs: DataFrame, size: Int = 64, stride: Int = 48): DataFrame =
    docs
      .select(col("doc_id"), split(col("text"), " ").as("toks"))
      .withColumn("n", org.apache.spark.sql.functions.size(col("toks")))
      .select(col("doc_id"), col("toks"), col("n"),
        posexplode(sequence(lit(0), col("n") - 1, lit(stride))).as(Seq("chunk_idx", "start_tok")))
      .withColumn("chunk", slice(col("toks"), col("start_tok") + 1, lit(size)))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok").cast("int").as("start_tok"),
        org.apache.spark.sql.functions.size(col("chunk")).as("n_tok"),
        element_at(col("chunk"), 1).as("first_tok"),
        element_at(col("chunk"), -1).as("last_tok"),
        aggregate(col("chunk"), lit(0L), (acc, x) => acc + length(x)).as("n_chars"))
      .orderBy(col("doc_id"), col("chunk_idx"))

  def ragChunks(spark: SparkSession, dir: String): DataFrame =
    ragChunks(docsTable(spark, dir))

  /** Hybrid retrieval via Reciprocal Rank Fusion (Cormack & Clarke,
    * SIGIR'09): fuse the lexical BM25 ranking (q116) with the dense
    * embedding-cosine ranking (q44's brute-force truth, probe = vec 0,
    * vec_id ≡ doc_id in the testdata) by rrf = Σ 1/(60 + rank) — the
    * standard RAG hybrid-search combiner, chosen over score
    * interpolation because it needs NO score normalization across
    * incomparable scales.
    *
    * Cross-engine exactness: ranks are integers, each list contributes
    * one identical double term, and the two-term sum is a fixed
    * expression (not an agg) — no summation-order hazard.
    *
    * Scale: both inputs are top-`depth` lists — bounded by construction,
    * so the fusion join costs nothing regardless of corpus size; the
    * heavy lifting stays in the upstream queries, whose plans are pinned
    * separately (q116 broadcasts its stats, q44 broadcasts its probes).
    * Full-outer is required (a doc may appear in either list alone) and
    * runs over 2·depth rows.
    */
  def hybridRrf(spark: SparkSession, dir: String, depth: Int = 50,
                k: Int = 20, rrfK: Int = 60): DataFrame = {
    val bm = bm25TopK(docsTable(spark, dir), Bm25Terms, topN = depth)
      .select(col("doc_id"), col("rnk").as("bm25_rank"))
    val cos = Similarity.cosineTopK(Tables(spark, dir, "embeddings"),
        col("vec_id") === 0, depth)
      .select(col("vec_id").as("doc_id"), col("rn").as("cos_rank"))
    bm.join(cos, Seq("doc_id"), "full_outer")
      .withColumn("rrf", round(
        coalesce(lit(1.0) / (lit(rrfK) + col("bm25_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(rrfK) + col("cos_rank")), lit(0.0)), 6))
      .orderBy(col("rrf").desc, col("doc_id"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("rrf").desc, col("doc_id"))).cast("int"))
      .select(col("rank"), col("doc_id"), col("bm25_rank"), col("cos_rank"), col("rrf"))
      .orderBy(col("rank"))
  }

  /** q158 — corpus mixture audit against a target distribution: per-lang
    * whitespace-token shares vs the uniform target, with per-lang
    * surplus/deficit tokens and the running KL(p‖q) divergence — the
    * "is the training mix still what the recipe says" report run before
    * every mixture-resample (q94's measurement half). Token counts are
    * exact integers; the KL fold is an ORDERED cumulative window over the
    * ≤|langs| aggregate, so the doubles hash-match by construction.
    */
  def klMixtureReport(spark: SparkSession, dir: String): DataFrame = {
    val perLang = docsTable(spark, dir)
      .select(col("lang"),
        size(split(col("text"), " ")).cast("long").as("n_toks"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_toks")).as("tokens"))
    val all = Window.orderBy(col("lang"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val cum = Window.orderBy(col("lang"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    perLang
      .withColumn("total", sum(col("tokens")).over(all))
      .withColumn("n_langs", count(lit(1)).over(all))
      .withColumn("p", col("tokens").cast("double") / col("total"))
      .withColumn("q", lit(1.0) / col("n_langs"))
      .withColumn("contrib", col("p") * log(col("p") / col("q")))
      .select(col("lang"), col("n_docs"), col("tokens"),
        (round(col("p"), 6) + lit(0.0)).as("share"),
        (round(col("q"), 6) + lit(0.0)).as("target"),
        expr("tokens - total div n_langs").as("surplus_tokens"),
        (round(sum(col("contrib")).over(cum), 6) + lit(0.0)).as("kl_cum"))
      .orderBy(col("lang"))
  }

  val queries: Map[String, QueryFn] = Map(
    "q158_kl_mixture" -> (klMixtureReport _),
    "q68_split_hash" -> (hashSplit(_, _)),
    "q69_sample_stratified" -> (stratifiedSample(_, _)),
    "q70_text_scrub" -> (scrub(_, _)),
    "q71_tokens_heavy_hitters" -> (heavyHitters(_, _)),
    "q72_join_bloom_pruned" -> (bloomPrunedJoin _),
    "q73_pack_sequences" -> (packSequences(_, _)),
    "q74_text_tfidf" -> (tfIdfTop(_, _)),
    "q75_decontaminate" -> (decontaminate(_, _)),
    "q76_profile" -> (profile(_, _)),
    "q93_shuffle_seeded" -> (seededShuffle(_, _)),
    "q94_mixture_resample" -> (mixtureResample(_, _)),
    "q110_source_quota" -> (sourceQuota(_, _)),
    "q116_text_bm25" -> (bm25TopK(_, _)),
    "q125_rag_chunks" -> (ragChunks(_, _)),
    "q128_hybrid_rrf" -> ((s, d) => hybridRrf(s, d)),
    "q168_sample_weighted" -> (weightedSample(_, _)),
    "q180_phrase_search" -> (phraseSearch(_, _)),
    "q185_phrase_index" -> ((s, d) => phraseSearchIndexed(s, d))
  )

  val oracleSql: Map[String, String] = Map(
    // q185 answers from the materialized index; the RESULT contract is
    // identical to q180, so the oracle is the same SQL verbatim
    "q185_phrase_index" ->
      """WITH t AS (
        |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |p0 AS (SELECT doc_id, pos AS start FROM t WHERE tok = 'table'),
        |p1 AS (SELECT doc_id, pos - 1 AS start FROM t WHERE tok = 'hash')
        |SELECT doc_id, count(*) AS n_matches,
        |       CAST(min(start) AS INT) AS first_pos
        |FROM p0 JOIN p1 USING (doc_id, start)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // positions via generate_subscripts (1-based, like Spark's pos+1);
    // adjacency as rebased-position equality, same as the engine plan
    "q180_phrase_search" ->
      """WITH t AS (
        |  SELECT doc_id, generate_subscripts(string_split(text, ' '), 1) AS pos,
        |         unnest(string_split(text, ' ')) AS tok
        |  FROM documents),
        |p0 AS (SELECT doc_id, pos AS start FROM t WHERE tok = 'table'),
        |p1 AS (SELECT doc_id, pos - 1 AS start FROM t WHERE tok = 'hash')
        |SELECT doc_id, count(*) AS n_matches,
        |       CAST(min(start) AS INT) AS first_pos
        |FROM p0 JOIN p1 USING (doc_id, start)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    // Efraimidis-Spirakis keys off the same md5 idiom; `+ 0.0` kills the
    // q97 signed-zero class on near-zero rounded keys
    "q168_sample_weighted" ->
      """WITH keyed AS (
        |  SELECT doc_id, n_chars AS w,
        |         round(ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':aes'), 1, 15) AS BIGINT) + 1)
        |                  / 1152921504606846976.0) / n_chars, 12) + 0.0 AS key
        |  FROM documents)
        |SELECT doc_id, w, key FROM keyed
        |ORDER BY key DESC, doc_id LIMIT 50""".stripMargin,
    "q158_kl_mixture" ->
      """WITH pl AS (
        |  SELECT lang, count(*) AS n_docs,
        |         CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS tokens
        |  FROM documents GROUP BY 1),
        |t AS (
        |  SELECT *, sum(tokens) OVER () AS total, count(*) OVER () AS n_langs,
        |         CAST(tokens AS DOUBLE) / sum(tokens) OVER () AS p,
        |         1.0 / count(*) OVER () AS q
        |  FROM pl)
        |SELECT lang, n_docs, tokens,
        |       round(p, 6) + 0.0 AS share,
        |       round(q, 6) + 0.0 AS target,
        |       CAST(tokens - total // n_langs AS BIGINT) AS surplus_tokens,
        |       round(sum(p * ln(p / q)) OVER (ORDER BY lang
        |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) + 0.0 AS kl_cum
        |FROM t ORDER BY lang""".stripMargin,
    "q68_split_hash" ->
      """WITH b AS (
        |  SELECT *, CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':split'), 1, 15) AS BIGINT) % 100 AS bucket
        |  FROM documents)
        |SELECT CASE WHEN bucket < 80 THEN 'train' WHEN bucket < 90 THEN 'val' ELSE 'test' END AS split,
        |       CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(sum(n_chars) AS BIGINT) AS sum_chars,
        |       min(doc_id) AS min_doc, max(doc_id) AS max_doc
        |FROM b GROUP BY 1 ORDER BY 1""".stripMargin,
    "q69_sample_stratified" ->
      """WITH r AS (
        |  SELECT lang, doc_id,
        |         CAST(row_number() OVER (PARTITION BY lang
        |           ORDER BY CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':sample'), 1, 15)
        |             AS BIGINT), doc_id) AS INT) AS rn
        |  FROM documents)
        |SELECT lang, doc_id, rn FROM r WHERE rn <= 10 ORDER BY lang, rn""".stripMargin,
    "q70_text_scrub" ->
      """WITH c AS (
        |  SELECT doc_id, text,
        |         trim(regexp_replace(regexp_replace(text, '\b(the|a|row|value|data)\b', '', 'g'), ' +', ' ', 'g')) AS clean
        |  FROM documents)
        |SELECT doc_id, md5(clean) AS clean_sig, CAST(len(text) - len(clean) AS INT) AS n_removed
        |FROM c ORDER BY doc_id""".stripMargin,
    "q71_tokens_heavy_hitters" ->
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
        |SELECT tok, CAST(count(*) AS BIGINT) AS df
        |FROM toks WHERE tok <> ''
        |GROUP BY tok ORDER BY df DESC, tok LIMIT 20""".stripMargin,
    "q72_join_bloom_pruned" ->
      """SELECT l_returnflag,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |       CAST(count(*) AS BIGINT) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE o_orderpriority = '1-URGENT'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q73_pack_sequences" ->
      """WITH t AS (
        |  SELECT doc_id, doc_id % 8 AS shard, len(string_split(text, ' ')) AS n_tok
        |  FROM documents),
        |c AS (
        |  SELECT shard, doc_id, n_tok,
        |         sum(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
        |                          ROWS UNBOUNDED PRECEDING) - n_tok AS prefix
        |  FROM t)
        |SELECT shard, CAST(prefix // 2048 AS BIGINT) AS pack_id,
        |       CAST(count(*) AS BIGINT) AS n_docs, CAST(sum(n_tok) AS BIGINT) AS pack_tokens
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q74_text_tfidf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |tf AS (
        |  SELECT doc_id, tok, count(*) AS tf FROM tok WHERE tok <> '' GROUP BY 1, 2),
        |df AS (
        |  SELECT tok, count(DISTINCT doc_id) AS df FROM tok WHERE tok <> '' GROUP BY 1),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (
        |  SELECT tf.doc_id, tf.tok,
        |         round(tf.tf * ln(CAST(n.n AS DOUBLE) / df.df), 6) AS tfidf
        |  FROM tf JOIN df USING (tok) CROSS JOIN n),
        |ranked AS (
        |  SELECT *, CAST(row_number() OVER (PARTITION BY doc_id
        |           ORDER BY tfidf DESC, tok) AS INT) AS rnk
        |  FROM scored WHERE doc_id < 50)
        |SELECT doc_id, tok, tfidf, rnk FROM ranked WHERE rnk <= 3
        |ORDER BY doc_id, rnk""".stripMargin,
    "q75_decontaminate" ->
      """WITH g AS (
        |  SELECT doc_id, source, string_split(text, ' ') AS w FROM documents),
        |sh AS (
        |  SELECT doc_id, source,
        |         unnest([array_to_string(w[i:i+4], ' ') FOR i IN range(1, len(w) - 3)]) AS gram
        |  FROM g WHERE len(w) >= 5),
        |contaminated AS (
        |  SELECT DISTINCT t.doc_id
        |  FROM sh t JOIN (SELECT DISTINCT gram FROM sh WHERE source = 'src0') c USING (gram)
        |  WHERE t.source <> 'src0')
        |SELECT d.lang, CAST(count(*) AS BIGINT) AS n_docs,
        |       CAST(count(c.doc_id) AS BIGINT) AS n_removed
        |FROM documents d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
        |WHERE d.source <> 'src0'
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q76_profile" ->
      """SELECT 'doc_id' AS col_name, CAST(count(doc_id) AS BIGINT) AS n_nonnull,
        |       CAST(count(DISTINCT doc_id) AS BIGINT) AS n_distinct,
        |       CAST(min(doc_id) AS VARCHAR) AS min_val, CAST(max(doc_id) AS VARCHAR) AS max_val
        |FROM documents
        |UNION ALL SELECT 'lang', CAST(count(lang) AS BIGINT), CAST(count(DISTINCT lang) AS BIGINT),
        |       CAST(min(lang) AS VARCHAR), CAST(max(lang) AS VARCHAR) FROM documents
        |UNION ALL SELECT 'n_chars', CAST(count(n_chars) AS BIGINT), CAST(count(DISTINCT n_chars) AS BIGINT),
        |       CAST(min(n_chars) AS VARCHAR), CAST(max(n_chars) AS VARCHAR) FROM documents
        |UNION ALL SELECT 'source', CAST(count(source) AS BIGINT), CAST(count(DISTINCT source) AS BIGINT),
        |       CAST(min(source) AS VARCHAR), CAST(max(source) AS VARCHAR) FROM documents
        |UNION ALL SELECT 'text', CAST(count(text) AS BIGINT), CAST(count(DISTINCT text) AS BIGINT),
        |       CAST(min(text) AS VARCHAR), CAST(max(text) AS VARCHAR) FROM documents
        |ORDER BY col_name""".stripMargin,
    // The oracle computes the SAME permutation with one global window —
    // the readable spec the two-phase bucket form must reproduce exactly.
    "q93_shuffle_seeded" ->
      """WITH d AS (SELECT doc_id,
        |  CAST('0x' || substr(md5('42:' || CAST(doc_id AS VARCHAR)), 1, 15) AS BIGINT) AS h
        |  FROM documents)
        |SELECT doc_id,
        |       CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
        |FROM d ORDER BY pos""".stripMargin,
    // Single-window spec of the per-lang budgeted prefix; the Spark side
    // computes it bucketed (see mixtureResample scaladoc).
    "q94_mixture_resample" ->
      """WITH t AS (SELECT lang, doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
        |             CASE lang WHEN 'en' THEN 2800 WHEN 'de' THEN 1600 WHEN 'es' THEN 1600
        |                       WHEN 'fr' THEN 1200 ELSE 800 END AS target_tok,
        |             CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':mix'), 1, 15)
        |               AS BIGINT) AS h
        |      FROM documents),
        |r AS (SELECT lang, doc_id, n_tok, target_tok,
        |        CAST(row_number() OVER (PARTITION BY lang ORDER BY h, doc_id) AS INT) AS rk,
        |        CAST(sum(n_tok) OVER (PARTITION BY lang ORDER BY h, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tok
        |      FROM t)
        |SELECT lang, rk, doc_id, n_tok, cum_tok
        |FROM r WHERE cum_tok - n_tok < target_tok
        |ORDER BY lang, rk""".stripMargin,
    // the oracle is the naive single-window form — the salted two-phase
    // selection is plan shape only, invisible in the result
    "q110_source_quota" ->
      """WITH ranked AS (
        |  SELECT source, doc_id, n_chars,
        |         row_number() OVER (PARTITION BY source
        |           ORDER BY n_chars DESC, doc_id) AS rn
        |  FROM documents),
        |tot AS (SELECT source, count(*) AS n_docs,
        |               CAST(sum(n_chars) AS BIGINT) AS total_chars
        |        FROM documents GROUP BY 1),
        |k AS (SELECT source, count(*) AS n_kept,
        |             CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |      FROM ranked WHERE rn <= 15 GROUP BY 1)
        |SELECT tot.source AS source, n_docs, n_kept,
        |       n_docs - n_kept AS n_dropped, total_chars, kept_chars
        |FROM tot JOIN k USING (source) ORDER BY source""".stripMargin,
    "q116_text_bm25" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS dl,
        |         count(*) FILTER (WHERE tok = 'spark') AS tf_spark,
        |         count(*) FILTER (WHERE tok = 'join') AS tf_join,
        |         count(*) FILTER (WHERE tok = 'vector') AS tf_vector,
        |         count(*) FILTER (WHERE tok = 'customer') AS tf_customer
        |  FROM tok WHERE tok <> '' GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM perdoc),
        |melted AS (
        |  SELECT doc_id, dl, term, tf FROM (
        |    SELECT doc_id, dl, 'spark' AS term, tf_spark AS tf FROM perdoc
        |    UNION ALL SELECT doc_id, dl, 'join', tf_join FROM perdoc
        |    UNION ALL SELECT doc_id, dl, 'vector', tf_vector FROM perdoc
        |    UNION ALL SELECT doc_id, dl, 'customer', tf_customer FROM perdoc)
        |  WHERE tf > 0),
        |dfc AS (SELECT term, count(*) AS df FROM melted GROUP BY term),
        |scored AS (
        |  SELECT m.doc_id, CAST(count(*) AS INT) AS n_terms,
        |         round(sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |           * m.tf * 2.2
        |           / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl))), 6) + 0.0 AS score
        |  FROM melted m JOIN dfc d USING (term) CROSS JOIN stats s
        |  GROUP BY m.doc_id),
        |ranked AS (
        |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id) AS INT) AS rnk,
        |         doc_id, n_terms, score
        |  FROM scored)
        |SELECT rnk, doc_id, n_terms, score FROM ranked
        |WHERE rnk <= 20 ORDER BY rnk""".stripMargin,
    // range(0, n, 48) ≡ Spark's sequence(0, n-1, 48): both stop before n
    "q125_rag_chunks" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |         len(string_split(text, ' ')) AS n
        |  FROM documents),
        |s AS (SELECT doc_id, toks, n, unnest(range(0, n, 48)) AS start FROM t),
        |c AS (SELECT doc_id, start,
        |        list_slice(toks, start + 1, least(start + 64, n)) AS chunk
        |      FROM s)
        |SELECT doc_id, CAST(start // 48 AS INTEGER) AS chunk_idx,
        |       CAST(start AS INTEGER) AS start_tok,
        |       CAST(len(chunk) AS INTEGER) AS n_tok,
        |       chunk[1] AS first_tok, chunk[-1] AS last_tok,
        |       CAST(list_sum(list_transform(chunk, x -> length(x))) AS BIGINT)
        |         AS n_chars
        |FROM c ORDER BY doc_id, chunk_idx""".stripMargin,
    // q116's BM25 CTE chain at depth 50 fused with q44's cosine chain
    // (probe vec 0) by reciprocal-rank; vec_id ≡ doc_id in the testdata
    "q128_hybrid_rrf" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |perdoc AS (
        |  SELECT doc_id, count(*) AS dl,
        |         count(*) FILTER (WHERE tok = 'spark') AS tf_spark,
        |         count(*) FILTER (WHERE tok = 'join') AS tf_join,
        |         count(*) FILTER (WHERE tok = 'vector') AS tf_vector,
        |         count(*) FILTER (WHERE tok = 'customer') AS tf_customer
        |  FROM tok WHERE tok <> '' GROUP BY doc_id),
        |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM perdoc),
        |melted AS (
        |  SELECT doc_id, dl, term, tf FROM (
        |    SELECT doc_id, dl, 'spark' AS term, tf_spark AS tf FROM perdoc
        |    UNION ALL SELECT doc_id, dl, 'join', tf_join FROM perdoc
        |    UNION ALL SELECT doc_id, dl, 'vector', tf_vector FROM perdoc
        |    UNION ALL SELECT doc_id, dl, 'customer', tf_customer FROM perdoc)
        |  WHERE tf > 0),
        |dfc AS (SELECT term, count(*) AS df FROM melted GROUP BY term),
        |scored AS (
        |  SELECT m.doc_id,
        |         round(sum(ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1.0)
        |           * m.tf * 2.2
        |           / (m.tf + 1.2 * (0.25 + 0.75 * m.dl / s.avgdl))), 6) + 0.0 AS score
        |  FROM melted m JOIN dfc d USING (term) CROSS JOIN stats s
        |  GROUP BY m.doc_id),
        |bmr AS (
        |  SELECT doc_id, CAST(row_number() OVER (ORDER BY score DESC, doc_id)
        |           AS INT) AS bm25_rank
        |  FROM scored),
        |e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb
        |      FROM embeddings),
        |n2 AS (SELECT vec_id, emb,
        |         sqrt(list_sum(list_transform(emb, x -> x * x))) AS nrm FROM e),
        |cj AS (SELECT c.vec_id AS doc_id,
        |         list_sum(list_transform(range(1, 65),
        |           i -> p.emb[i] * c.emb[i])) / (p.nrm * c.nrm) AS sim
        |       FROM n2 p JOIN n2 c ON p.vec_id = 0 AND c.vec_id <> 0),
        |cr AS (SELECT doc_id, CAST(row_number() OVER (ORDER BY sim DESC, doc_id)
        |         AS INT) AS cos_rank FROM cj),
        |f AS (
        |  SELECT doc_id, b.bm25_rank, c2.cos_rank,
        |         round(coalesce(CAST(1 AS DOUBLE) / (60 + b.bm25_rank), 0) +
        |               coalesce(CAST(1 AS DOUBLE) / (60 + c2.cos_rank), 0), 6) AS rrf
        |  FROM (SELECT * FROM bmr WHERE bm25_rank <= 50) b
        |  FULL OUTER JOIN (SELECT * FROM cr WHERE cos_rank <= 50) c2 USING (doc_id))
        |SELECT "rank", doc_id, bm25_rank, cos_rank, rrf FROM (
        |  SELECT CAST(row_number() OVER (ORDER BY rrf DESC, doc_id) AS INT)
        |           AS "rank", doc_id, bm25_rank, cos_rank, rrf
        |  FROM f)
        |WHERE "rank" <= 20 ORDER BY "rank"""".stripMargin
  )
}
