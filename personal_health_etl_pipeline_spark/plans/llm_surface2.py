"""Training-data-pipeline operators, part 2: corpus curation.

The ops a 100 TB pretraining-data pipeline runs between "raw crawl" and
"tokenizer": stratified mixing, eval-set decontamination, Gopher-style
repetition signals, deterministic shard planning, and PII scrubbing.
Every query is oracle-checked (DuckDB SQL generated from the same
parameters), extending the dedup/similarity/text family in
``plans.llm_surface``.

Reference scope: the reference repo has no corpus ops at all (it is a
personal-health ETL, `composer_dags/dags/oura_dag.py:22-44`); this
module is part of the engine's extended LLM-data surface
(BASELINE.json north star).

Determinism contract: anything that would normally use an RNG (sampling,
shard assignment) uses the portable md5-derived hash family
(functions/hashing.py) instead, so results are reproducible across
engines, executors and runs — which is also what you want in a real
pipeline for auditability and incremental re-runs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.functions import text as T
from personal_health_etl_pipeline_spark.functions.hashing import (
    duckdb_md5_long,
    md5_long,
)
from personal_health_etl_pipeline_spark.operators.partitioning import (
    TOKENIZE_MIN_BYTES_PER_PARTITION,
    spread,
)
from personal_health_etl_pipeline_spark.sources.tables import load_table

# shared oracle CTE: whitespace tokenization (same as llm_surface)
_TOKS_CTE = r"""
toks AS (
  SELECT doc_id, source, lang,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
)
"""


# --- stratified corpus sampling (data mixing) -------------------------

# per-language keep rates in basis points (upsample EN, downsample the
# rest — the classic mixing move). Deterministic: a doc is kept iff
# md5(doc_id) % 10000 < rate, so the sample is stable across runs and
# engines — no RNG, no seed bookkeeping, trivially incremental.
MIX_RATES_BP = {"en": 10000, "de": 6000, "fr": 6000, "es": 4000, "zh": 2500}
_DEFAULT_RATE_BP = 1000


def _rate_expr() -> F.Column:
    expr = F.lit(_DEFAULT_RATE_BP)
    for lang, bp in sorted(MIX_RATES_BP.items()):
        expr = F.when(F.col("lang") == lang, F.lit(bp)).otherwise(expr)
    return expr


def corpus_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language stratified sample + per-stratum audit.

    Scale shape: the keep-predicate is a row-local hash compare (no
    shuffle, pushes nothing, prunes to 3 columns); the audit groupBy has
    stratum cardinality (#langs), so partial aggregation collapses it
    map-side. At 100 TB this is one scan.
    """
    docs = load_table(spark, sf_dir, "documents")
    kept = F.when(md5_long("doc_id") % 10000 < _rate_expr(), 1).otherwise(0)
    return (
        docs.select("lang", kept.alias("kept"), T.token_count("text").alias("n_tok"))
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum("kept").alias("n_kept"),
            F.sum(F.col("kept") * F.col("n_tok")).alias("tokens_kept"),
        )
        .orderBy("lang")
    )


def _mix_oracle() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {bp}" for lang, bp in sorted(MIX_RATES_BP.items())
    )
    h = duckdb_md5_long("doc_id")
    return rf"""
WITH {_TOKS_CTE}
SELECT lang,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN {h} % 10000 < (CASE lang {cases} ELSE {_DEFAULT_RATE_BP} END)
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(SUM(CASE WHEN {h} % 10000 < (CASE lang {cases} ELSE {_DEFAULT_RATE_BP} END)
                THEN len(t) ELSE 0 END) AS BIGINT) AS tokens_kept
FROM toks
GROUP BY lang
ORDER BY lang
"""


CORPUS_SAMPLE_ORACLE = _mix_oracle()


# --- eval-set decontamination -----------------------------------------

# held-out "eval" docs: doc_id % 97 == 0 (stand-in for a benchmark set)
_EVAL_MOD = 97
_SHINGLE_N = 3


def decontaminate_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training docs that share >= 1 word 3-gram with any eval doc.

    The canonical test-set-decontamination pass: build the eval n-gram
    set, semi-join the corpus against it, report per-doc overlap counts.

    Scale shape: shingles are carried as 60-bit hashes (not strings) so
    the join key is 8 bytes; the eval side is tiny by construction ->
    broadcast, and the corpus side streams map-only — no shuffle of
    corpus data at all. The per-doc count is a groupBy on doc_id of the
    (already filtered) matches.
    """
    docs = load_table(spark, sf_dir, "documents")

    def hashed(side) -> DataFrame:
        # split into eval/corpus BEFORE shingling so each doc is
        # shingled+hashed exactly once (a shared subtree would be
        # recomputed per consumer — Spark plans are trees, not DAGs)
        # empty docs are dropped by the tokenizer-only predicate BELOW
        # the projection, and the explode is the OUTER form: a size
        # filter on the derived column (explicit, or inferred by
        # InferFiltersFromGenerate for a non-outer explode) is pushed
        # below the projection with the alias substituted, so the
        # predicate re-evaluates the whole shingle expression per row
        # (functions.text.has_min_tokens; r16 sf1 A/B on this entry:
        # 3.90 -> 1.34 s). With every array non-empty by the predicate,
        # explode_outer emits exactly explode's rows.
        shingled = side.where(T.has_min_tokens("text", _SHINGLE_N)).select(
            "doc_id", T.distinct_shingles("text", _SHINGLE_N).alias("_sh")
        )
        return shingled.select(
            "doc_id", F.explode_outer("_sh").alias("s")
        ).select("doc_id", md5_long("s").alias("h"))

    eval_h = (
        hashed(docs.where(F.col("doc_id") % _EVAL_MOD == 0)).select("h").distinct()
    )
    # the corpus side is compute-bound (shingle + hash per token) — make
    # sure a single-file scan doesn't serialize it on one task. Project
    # to the two consumed columns BEFORE the spread shuffle (guide:
    # project before the exchange — the unprojected form shuffled the
    # full 5-column rows), and fan out at the tokenize floor (the
    # all-column size estimate used to hit the 256 KB default's
    # one-partition regime).
    return (
        hashed(
            spread(
                docs.where(F.col("doc_id") % _EVAL_MOD != 0).select(
                    "doc_id", "text"
                ),
                min_bytes=TOKENIZE_MIN_BYTES_PER_PARTITION,
            )
        )
        .join(F.broadcast(eval_h), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
        .orderBy("doc_id")
    )


DECONTAMINATE_ORACLE = rf"""
WITH {_TOKS_CTE},
sh AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(t) >= {_SHINGLE_N}
                THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE CAST([] AS VARCHAR[]) END) AS sh
  FROM toks
),
inv AS (
  SELECT doc_id, {duckdb_md5_long("unnest(sh)")} AS h
  FROM sh WHERE len(sh) > 0
),
eval_h AS (SELECT DISTINCT h FROM inv WHERE doc_id % {_EVAL_MOD} = 0)
SELECT i.doc_id, COUNT(*) AS n_shared_ngrams
FROM inv i JOIN eval_h e ON i.h = e.h
WHERE i.doc_id % {_EVAL_MOD} <> 0
GROUP BY i.doc_id
ORDER BY i.doc_id
"""


def corpus_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INVERSE contamination metric to ``decontaminate_ngram``:
    for every EVAL document, the fraction of its distinct 3-gram
    shingles that appear ANYWHERE in the training split — the
    eval-set-integrity number a release report quotes (GPT-3-style
    overlap statistics). ``contam_milli`` is the exact non-negative
    integer ``(1000 * n_matched) div n_shingles`` (identical
    floor/truncate for non-negatives in both engines).

    Scale shape: the bounded EVAL shingle-hash set broadcasts to the
    training scan (the corpus streams map-only, as in decontaminate);
    the distinct MATCHED hash set is bounded by the eval set, so the
    join back to per-eval-doc shingles is broadcast too — corpus data
    never shuffles."""
    docs = load_table(spark, sf_dir, "documents")

    def hashed(side) -> DataFrame:
        # empty docs are dropped by the tokenizer-only predicate BELOW
        # the projection, and the explode is the OUTER form: a size
        # filter on the derived column (explicit, or inferred by
        # InferFiltersFromGenerate for a non-outer explode) is pushed
        # below the projection with the alias substituted, so the
        # predicate re-evaluates the whole shingle expression per row
        # (functions.text.has_min_tokens; r16 sf1 A/B on this entry:
        # 3.90 -> 1.34 s). With every array non-empty by the predicate,
        # explode_outer emits exactly explode's rows.
        shingled = side.where(T.has_min_tokens("text", _SHINGLE_N)).select(
            "doc_id", T.distinct_shingles("text", _SHINGLE_N).alias("_sh")
        )
        return shingled.select(
            "doc_id", F.explode_outer("_sh").alias("s")
        ).select("doc_id", md5_long("s").alias("h"))

    eval_sh = hashed(docs.where(F.col("doc_id") % _EVAL_MOD == 0))
    train_h = hashed(docs.where(F.col("doc_id") % _EVAL_MOD != 0)).select("h")
    eval_hashes = eval_sh.select("h").distinct()
    matched = (
        train_h.join(F.broadcast(eval_hashes), "h", "left_semi").distinct()
    )
    per_doc = eval_sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles")
    )
    n_matched = (
        eval_sh.join(F.broadcast(matched), "h", "left_semi")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_matched"))
    )
    return (
        per_doc.join(n_matched, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_matched", F.lit(0)).alias("n_matched"),
            F.expr(
                "(1000 * coalesce(n_matched, 0)) div n_shingles"
            ).alias("contam_milli"),
        )
        .orderBy("doc_id")
    )


CORPUS_EVAL_OVERLAP_ORACLE = rf"""
WITH {_TOKS_CTE},
sh AS (
  SELECT doc_id,
         list_distinct(
           CASE WHEN len(t) >= {_SHINGLE_N}
                THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE CAST([] AS VARCHAR[]) END) AS sh
  FROM toks
),
inv AS (
  SELECT doc_id, {duckdb_md5_long("unnest(sh)")} AS h
  FROM sh WHERE len(sh) > 0
),
train_h AS (SELECT DISTINCT h FROM inv WHERE doc_id % {_EVAL_MOD} <> 0),
ev AS (SELECT doc_id, h FROM inv WHERE doc_id % {_EVAL_MOD} = 0),
per AS (
  SELECT ev.doc_id,
         COUNT(*) AS n_shingles,
         CAST(SUM(CASE WHEN t.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_matched
  FROM ev LEFT JOIN train_h t ON t.h = ev.h
  GROUP BY ev.doc_id
)
SELECT doc_id, n_shingles, n_matched,
       (1000 * n_matched) // n_shingles AS contam_milli
FROM per ORDER BY doc_id
"""


# --- bigram language-model quality score ------------------------------


_BIGRAM_MODEL_MEMO: dict[tuple[str, str], DataFrame] = {}


def text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style corpus-LM quality score: each document's mean add-1
    bigram log-probability under the corpus's own bigram counts (a
    fluency proxy — word salad scores far below natural text).

    Per doc: avg over bigrams (a,b) of ln((C(ab)+1)/(C(a·)+V)), where
    C(a·) counts bigram starts and V is the distinct-start vocabulary.
    Each ln is quantized to integer micro-units BEFORE summing (the
    tf-idf recipe), so the aggregate is exact-integer and the one
    double division at the end is IEEE-deterministic.

    Scale shape: the LM — the ``(a, ab) -> lp`` table, corpus-static —
    is a session artifact built once per (application, corpus) and
    eagerly checkpointed (in production it IS the persisted model
    table); each call then pays one bigram explode, ONE shuffle join
    against the model, and the per-doc groupBy. No UDFs anywhere.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = (spark.sparkContext.applicationId, sf_dir)
    model = _BIGRAM_MODEL_MEMO.get(key)
    if model is None:
        model = bigram_lp_model(docs).localCheckpoint(eager=True)
        _BIGRAM_MODEL_MEMO[key] = model
    return bigram_logprob(docs, model=model)


def _bigram_stream(docs: DataFrame) -> DataFrame:
    """``(doc_id, a, ab)`` adjacent-token-pair stream of a corpus."""
    return (
        spread(
            docs.select("doc_id", "text"),
            min_bytes=TOKENIZE_MIN_BYTES_PER_PARTITION,
        )
        .select("doc_id", T.tokens("text").alias("t"))
        .where(F.size("t") >= 2)
        .select(
            "doc_id",
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                    " (x, y) -> struct(x AS a, concat(x, '|', y) AS ab))"
                )
            ).alias("s"),
        )
        .select("doc_id", "s.a", "s.ab")
    )


def bigram_lp_model(docs: DataFrame) -> DataFrame:
    """Add-1 bigram LM of a corpus as a ``(a, ab, lp)`` table, where
    ``lp`` is ln((C(ab)+1)/(C(a·)+V)) in integer micro-units.

    cnt_a (bigram starts per a) and V (distinct starts) both derive
    from the bounded bigram-count table, NOT from re-exploding the
    corpus. The model keeps BOTH keys and the scoring join uses both:
    tokens are whitespace-split, so a token may itself contain '|' and
    two distinct (a, b) splits can render to the same 'ab' string —
    joining on 'ab' alone would fan such a bigram out to every
    colliding row. The model is corpus-bounded (distinct bigrams); the
    scalar V rides a 1-row broadcast.
    """
    bg = _bigram_stream(docs)
    cnt_ab = bg.groupBy("a", "ab").agg(F.count(F.lit(1)).alias("c_ab"))
    cnt_a = cnt_ab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    vocab = cnt_a.agg(F.count(F.lit(1)).alias("v"))
    return (
        cnt_ab.join(cnt_a, "a")
        .crossJoin(F.broadcast(vocab))
        .select(
            "a",
            "ab",
            F.round(
                F.log(
                    (F.col("c_ab") + 1).cast("double")
                    / (F.col("c_a") + F.col("v")).cast("double")
                )
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("lp"),
        )
    )


def bigram_logprob(docs: DataFrame, model: DataFrame | None = None) -> DataFrame:
    """Scoring body of :func:`text_bigram_logprob` over any
    ``(doc_id, text)`` frame (unit-testable on synthetic corpora).
    ``model`` is a precomputed :func:`bigram_lp_model` frame (the
    session-artifact path); when None it is derived from ``docs``.
    Every corpus bigram appears in its own model, so the inner join
    drops nothing."""
    bg = _bigram_stream(docs)
    if model is None:
        model = bigram_lp_model(docs)
    scored = bg.join(model, ["a", "ab"]).select("doc_id", "lp")
    return (
        scored.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp").alias("sum_lp_micro"),
            F.round(F.sum("lp") / F.count(F.lit(1)), 6).alias("avg_lp_micro"),
        )
        .orderBy("doc_id")
    )


TEXT_BIGRAM_LP_ORACLE = rf"""
WITH {_TOKS_CTE},
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> struct_pack(a := t[i], ab := t[i] || '|' || t[i + 1]))) AS s
  FROM toks WHERE len(t) >= 2
),
flat AS (SELECT doc_id, s.a AS a, s.ab AS ab FROM bg),
cab AS (SELECT a, ab, COUNT(*) AS c_ab FROM flat GROUP BY a, ab),
ca AS (SELECT a, COUNT(*) AS c_a FROM flat GROUP BY a),
v AS (SELECT COUNT(DISTINCT a) AS v FROM flat),
scored AS (
  SELECT doc_id,
         CAST(round(ln(CAST(c_ab + 1 AS DOUBLE) / CAST(c_a + v AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS lp
  FROM flat JOIN cab USING (a, ab) JOIN ca USING (a) CROSS JOIN v
)
SELECT doc_id,
       COUNT(*) AS n_bigrams,
       CAST(SUM(lp) AS BIGINT) AS sum_lp_micro,
       ROUND(SUM(lp) / COUNT(*), 6) AS avg_lp_micro
FROM scored GROUP BY doc_id ORDER BY doc_id
"""


# --- Gopher-style repetition signals ----------------------------------

def text_repetition_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc repetition quality signals (Gopher-rule family):
    duplicate-word fraction, most-frequent-word fraction, and
    most-frequent-bigram fraction.

    Scale shape: two wordcount-style aggregations (groupBy (doc, term))
    — the textbook partial-agg-friendly shuffle — joined back on
    doc_id; both sides are already hash-partitioned on doc_id by their
    final groupBy, so the join is co-partitioned (no extra exchange).
    """
    docs = load_table(spark, sf_dir, "documents")
    # spread at the tokenize floor (this path had NO spread: both
    # branches tokenized the single-file corpus on one task each), and
    # checkpoint the token arrays once — the word and bigram branches
    # are separate plan subtrees, so the lazy form re-ran the tokenizer
    # per branch.
    toks = (
        spread(
            docs.select("doc_id", "text"),
            min_bytes=TOKENIZE_MIN_BYTES_PER_PARTITION,
        )
        .select("doc_id", T.tokens("text").alias("t"))
        .where(F.size("t") > 0)
        .localCheckpoint(eager=False)
    )

    words = toks.select("doc_id", F.explode("t").alias("w"))
    word_stats = (
        words.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(
            F.sum("c").alias("n_tokens"),
            F.count(F.lit(1)).alias("n_distinct"),
            F.max("c").alias("top_c"),
        )
    )
    bigrams = toks.select(
        "doc_id", F.explode(T.word_shingles(F.col("t"), 2)).alias("b")
    )
    bigram_stats = (
        bigrams.groupBy("doc_id", "b")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.sum("c").alias("n_bigrams"), F.max("c").alias("top_bc"))
    )
    return (
        word_stats.join(bigram_stats, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.round(1 - F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "dup_word_frac"
            ),
            F.round(F.col("top_c") / F.col("n_tokens"), 6).alias("top_word_frac"),
            F.round(
                F.coalesce(F.col("top_bc") / F.col("n_bigrams"), F.lit(0.0)), 6
            ).alias("top_bigram_frac"),
        )
        .orderBy("doc_id")
    )


TEXT_REPETITION_ORACLE = rf"""
WITH {_TOKS_CTE},
nonempty AS (SELECT doc_id, t FROM toks WHERE len(t) > 0),
words AS (SELECT doc_id, unnest(t) AS w FROM nonempty),
wc AS (SELECT doc_id, w, COUNT(*) AS c FROM words GROUP BY doc_id, w),
ws AS (SELECT doc_id, SUM(c) AS n_tokens, COUNT(*) AS n_distinct, MAX(c) AS top_c
       FROM wc GROUP BY doc_id),
bigrams AS (
  SELECT doc_id, unnest(CASE WHEN len(t) >= 2
      THEN list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])
      ELSE CAST([] AS VARCHAR[]) END) AS b
  FROM nonempty
),
bc AS (SELECT doc_id, b, COUNT(*) AS c FROM bigrams GROUP BY doc_id, b),
bs AS (SELECT doc_id, SUM(c) AS n_bigrams, MAX(c) AS top_bc FROM bc GROUP BY doc_id)
SELECT ws.doc_id, CAST(ws.n_tokens AS BIGINT) AS n_tokens,
       ROUND(1 - CAST(n_distinct AS DOUBLE) / n_tokens, 6) AS dup_word_frac,
       ROUND(CAST(top_c AS DOUBLE) / n_tokens, 6) AS top_word_frac,
       ROUND(COALESCE(CAST(top_bc AS DOUBLE) / n_bigrams, 0.0), 6) AS top_bigram_frac
FROM ws LEFT JOIN bs ON ws.doc_id = bs.doc_id
ORDER BY ws.doc_id
"""


# --- deterministic shard plan -----------------------------------------

N_SHARDS = 32


def corpus_shard_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard assignment for the training-data writer: shard =
    md5(doc_id) % N — a deterministic global shuffle (stable across
    reruns, so resuming a partial write is safe) with per-shard size
    audit. The audit is the query; the writer would be
    ``df.repartition(N, shard).write.partitionBy(shard)``.

    Scale shape: one scan, one tiny groupBy (N rows); md5 spreads
    uniformly so shards balance regardless of doc_id clustering.
    """
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.select(
            (md5_long("doc_id") % N_SHARDS).alias("shard"),
            T.token_count("text").alias("n_tok"),
            F.col("n_chars"),
        )
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("n_chars").alias("total_chars"),
        )
        .orderBy("shard")
    )


CORPUS_SHARD_ORACLE = rf"""
WITH {_TOKS_CTE}
SELECT {duckdb_md5_long("d.doc_id")} % {N_SHARDS} AS shard,
       COUNT(*) AS n_docs,
       CAST(SUM(len(t.t)) AS BIGINT) AS n_tokens,
       CAST(SUM(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN toks t ON d.doc_id = t.doc_id
GROUP BY 1
ORDER BY shard
"""


# --- sequence packing -------------------------------------------------

SEQ_LEN = 512


def corpus_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style sequence-packing plan: each shard's documents form one
    token stream (doc_id order), chunked every ``SEQ_LEN`` tokens — the
    zero-waste packing a causal-LM loader uses. Per doc: the sequence
    it starts in, its offset there, and how many sequences it spans
    (what the writer needs to emit attention-mask resets / document
    boundaries).

    Scale shape: one shuffle (window partitioned by shard, ordered by
    doc_id) — the cumulative sum is per-shard sequential, but shards
    are the parallel unit, exactly like the writer that would consume
    this plan. Zero-token docs are dropped (they occupy no stream
    positions).
    """
    docs = load_table(spark, sf_dir, "documents")
    sized = docs.select(
        "doc_id",
        (md5_long("doc_id") % N_SHARDS).alias("shard"),
        T.token_count("text").cast("bigint").alias("n_tok"),
    ).where(F.col("n_tok") > 0)
    w = Window.partitionBy("shard").orderBy("doc_id")
    return sized.withColumn("_end", F.sum("n_tok").over(w)).select(
        "doc_id",
        "shard",
        "n_tok",
        F.expr(f"(_end - n_tok) div {SEQ_LEN}").alias("seq_id"),
        F.expr(f"(_end - n_tok) % {SEQ_LEN}").alias("seq_offset"),
        F.expr(
            f"(_end - 1) div {SEQ_LEN} - (_end - n_tok) div {SEQ_LEN} + 1"
        ).alias("seq_span"),
    )


CORPUS_PACK_ORACLE = rf"""
WITH {_TOKS_CTE},
sized AS (
  SELECT doc_id, {duckdb_md5_long("doc_id")} % {N_SHARDS} AS shard,
         CAST(len(t) AS BIGINT) AS n_tok
  FROM toks WHERE len(t) > 0
),
cum AS (
  SELECT *, SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id) AS e
  FROM sized
)
SELECT doc_id, shard, n_tok,
       CAST((e - n_tok) // {SEQ_LEN} AS BIGINT) AS seq_id,
       CAST((e - n_tok) % {SEQ_LEN} AS BIGINT) AS seq_offset,
       CAST((e - 1) // {SEQ_LEN} - (e - n_tok) // {SEQ_LEN} + 1 AS BIGINT)
         AS seq_span
FROM cum
"""


# --- PII scrubbing ----------------------------------------------------

# The synthetic corpus carries no real PII, so a deterministic injection
# step plants emails first (doc_id % 7 == 0 gets one; % 21 == 0 gets a
# second) and the scrub is verified by count + redacted-text digest.
_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"


def pii_scrub_emails(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Detect-and-redact emails; per-source audit of docs touched,
    emails removed, and an md5 digest of every redacted text (the
    digest makes the value-hash check certify the *replacement* output,
    not just the counts).

    Scale shape: row-local regex work in one scan (JVM regexp, no UDF);
    the audit groupBy has #sources cardinality -> map-side collapse.
    """
    docs = load_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        "source",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 7 == 0,
                F.concat(F.lit(" contact user"), F.col("doc_id"), F.lit("@example.com")),
            ).otherwise(F.lit("")),
            F.when(
                F.col("doc_id") % 21 == 0,
                F.concat(F.lit(" cc admin"), F.col("doc_id"), F.lit("@corp.example.org")),
            ).otherwise(F.lit("")),
        ).alias("text"),
    )
    scrubbed = planted.select(
        "doc_id",
        "source",
        F.regexp_count("text", F.lit(_EMAIL_RE)).alias("n_emails"),
        F.md5(F.regexp_replace("text", _EMAIL_RE, "<EMAIL>")).alias("redacted_md5"),
    )
    return (
        scrubbed.groupBy("source")
        .agg(
            F.sum(F.when(F.col("n_emails") > 0, 1).otherwise(0)).alias("n_docs_with_pii"),
            F.sum("n_emails").alias("n_emails"),
            F.md5(
                F.concat_ws(",", F.array_sort(F.collect_list("redacted_md5")))
            ).alias("redacted_digest"),
        )
        .orderBy("source")
    )


PII_SCRUB_ORACLE = rf"""
WITH planted AS (
  SELECT doc_id, source,
         text
         || CASE WHEN doc_id % 7 = 0
                 THEN ' contact user' || doc_id || '@example.com' ELSE '' END
         || CASE WHEN doc_id % 21 = 0
                 THEN ' cc admin' || doc_id || '@corp.example.org' ELSE '' END
           AS text
  FROM documents
),
scrubbed AS (
  SELECT doc_id, source,
         len(regexp_extract_all(text, '{_EMAIL_RE}')) AS n_emails,
         md5(regexp_replace(text, '{_EMAIL_RE}', '<EMAIL>', 'g')) AS redacted_md5
  FROM planted
)
SELECT source,
       CAST(SUM(CASE WHEN n_emails > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_with_pii,
       CAST(SUM(n_emails) AS BIGINT) AS n_emails,
       md5(list_aggregate(list_sort(list(redacted_md5)), 'string_agg', ','))
         AS redacted_digest
FROM scrubbed
GROUP BY source
ORDER BY source
"""


# --- composed curation flagship ---------------------------------------

CURATE_MIN_QUALITY = 0.5


def corpus_curate_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end curation pass a training corpus actually runs,
    composed from the engine's own operators in one plan: exact-dedup
    keeper selection -> quality scoring -> quality-threshold filter ->
    per-language corpus audit.

    Scale shape: one dedup shuffle (md5 window) + one tiny groupBy
    (#langs); scoring is row-local column expressions. The quality
    rollup sums integer micro-units (bigint), never doubles, so the
    per-group total is order-independent and bit-exact vs the oracle.
    """
    from personal_health_etl_pipeline_spark.operators.dedup import dedup_exact

    docs = load_table(spark, sf_dir, "documents")
    kept = dedup_exact(docs, "text", "doc_id")
    scored = kept.select(
        "lang",
        T.token_count("text").alias("n_tok"),
        T.quality_score("text").alias("q"),
    ).where(F.col("q") >= CURATE_MIN_QUALITY)
    return (
        scored.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.sum(F.round(F.col("q") * 1000000, 0).cast("bigint")).alias(
                "_q_micro"
            ),
        )
        .select(
            "lang",
            "n_docs",
            "n_tokens",
            F.round(
                F.col("_q_micro").cast("double") / F.col("n_docs") / 1000000.0, 6
            ).alias("avg_quality"),
        )
        .orderBy("lang")
    )


CORPUS_CURATE_ORACLE = rf"""
WITH {_TOKS_CTE},
keepers AS (
  SELECT md5(text) AS h, MIN(doc_id) AS keeper FROM documents GROUP BY md5(text)
),
kept AS (
  SELECT d.doc_id, d.lang
  FROM documents d JOIN keepers g ON md5(d.text) = g.h AND d.doc_id = g.keeper
),
scored AS (
  SELECT kept.lang, len(t) AS n_tok,
         (CASE WHEN len(t) > 0 THEN
  CAST((2 * (6 * len(t) * least(len(t), 100)
             + 800 * len(list_distinct(t))
             + 75 * least(CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT),
                          8 * len(t)))
        * 1000000 + 2000 * len(t))
       // (4000 * len(t)) AS DOUBLE) / 1000000.0
  END) AS q
  FROM kept JOIN toks ON kept.doc_id = toks.doc_id
)
SELECT lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
       ROUND(CAST(CAST(SUM(CAST(ROUND(q * 1000000, 0) AS BIGINT)) AS BIGINT) AS DOUBLE)
             / COUNT(*) / 1000000.0, 6) AS avg_quality
FROM scored
WHERE q >= {CURATE_MIN_QUALITY}
GROUP BY lang
ORDER BY lang
"""


# --- document chunking (token windows with overlap) -------------------

CHUNK_TOKENS = 64   # tokens per chunk (context-window slice)
CHUNK_STRIDE = 48   # window step -> 16-token overlap between chunks


def corpus_chunk_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split each document into overlapping token windows — the step
    between curation and sequence packing in a pretraining pipeline
    (and the retrieval-index unit for RAG): ``(doc_id, chunk_id,
    chunk_start, n_tok, chunk_text)``; chunk ``i`` starts at token
    ``i * CHUNK_STRIDE``, the last window may be short (callers drop
    sub-minimum tails as policy).

    Scale shape: tokenize once, explode a per-doc window-start
    sequence, slice + rejoin — a pure map + generate, partitioned by
    the scan; no shuffle anywhere. Chunk count per doc is
    ``ceil((n - CHUNK) / STRIDE) + 1``, computed in double (exact for
    any realistic token count), identically in both engines.
    """
    return chunk_documents(load_table(spark, sf_dir, "documents"))


def chunk_documents(docs: DataFrame) -> DataFrame:
    """Windowing body of :func:`corpus_chunk_documents` over any
    ``(doc_id, text)`` frame (property-tested on arbitrary lengths)."""
    n_chunks = (
        f"greatest(0L, cast(ceil((size(t) - {CHUNK_TOKENS}) "
        f"/ cast({CHUNK_STRIDE} as double)) as bigint))"
    )
    return (
        spread(
            docs.select("doc_id", "text"),
            min_bytes=TOKENIZE_MIN_BYTES_PER_PARTITION,
        )
        .select("doc_id", T.tokens("text").alias("t"))
        .where(F.size("t") > 0)
        .select(
            "doc_id",
            "t",
            F.explode(F.expr(f"sequence(0L, {n_chunks})")).alias("chunk_id"),
        )
        .select(
            "doc_id",
            "chunk_id",
            (F.col("chunk_id") * CHUNK_STRIDE).alias("chunk_start"),
            F.least(
                F.lit(CHUNK_TOKENS).cast("long"),
                F.size("t") - F.col("chunk_id") * CHUNK_STRIDE,
            ).alias("n_tok"),
            F.expr(
                f"concat_ws(' ', slice(t, cast(chunk_id * {CHUNK_STRIDE} "
                f"+ 1 as int), {CHUNK_TOKENS}))"
            ).alias("chunk_text"),
        )
        # no orderBy: the differential compare is order-insensitive and
        # a global sort would add the plan's only exchange
    )


CORPUS_CHUNK_ORACLE = rf"""
WITH {_TOKS_CTE},
base AS (
  SELECT doc_id, t, len(t) AS n,
         greatest(0, CAST(ceil((len(t) - {CHUNK_TOKENS})
                               / CAST({CHUNK_STRIDE} AS DOUBLE)) AS BIGINT))
           AS last_chunk
  FROM toks WHERE len(t) > 0
),
chunks AS (
  SELECT doc_id, t, n, unnest(range(0, last_chunk + 1)) AS chunk_id
  FROM base
)
SELECT doc_id,
       chunk_id,
       chunk_id * {CHUNK_STRIDE} AS chunk_start,
       least({CHUNK_TOKENS}, n - chunk_id * {CHUNK_STRIDE}) AS n_tok,
       array_to_string(
         list_slice(t, CAST(chunk_id * {CHUNK_STRIDE} + 1 AS BIGINT),
                    CAST(chunk_id * {CHUNK_STRIDE} + {CHUNK_TOKENS} AS BIGINT)),
         ' ') AS chunk_text
FROM chunks
ORDER BY doc_id, chunk_id
"""


# --- vocabulary coverage / OOV audit ----------------------------------

VOCAB_SIZE = 256


def text_vocab_oov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build a frequency vocabulary (top ``VOCAB_SIZE`` terms, ties by
    term) and audit per-language out-of-vocabulary rates — the
    tokenizer-design loop every pretraining pipeline runs (what
    coverage does a V-term vocab buy per language?).

    Scale shape: one wordcount shuffle builds the term table; the
    vocabulary is bounded (V rows) so membership rides back as a
    broadcast left join — the corpus-side explode is never shuffled.
    The per-language rollup has language cardinality, collapsing
    map-side.
    """
    docs = load_table(spark, sf_dir, "documents")
    flat = (
        spread(
            docs.select("lang", "doc_id", "text"),
            min_bytes=TOKENIZE_MIN_BYTES_PER_PARTITION,
        )
        .select("lang", T.tokens("text").alias("t"))
        .where(F.size("t") > 0)
        .select("lang", F.explode("t").alias("term"))
    )
    vocab = (
        flat.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "term")
        .limit(VOCAB_SIZE)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    return (
        flat.join(F.broadcast(vocab), "term", "left_outer")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(
                F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
            ).alias("n_oov"),
        )
        .select(
            "lang",
            "n_tokens",
            "n_oov",
            F.round(
                F.col("n_oov").cast("double") / F.col("n_tokens"), 6
            ).alias("oov_rate"),
        )
        .orderBy("lang")
    )


TEXT_VOCAB_OOV_ORACLE = rf"""
WITH {_TOKS_CTE},
flat AS (
  SELECT lang, unnest(t) AS term FROM toks WHERE len(t) > 0
),
vocab AS (
  SELECT term FROM (
    SELECT term, COUNT(*) AS cnt FROM flat GROUP BY term
  ) ORDER BY cnt DESC, term LIMIT {VOCAB_SIZE}
)
SELECT lang,
       COUNT(*) AS n_tokens,
       CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_oov,
       ROUND(CAST(SUM(CASE WHEN v.term IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*), 6) AS oov_rate
FROM flat f LEFT JOIN vocab v ON f.term = v.term
GROUP BY lang
ORDER BY lang
"""


# --- corpus_mix_temperature: domain-balanced sampling quotas ----------

MIX_TARGET = 200       # docs in the mixed sample
MIX_W_SCALE = 1_000_000  # sqrt weights quantized to integer micro-units


def corpus_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based domain mixing (alpha = 0.5): per-language
    quotas proportional to n^alpha — the standard flattening that keeps
    low-resource languages from vanishing in proportional sampling
    (multilingual-LM practice since mBERT/XLM).

    Exactness contract: sqrt weights are quantized to integer
    micro-units BEFORE normalization, so the quota arithmetic
    ``(target * w) div W`` is pure bigint — no order-dependent double
    sums anywhere. Selection within a language is the smallest
    ``md5_long(doc_id)`` prefix (deterministic, engine-portable
    "random" sample), one window over the language partitioning.
    """
    docs = load_table(spark, sf_dir, "documents")
    weights = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn(
            "w",
            F.round(F.sqrt(F.col("n_docs").cast("double")) * MIX_W_SCALE, 0).cast(
                "bigint"
            ),
        )
    )
    quotas = (
        weights.crossJoin(
            F.broadcast(weights.agg(F.sum("w").alias("w_total")))
        )
        .withColumn("quota", F.expr(f"({MIX_TARGET} * w) DIV w_total"))
        .select("lang", "n_docs", "quota")
    )
    ranked = docs.select(
        "doc_id",
        "lang",
        F.row_number()
        .over(
            Window.partitionBy("lang").orderBy(md5_long(F.col("doc_id")), "doc_id")
        )
        .alias("sample_rank"),
    )
    return (
        ranked.join(F.broadcast(quotas), on="lang")
        .filter(F.col("sample_rank") <= F.col("quota"))
        .select("doc_id", "lang", "sample_rank", "quota")
    )


CORPUS_MIX_ORACLE = f"""
WITH n AS (SELECT lang, COUNT(*) AS n_docs FROM documents GROUP BY lang),
w AS (
  SELECT lang, n_docs,
         CAST(round(sqrt(CAST(n_docs AS DOUBLE)) * {MIX_W_SCALE}) AS BIGINT) AS w
  FROM n
),
tot AS (SELECT CAST(SUM(w) AS BIGINT) AS w_total FROM w),
quota AS (
  SELECT lang, n_docs, ({MIX_TARGET} * w) // w_total AS quota FROM w, tot
),
ranked AS (
  SELECT doc_id, lang,
         ROW_NUMBER() OVER (
             PARTITION BY lang
             ORDER BY {duckdb_md5_long("doc_id")}, doc_id) AS sample_rank
  FROM documents
)
SELECT r.doc_id, r.lang, r.sample_rank, q.quota
FROM ranked r JOIN quota q USING (lang)
WHERE r.sample_rank <= q.quota
"""


# --- text_pmi_top_pairs: collocation mining by pointwise MI -----------

PMI_MIN_COUNT = 5    # drop noise pairs below this co-occurrence count
PMI_TOP_K = 50
PMI_SCALE = 1_000_000


def text_pmi_top_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations: adjacent-token pairs ranked by pointwise
    mutual information ln(c_ab*N / (c_a*c_b)) over the whole corpus —
    the classic collocation detector (Church & Hanks 1990), and the
    statistic behind phrase-merging tokenizers (word2vec phrases).

    One bigram explode -> one (a,b) count shuffle; the marginal counts
    derive from the bounded pair table, never from re-exploding the
    corpus. The count ratio is evaluated in double (c_ab*N can
    overflow bigint at corpus scale) with identical cast placement in
    both engines, then micro-quantized; top-k is a bounded
    sort-descending limit with a total (pmi, a, b) tie-break."""
    docs = load_table(spark, sf_dir, "documents")
    bg = (
        spread(
            docs.select("doc_id", "text"),
            min_bytes=TOKENIZE_MIN_BYTES_PER_PARTITION,
        )
        .select(T.tokens("text").alias("t"))
        .where(F.size("t") >= 2)
        .select(
            F.explode(
                F.expr(
                    "zip_with(slice(t, 1, size(t) - 1), slice(t, 2, size(t) - 1),"
                    " (x, y) -> struct(x AS a, y AS b))"
                )
            ).alias("s")
        )
        .select("s.a", "s.b")
    )
    # materialize the bounded pair table ONCE (non-eager checkpoint,
    # the r11 scan-audit pattern): its four consumers (c_a, c_b, the
    # total, and the pmi base) otherwise each re-derive the tokenize +
    # bigram explode + count shuffle — the audit measured 3 identical
    # corpus scans; the checkpoint makes the docstring's "marginals
    # derive from the bounded pair table, never from re-exploding the
    # corpus" physically true, not just logically
    cnt_ab = (
        bg.groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("c_ab"))
        .localCheckpoint(eager=False)
    )
    cnt_a = cnt_ab.groupBy("a").agg(F.sum("c_ab").alias("c_a"))
    cnt_b = cnt_ab.groupBy("b").agg(F.sum("c_ab").alias("c_b"))
    total = cnt_ab.agg(F.sum("c_ab").alias("n_total"))
    pmi = (
        cnt_ab.where(F.col("c_ab") >= PMI_MIN_COUNT)
        .join(cnt_a, "a")
        .join(cnt_b, "b")
        .crossJoin(F.broadcast(total))
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log(
                    (F.col("c_ab").cast("double") * F.col("n_total").cast("double"))
                    / (F.col("c_a").cast("double") * F.col("c_b").cast("double"))
                )
                * PMI_SCALE,
                0,
            )
            .cast("bigint")
            .alias("pmi_micro"),
        )
    )
    return pmi.orderBy(
        F.col("pmi_micro").desc(), "a", "b"
    ).limit(PMI_TOP_K)


TEXT_PMI_ORACLE = rf"""
WITH {_TOKS_CTE},
bg AS (
  SELECT unnest(list_transform(range(1, len(t)),
                i -> struct_pack(a := t[i], b := t[i + 1]))) AS s
  FROM toks WHERE len(t) >= 2
),
flat AS (SELECT s.a AS a, s.b AS b FROM bg),
cab AS (SELECT a, b, COUNT(*) AS c_ab FROM flat GROUP BY a, b),
ca AS (SELECT a, CAST(SUM(c_ab) AS BIGINT) AS c_a FROM cab GROUP BY a),
cb AS (SELECT b, CAST(SUM(c_ab) AS BIGINT) AS c_b FROM cab GROUP BY b),
tot AS (SELECT CAST(SUM(c_ab) AS BIGINT) AS n_total FROM cab)
SELECT a, b, c_ab,
       CAST(round(ln((CAST(c_ab AS DOUBLE) * CAST(n_total AS DOUBLE))
                     / (CAST(c_a AS DOUBLE) * CAST(c_b AS DOUBLE)))
                  * {PMI_SCALE}, 0) AS BIGINT) AS pmi_micro
FROM cab JOIN ca USING (a) JOIN cb USING (b) CROSS JOIN tot
WHERE c_ab >= {PMI_MIN_COUNT}
ORDER BY pmi_micro DESC, a, b
LIMIT {PMI_TOP_K}
"""


# --- text_zipf_slope: rank-frequency power-law audit ------------------

ZIPF_TOP_TERMS = 500
ZIPF_SCALE = 1_000  # milli-lns: keeps R*Σxy inside bigint (see below)


def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf audit: OLS slope of ln(freq) on ln(rank) over the top
    ``ZIPF_TOP_TERMS`` corpus terms. Natural corpora sit near slope -1;
    a far-off slope is a red flag for templated/synthetic/boilerplate
    data — a cheap one-row health check for a training corpus.

    Exactness: both lns are quantized to MILLI-units (not micro — the
    normal-equation term R*Σxy must stay inside bigint: x,y ≲ 2e4
    milli, xy ≲ 4e8, Σ over 500 ≲ 2e11, R*Σ ≲ 1e14) so the OLS
    numerator/denominator are exact integers; doubles appear only in
    the final two divisions. The top-R table is vocabulary-bounded and
    the final window runs on R rows — driver-independent but tiny."""
    docs = load_table(spark, sf_dir, "documents")
    freq = (
        spread(
            docs.select("text"),
            min_bytes=TOKENIZE_MIN_BYTES_PER_PARTITION,
        )
        .select(F.explode(T.tokens("text")).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.col("freq").desc(), "term")
        .limit(ZIPF_TOP_TERMS)
    )
    ranked = freq.select(
        "term",
        "freq",
        F.row_number()
        .over(Window.orderBy(F.col("freq").desc(), "term"))
        .alias("rank"),
    ).select(
        F.round(F.log(F.col("rank").cast("double")) * ZIPF_SCALE, 0)
        .cast("bigint")
        .alias("x"),
        F.round(F.log(F.col("freq").cast("double")) * ZIPF_SCALE, 0)
        .cast("bigint")
        .alias("y"),
    )
    sums = ranked.agg(
        F.count(F.lit(1)).alias("r"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = (F.col("r") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    ) / (F.col("r") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return sums.select(
        F.col("r").alias("n_terms"),
        F.round(slope, 6).alias("zipf_slope"),
        F.round(
            (
                F.col("sy").cast("double") - slope * F.col("sx").cast("double")
            )
            / F.col("r").cast("double")
            / ZIPF_SCALE,
            6,
        ).alias("intercept_ln"),
    )


TEXT_ZIPF_ORACLE = rf"""
WITH {_TOKS_CTE},
freq AS (
  SELECT term, COUNT(*) AS freq
  FROM (SELECT unnest(t) AS term FROM toks)
  GROUP BY term
  ORDER BY freq DESC, term
  LIMIT {ZIPF_TOP_TERMS}
),
ranked AS (
  SELECT CAST(round(ln(CAST(row_number() OVER (ORDER BY freq DESC, term)
                            AS DOUBLE)) * {ZIPF_SCALE}, 0) AS BIGINT) AS x,
         CAST(round(ln(CAST(freq AS DOUBLE)) * {ZIPF_SCALE}, 0) AS BIGINT) AS y
  FROM freq
),
sums AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS r,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x * y) AS BIGINT) AS sxy, CAST(SUM(x * x) AS BIGINT) AS sxx
  FROM ranked
)
SELECT r AS n_terms,
       ROUND(CAST(r * sxy - sx * sy AS DOUBLE)
             / CAST(r * sxx - sx * sx AS DOUBLE), 6) AS zipf_slope,
       ROUND((CAST(sy AS DOUBLE)
              - (CAST(r * sxy - sx * sy AS DOUBLE)
                 / CAST(r * sxx - sx * sx AS DOUBLE))
                * CAST(sx AS DOUBLE))
             / CAST(r AS DOUBLE) / {ZIPF_SCALE}, 6) AS intercept_ln
FROM sums
"""


# --- token-budget-constrained selection --------------------------------

TOKEN_BUDGET = 10_000  # binds at sf0.01 (~27k corpus tokens): ~180 of 500 docs kept
_BUDGET_BUCKETS = 10


def corpus_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fill a fixed token budget with the highest-quality documents:
    order the corpus by quality (ties by doc_id), take documents while
    the running token total stays within ``TOKEN_BUDGET`` — the
    training-data budgeting op every pretraining mix ends with.

    The running total is a GLOBAL cumulative sum, which naively is a
    single-partition window (the classic scale trap — one task sorts
    the corpus). This uses the two-phase shape instead: bucket by the
    quality score's fixed-width decile (bucket order IS quality order,
    so the global sort order never crosses buckets out of sequence),
    compute per-bucket token totals (a 10-row frame), turn them into
    per-bucket prefix OFFSETS with a window over that tiny frame, then
    broadcast the offsets back and run the cumsum per bucket —
    ``offset + intra-bucket running sum`` equals the global cumsum,
    with the only global-ordered structure being 10 rows."""
    docs = load_table(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        T.quality_score("text").alias("q"),
        F.size(T.tokens("text")).cast("bigint").alias("n_tok"),
    ).withColumn(
        "bkt",
        F.least(
            F.lit(_BUDGET_BUCKETS - 1),
            F.floor(F.col("q") * _BUDGET_BUCKETS),
        ).cast("int"),
    )
    btot = scored.groupBy("bkt").agg(F.sum("n_tok").alias("btok"))
    wb = Window.orderBy(F.col("bkt").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = btot.withColumn(
        "offset", F.coalesce(F.sum("btok").over(wb), F.lit(0))
    ).select("bkt", "offset")
    w = Window.partitionBy("bkt").orderBy(F.col("q").desc(), "doc_id")
    cum = scored.join(F.broadcast(offs), "bkt").withColumn(
        "cum_tok", F.col("offset") + F.sum("n_tok").over(w)
    )
    return (
        cum.where(F.col("cum_tok") <= TOKEN_BUDGET)
        .select("doc_id", "n_tok", "cum_tok")
        .orderBy("cum_tok")
    )


# same quality expression as TEXT_QUALITY_ORACLE (llm_surface.py)
# exact-integer quality twin of functions/text.py:quality_score
# (r11 cross-sf sweep fix — see TEXT_QUALITY_ORACLE)
_Q_SQL = """(CASE WHEN len(t) > 0 THEN
  CAST((2 * (6 * len(t) * least(len(t), 100)
             + 800 * len(list_distinct(t))
             + 75 * least(CAST(list_sum(list_transform(t, x -> length(x))) AS BIGINT),
                          8 * len(t)))
        * 1000000 + 2000 * len(t))
       // (4000 * len(t)) AS DOUBLE) / 1000000.0
  END)"""

CORPUS_TOKEN_BUDGET_ORACLE = rf"""
WITH {_TOKS_CTE},
scored AS (
  SELECT doc_id, {_Q_SQL} AS q, CAST(len(t) AS BIGINT) AS n_tok FROM toks
),
cum AS (
  SELECT doc_id, n_tok,
         SUM(n_tok) OVER (ORDER BY q DESC, doc_id
                          ROWS UNBOUNDED PRECEDING) AS cum_tok
  FROM scored
)
SELECT doc_id, n_tok, CAST(cum_tok AS BIGINT) AS cum_tok
FROM cum WHERE cum_tok <= {TOKEN_BUDGET} ORDER BY cum_tok
"""


# --- deterministic global training-order shuffle -----------------------

SHUFFLE_SEED = 17
_SHUFFLE_BUCKET_SHIFT = 52  # 60-bit hash >> 52 -> 256 ordered buckets


def corpus_shuffle_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-0 training-order shuffle: every data loader needs the
    corpus in a REPRODUCIBLE pseudo-random order (auditable restarts,
    identical order across re-runs) — position = rank of the seeded
    portable hash, ties by doc_id.

    The naive plan is rank() over a GLOBAL order — a single-partition
    window that sorts the corpus in one task. This uses the
    ``corpus_token_budget`` two-phase shape instead: bucket by the
    hash's top 8 bits (bucket order IS hash-prefix order, so the
    global order never crosses buckets out of sequence), per-bucket
    counts -> prefix offsets via a window over the 256-row frame,
    broadcast the offsets back, and ``offset + intra-bucket
    row_number`` equals the global position. At 100 TB the only
    globally-ordered structure is 256 rows; writing the output
    bucket-partitioned then yields hash-ordered shards directly."""
    from personal_health_etl_pipeline_spark.functions.hashing import (
        md5_long_seeded,
    )

    docs = load_table(spark, sf_dir, "documents")
    base = docs.select(
        "doc_id", md5_long_seeded("doc_id", SHUFFLE_SEED).alias("h")
    ).withColumn("bkt", F.shiftright("h", _SHUFFLE_BUCKET_SHIFT))
    bcnt = base.groupBy("bkt").agg(F.count(F.lit(1)).alias("bn"))
    wb = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = bcnt.withColumn(
        "offset", F.coalesce(F.sum("bn").over(wb), F.lit(0))
    ).select("bkt", "offset")
    w = Window.partitionBy("bkt").orderBy("h", "doc_id")
    return (
        base.join(F.broadcast(offs), "bkt")
        .select(
            "doc_id",
            (F.col("offset") + F.row_number().over(w)).alias("shuffle_pos"),
        )
        .orderBy("shuffle_pos")
    )


def _shuffle_oracle() -> str:
    from personal_health_etl_pipeline_spark.functions.hashing import (
        duckdb_md5_long_seeded,
    )

    h = duckdb_md5_long_seeded("doc_id", SHUFFLE_SEED)
    return f"""
WITH h AS (SELECT doc_id, {h} AS h FROM documents)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (ORDER BY h, doc_id) AS BIGINT) AS shuffle_pos
FROM h ORDER BY shuffle_pos
"""


CORPUS_SHUFFLE_ORACLE = _shuffle_oracle()


# --- CCNet-style perplexity filter (composition over the LM artifact) --

PPX_THRESHOLD_MICRO = -3_400_000  # keep docs with avg lp >= -3.4 nats


def corpus_perplexity_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LM-based corpus filtering — the CCNet recipe: score every doc
    under the corpus bigram LM, keep the fluent ones, report the
    per-language survivor profile (docs in, docs kept, keep-rate
    milli, kept bigram mass). The composition a curation pipeline
    actually runs — :func:`text_bigram_logprob` is the SCORER, this is
    the FILTER built on it, sharing the same session-memoized LM
    artifact (scoring here costs one explode + one model join even
    though two entries use the model).

    Exactness: the keep rule avoids the division —
    ``sum_lp_micro >= {PPX_THRESHOLD_MICRO} * n_bigrams`` is the
    integer cross-multiplied form of ``avg >= threshold`` (both sides
    BIGINT; lp is negative so the comparison direction is preserved by
    multiplying by the positive n_bigrams). Population = scored docs
    (>= 2 tokens), pinned identically in both engines.

    Scale shape: bigram explode -> model join (the artifact) -> per-doc
    agg -> broadcast-joinable doc->lang map -> per-lang agg. The filter
    adds ONE tiny aggregation over the per-doc frame; everything heavy
    is shared with the scorer.
    """
    docs = load_table(spark, sf_dir, "documents")
    key = (spark.sparkContext.applicationId, sf_dir)
    model = _BIGRAM_MODEL_MEMO.get(key)
    if model is None:
        model = bigram_lp_model(docs).localCheckpoint(eager=True)
        _BIGRAM_MODEL_MEMO[key] = model
    bg = _bigram_stream(docs)
    per_doc = (
        bg.join(model, ["a", "ab"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp").alias("sum_lp_micro"),
        )
    )
    keep = F.col("sum_lp_micro") >= F.lit(PPX_THRESHOLD_MICRO) * F.col(
        "n_bigrams"
    )
    return (
        per_doc.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(keep.cast("long")).alias("n_kept"),
            F.expr(
                f"1000 * sum(CASE WHEN sum_lp_micro >="
                f" {PPX_THRESHOLD_MICRO} * n_bigrams THEN 1 ELSE 0 END)"
                f" div count(*)"
            ).alias("kept_milli"),
            F.sum(F.when(keep, F.col("n_bigrams")).otherwise(0)).alias(
                "kept_bigrams"
            ),
        )
        .orderBy("lang")
    )


CORPUS_PPX_FILTER_ORACLE = rf"""
WITH {_TOKS_CTE},
bg AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                i -> struct_pack(a := t[i], ab := t[i] || '|' || t[i + 1]))) AS s
  FROM toks WHERE len(t) >= 2
),
flat AS (SELECT doc_id, s.a AS a, s.ab AS ab FROM bg),
cab AS (SELECT a, ab, COUNT(*) AS c_ab FROM flat GROUP BY a, ab),
ca AS (SELECT a, COUNT(*) AS c_a FROM flat GROUP BY a),
v AS (SELECT COUNT(DISTINCT a) AS v FROM flat),
scored AS (
  SELECT doc_id,
         CAST(round(ln(CAST(c_ab + 1 AS DOUBLE) / CAST(c_a + v AS DOUBLE))
                    * 1000000, 0) AS BIGINT) AS lp
  FROM flat JOIN cab USING (a, ab) JOIN ca USING (a) CROSS JOIN v
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_bigrams,
         CAST(SUM(lp) AS BIGINT) AS sum_lp_micro
  FROM scored GROUP BY doc_id
)
SELECT d.lang,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN p.sum_lp_micro >=
                {PPX_THRESHOLD_MICRO} * p.n_bigrams
                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(1000 * SUM(CASE WHEN p.sum_lp_micro >=
                  {PPX_THRESHOLD_MICRO} * p.n_bigrams
                  THEN 1 ELSE 0 END) // COUNT(*) AS BIGINT) AS kept_milli,
       CAST(SUM(CASE WHEN p.sum_lp_micro >=
                {PPX_THRESHOLD_MICRO} * p.n_bigrams
                THEN p.n_bigrams ELSE 0 END) AS BIGINT) AS kept_bigrams
FROM per_doc p JOIN documents d USING (doc_id)
GROUP BY d.lang ORDER BY d.lang
"""
