"""Extended training-data surface, third batch: exact substring-span
dedup, DSIR importance weights, a trained Naive-Bayes language
classifier, and weighted reservoir sampling.

Same contract as llm_surface / llm_surface2: every entry is a pure
DataFrame plan (zero Python UDFs), every stochastic-looking choice is
derandomized through the portable md5 hash family, every ln is
quantized to integer micro-units before aggregation where exactness
matters, and every entry has a fully-unrolled DuckDB oracle.
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
from personal_health_etl_pipeline_spark.operators.substring import (
    SUBSTRING_MIN_DOCS,
    SUBSTRING_WINDOW,
    cut_repeated_spans,
    repeated_spans,
)
from personal_health_etl_pipeline_spark.sources.tables import load_table

_TOKS_CTE = r"""
toks AS (
  SELECT doc_id, source, lang,
         list_filter(regexp_split_to_array(text, '\s+'), x -> x <> '') AS t
  FROM documents
)
"""


# --- exact repeated-substring spans (Lee et al. 2021 family) ----------

_SUBSTR_MEMO: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def _substr_artifacts(
    spark: SparkSession, sf_dir: str
) -> tuple[DataFrame, DataFrame]:
    """The corpus-static substring-dedup state — the (doc, pos, hash)
    windows table and the (doc, pos, token) stream — materialized once
    per (session, corpus) and shared by the detect and cut entries
    (the `_tf_table` / k-means-centroid artifact discipline)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _SUBSTR_MEMO.get(key)
    if memo is not None:
        return memo
    from personal_health_etl_pipeline_spark.operators.partitioning import (
        SKETCH_MIN_BYTES_PER_PARTITION,
    )
    from personal_health_etl_pipeline_spark.operators.substring import (
        token_windows,
    )

    docs = load_table(spark, sf_dir, "documents")
    wins = token_windows(docs).localCheckpoint(eager=True)
    toks = (
        spread(
            docs.select("doc_id", "text"),
            min_bytes=SKETCH_MIN_BYTES_PER_PARTITION,
        )
        .select("doc_id", T.tokens("text").alias("t"))
        .select("doc_id", F.posexplode("t").alias("tp", "tok"))
        .select("doc_id", F.col("tp").cast("bigint").alias("tp"), "tok")
        .localCheckpoint(eager=True)
    )
    memo = (wins, toks)
    _SUBSTR_MEMO[key] = memo
    return memo


def dedup_substring_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal cross-document repeated token spans — the exact-match
    complement of MinHash whole-document dedup (catches boilerplate /
    quoted passages inside otherwise-unrelated documents). See
    ``operators/substring.py`` for the scale design (one window
    explode, one count-distinct groupBy, no pair explosion). Runs
    against the session-memoized windows artifact."""
    wins, _ = _substr_artifacts(spark, sf_dir)
    return repeated_spans(
        load_table(spark, sf_dir, "documents"), windows=wins
    )


_W = SUBSTRING_WINDOW

DEDUP_SUBSTRING_ORACLE = rf"""
WITH {_TOKS_CTE},
wins AS (
  SELECT doc_id, s.pos AS pos, s.h AS h FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - {_W} + 2),
             i -> struct_pack(
               pos := CAST(i - 1 AS BIGINT),
               h := {duckdb_md5_long(
                   f"array_to_string(t[CAST(i AS INT):CAST(i + {_W} - 1 AS INT)], ' ')"
               )}))) AS s
    FROM toks WHERE len(t) >= {_W})
),
dup AS (
  SELECT h FROM wins GROUP BY h
  HAVING COUNT(DISTINCT doc_id) >= {SUBSTRING_MIN_DOCS}
),
hits AS (SELECT doc_id, pos FROM wins JOIN dup USING (h)),
isl AS (
  SELECT doc_id, pos,
         pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
  FROM hits
)
SELECT doc_id, MIN(pos) + 1 AS span_start, MAX(pos) + {_W} AS span_end,
       COUNT(*) AS n_windows
FROM isl GROUP BY doc_id, grp ORDER BY doc_id, span_start
"""


def dedup_substring_cut(spark: SparkSession, sf_dir: str) -> DataFrame:
    """APPLY-path twin of :func:`dedup_substring_spans`: rewrite every
    document with its cross-document repeated spans cut, keeping the
    copy in the lowest-doc_id document per duplicated window (Lee et
    al.'s remove-all-but-one). Returns the full rewritten corpus frame
    ``(doc_id, n_tokens, n_cut, cleaned_text)`` — the value hash
    certifies the positional cut logic AND the whitespace-normalized
    reconstruction, not just the span report. Runs against the
    session-memoized windows + token-stream artifacts."""
    wins, toks = _substr_artifacts(spark, sf_dir)
    return cut_repeated_spans(
        load_table(spark, sf_dir, "documents"),
        windows=wins,
        token_stream=toks,
    )


DEDUP_SUBSTRING_CUT_ORACLE = rf"""
WITH {_TOKS_CTE},
tokpos AS (
  SELECT doc_id, s.tp AS tp, s.tok AS tok FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) + 1),
             i -> struct_pack(
               tp := CAST(i - 1 AS BIGINT),
               tok := t[CAST(i AS INT)]))) AS s
    FROM toks)
),
wins AS (
  SELECT doc_id, s.pos AS pos, s.h AS h FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - {_W} + 2),
             i -> struct_pack(
               pos := CAST(i - 1 AS BIGINT),
               h := {duckdb_md5_long(
                   f"array_to_string(t[CAST(i AS INT):CAST(i + {_W} - 1 AS INT)], ' ')"
               )}))) AS s
    FROM toks WHERE len(t) >= {_W})
),
keeper AS (
  SELECT h, MIN(doc_id) AS mdoc FROM wins GROUP BY h
  HAVING COUNT(DISTINCT doc_id) >= {SUBSTRING_MIN_DOCS}
),
cut_pos AS (
  SELECT DISTINCT w.doc_id, w.pos + u.off AS tp
  FROM wins w JOIN keeper k USING (h), range(0, {_W}) u(off)
  WHERE w.doc_id > k.mdoc
),
kept AS (
  SELECT t.doc_id, t.tp, t.tok FROM tokpos t
  ANTI JOIN cut_pos c ON t.doc_id = c.doc_id AND t.tp = c.tp
),
totals AS (SELECT doc_id, COUNT(*) AS n_tokens FROM tokpos GROUP BY doc_id),
reasm AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         array_to_string(list(tok ORDER BY tp), ' ') AS cleaned_text
  FROM kept GROUP BY doc_id
)
SELECT t.doc_id, t.n_tokens,
       t.n_tokens - COALESCE(r.n_kept, 0) AS n_cut,
       COALESCE(r.cleaned_text, '') AS cleaned_text
FROM totals t LEFT JOIN reasm r USING (doc_id)
ORDER BY t.doc_id
"""


# --- DSIR importance weights (Xie et al. 2023 family) -----------------

DSIR_TARGET_LANG = "en"


def _doc_tokens(docs: DataFrame) -> DataFrame:
    return (
        spread(
            docs.select("doc_id", "lang", "text"),
            min_bytes=TOKENIZE_MIN_BYTES_PER_PARTITION,
        )
        .select("doc_id", "lang", F.explode(T.tokens("text")).alias("term"))
    )


def _tf_table(docs: DataFrame) -> DataFrame:
    """The per-doc term-frequency table, materialized ONCE.

    Every consumer below (model counts, vocabulary, totals, scoring)
    references this table several times, and Spark executes each plan
    branch's subtree independently (exchange reuse only dedupes
    byte-identical exchanges, which post-aggregation branches are not)
    — without materialization the corpus gets re-exploded once per
    branch (~8 Generate nodes observed). Eager ``localCheckpoint``
    runs the explode+shuffle exactly once and hands every branch an
    in-memory block scan; the tf table is the natural thing to
    materialize — it is the smallest corpus-derived state all passes
    share (cf. ``bigram_logprob``, which accepts TWO explodes instead
    because its shared state would be the raw bigram stream itself).
    """
    return (
        _doc_tokens(docs)
        .groupBy("doc_id", "lang", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=True)
    )


_TF_MEMO: dict[tuple[str, str], DataFrame] = {}


def _corpus_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-memoized TF table for the shared ``documents`` corpus.

    The TF table is this module's corpus INDEX artifact — the same
    role the persisted minhash band index and IVF list index play for
    dedup/ANN: built once per corpus version, probed by every
    classifier/weighting pass over it (``text_nb_langid``,
    ``corpus_dsir_weights``). Memoizing per (application, sf_dir)
    makes repeated calls in one session pay the explode+shuffle once;
    state is bounded (one checkpointed TF table per corpus dir) and
    dies with the session. The generic bodies (:func:`nb_langid`,
    :func:`dsir_weights`) still build their own TF table when handed
    an arbitrary frame.
    """
    key = (spark.sparkContext.applicationId, sf_dir)
    tfl = _TF_MEMO.get(key)
    if tfl is None:
        tfl = _tf_table(load_table(spark, sf_dir, "documents"))
        _TF_MEMO[key] = tfl
    return tfl


def corpus_dsir_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling, unigram variant: each
    document's mean per-token log-likelihood ratio between a *target*
    unigram LM (here: the ``lang = 'en'`` slice, standing in for
    "high-quality target domain") and the *raw-corpus* LM, both add-1
    smoothed. Documents resembling the target rank high; at real scale
    the weights feed Gumbel-top-k resampling (the paper uses hashed
    n-gram features — same shape, the hash becomes the term key).

    Scale: the corpus is exploded ONCE, into the per-doc term-frequency
    table (session-memoized — :func:`_corpus_tf`); BOTH models derive
    from one groupBy(term) over it (the target count is a conditional
    sum), scalar totals ride one broadcast row, and scoring re-joins
    the same tf table against the bounded term table — the big
    explode+shuffle happens once, not once per model. Each ln is
    micro-quantized before summing — integer aggregates, one IEEE
    division at the end.
    """
    return dsir_weights(
        load_table(spark, sf_dir, "documents"),
        tfl=_corpus_tf(spark, sf_dir),
    )


def dsir_weights(
    docs: DataFrame,
    target_lang: str = DSIR_TARGET_LANG,
    tfl: DataFrame | None = None,
) -> DataFrame:
    """Scoring body of :func:`corpus_dsir_weights` over any
    ``(doc_id, lang, text)`` frame (unit-testable on synthetic
    corpora)."""
    if tfl is None:
        tfl = _tf_table(docs)
    cnt = tfl.groupBy("term").agg(
        F.sum("tf").alias("n_all"),
        F.sum(
            F.when(F.col("lang") == target_lang, F.col("tf")).otherwise(0)
        ).alias("n_tgt"),
    )
    tot = cnt.agg(
        F.sum("n_all").alias("t_all"),
        F.sum("n_tgt").alias("t_tgt"),
        F.count(F.lit(1)).alias("v"),
    )
    lam = cnt.crossJoin(F.broadcast(tot)).select(
        "term",
        F.round(
            (
                F.log(
                    (F.col("n_tgt") + 1).cast("double")
                    / (F.col("t_tgt") + F.col("v")).cast("double")
                )
                - F.log(
                    (F.col("n_all") + 1).cast("double")
                    / (F.col("t_all") + F.col("v")).cast("double")
                )
            )
            * 1_000_000,
            0,
        )
        .cast("bigint")
        .alias("llr"),
    )
    lp = F.sum(F.col("tf") * F.col("llr"))
    return (
        tfl.join(lam, "term")
        .groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            lp.alias("sum_llr_micro"),
            F.round(lp / F.sum("tf"), 6).alias("avg_llr_micro"),
        )
        .orderBy("doc_id")
    )


CORPUS_DSIR_ORACLE = rf"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, lang, unnest(t) AS term FROM toks),
cnt AS (
  SELECT term, COUNT(*) AS n_all,
         SUM(CASE WHEN lang = '{DSIR_TARGET_LANG}' THEN 1 ELSE 0 END) AS n_tgt
  FROM tok GROUP BY term
),
tot AS (SELECT SUM(n_all) AS t_all, SUM(n_tgt) AS t_tgt, COUNT(*) AS v FROM cnt),
lam AS (
  SELECT term,
         CAST(round((ln(CAST(n_tgt + 1 AS DOUBLE) / CAST(t_tgt + v AS DOUBLE))
                     - ln(CAST(n_all + 1 AS DOUBLE) / CAST(t_all + v AS DOUBLE)))
                    * 1000000, 0) AS BIGINT) AS llr
  FROM cnt CROSS JOIN tot
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(llr) AS BIGINT) AS sum_llr_micro,
       ROUND(SUM(llr) / COUNT(*), 6) AS avg_llr_micro
FROM tok JOIN lam USING (term)
GROUP BY doc_id ORDER BY doc_id
"""


# --- trained Naive-Bayes language classifier ---------------------------

def text_nb_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multinomial Naive Bayes trained on the corpus's own ``lang``
    labels, then applied back to every document — the distributed shape
    of a fastText-style quality/language classifier pass (train: one
    grouped count; score: one bounded-model join; at real scale the
    model is trained on a labeled sample and scored over everything).

    Model: lp(term, lang) = round-micro ln((c(term,lang) + 1) /
    (c(lang) + V)); prior(lang) = ln(docs(lang) / N). Integer
    aggregates, deterministic ties (score desc, lang asc).

    Scale shape — SPARSE scoring: every UNOBSERVED (term, lang) pair
    shares the same add-1 floor lp0(l) = lp(c=0), so
    score(d,l) = sum_{observed} tf*(lp - lp0(l)) + n_tokens(d)*lp0(l)
    + prior(l), term-for-term identical (same per-pair quantization)
    to the dense sum. Scoring therefore inner-joins the per-doc TF
    table against the observed (term, lang) counts — output size is
    the number of (doc, term, lang) triples with c(term,lang) > 0,
    ~|doc terms| for disjoint-vocabulary languages — instead of
    densifying every doc term across all L languages through a
    vocab x L grid (the r5 shape: |doc terms| x L join output plus a
    full-vocab grid materialization). The dense completion happens on
    the (docs x L) frame — n_tokens cross-joined with the L-row
    per-language constant table — the one place density is cheap.
    The TF table and the trained model are both session-memoized
    corpus artifacts (:func:`_corpus_tf`, ``_NB_MODEL_MEMO``): train
    once per corpus, score many times — the production classifier
    shape, same artifact pattern as the persisted minhash/IVF indexes.
    """
    tfl = _corpus_tf(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir)
    model = _NB_MODEL_MEMO.get(key)
    if model is None:
        docs = load_table(spark, sf_dir, "documents")
        delta, per_lang = nb_train(docs, tfl)
        model = (
            delta.localCheckpoint(eager=True),
            per_lang.localCheckpoint(eager=True),
        )
        _NB_MODEL_MEMO[key] = model
    return nb_score(tfl, *model)


_NB_MODEL_MEMO: dict[tuple[str, str], tuple[DataFrame, DataFrame]] = {}


def nb_langid(docs: DataFrame, tfl: DataFrame | None = None) -> DataFrame:
    """Train-and-score body of :func:`text_nb_langid` over any
    ``(doc_id, lang, text)`` frame (unit-testable on synthetic
    corpora)."""
    if tfl is None:
        tfl = _tf_table(docs)
    delta, per_lang = nb_train(docs, tfl)
    return nb_score(tfl, delta, per_lang)


def nb_train(
    docs: DataFrame, tfl: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Fit the NB model: the observed-pair ``delta`` table and the
    L-row ``per_lang`` constant table (lp0 floor + prior)."""
    cnt_lt = tfl.groupBy("lang", "term").agg(F.sum("tf").alias("c"))
    c_l = cnt_lt.groupBy("lang").agg(F.sum("c").alias("c_l"))
    v = cnt_lt.select("term").distinct().agg(F.count(F.lit(1)).alias("v"))
    prior = (
        docs.groupBy("lang")
        .agg(F.count(F.lit(1)).alias("d_l"))
        .crossJoin(F.broadcast(docs.agg(F.count(F.lit(1)).alias("n"))))
        .select(
            "lang",
            F.round(
                F.log(F.col("d_l").cast("double") / F.col("n").cast("double"))
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("prior_micro"),
        )
    )
    # per-language constants: the add-1 floor lp0 = lp(c=0) + prior
    # (L rows, broadcast everywhere they appear)
    per_lang = (
        c_l.crossJoin(F.broadcast(v))
        .select(
            "lang",
            F.round(
                F.log(
                    F.lit(1.0) / (F.col("c_l") + F.col("v")).cast("double")
                )
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("lp0_micro"),
        )
        .join(prior, "lang")
    )
    # observed-pair model: lp - lp0, quantized EXACTLY as the dense
    # grid quantized lp (so scores match the dense formulation bit-
    # for-bit); zero rows for unobserved pairs by construction
    delta = (
        cnt_lt.join(F.broadcast(c_l), "lang")
        .crossJoin(F.broadcast(v))
        .join(F.broadcast(per_lang.select("lang", "lp0_micro")), "lang")
        .select(
            "term",
            "lang",
            (
                F.round(
                    F.log(
                        (F.col("c") + 1).cast("double")
                        / (F.col("c_l") + F.col("v")).cast("double")
                    )
                    * 1_000_000,
                    0,
                ).cast("bigint")
                - F.col("lp0_micro")
            ).alias("delta_micro"),
        )
    )
    return delta, per_lang


def nb_score(
    tfl: DataFrame, delta: DataFrame, per_lang: DataFrame
) -> DataFrame:
    """Score every document against a trained NB model.

    Argmax is a single ``min(struct(-score, lang))`` aggregation
    (hash agg, no window sort); the true label rides the TF table
    (constant per doc), so no join back to the corpus is needed.
    """
    tf = tfl.select("doc_id", "term", "tf")
    hits = (
        tf.join(delta, "term")
        .groupBy("doc_id", "lang")
        .agg(F.sum(F.col("tf") * F.col("delta_micro")).alias("s_hit"))
    )
    ntok = tfl.groupBy("doc_id").agg(
        F.sum("tf").alias("n_tok"), F.max("lang").alias("true_lang")
    )
    scored = (
        ntok.crossJoin(F.broadcast(per_lang))
        .join(hits, ["doc_id", "lang"], "left")
        .select(
            "doc_id",
            "true_lang",
            "lang",
            (
                F.coalesce(F.col("s_hit"), F.lit(0))
                + F.col("n_tok") * F.col("lp0_micro")
                + F.col("prior_micro")
            ).alias("score_micro"),
        )
    )
    best = scored.groupBy("doc_id", "true_lang").agg(
        F.min(
            F.struct(
                (-F.col("score_micro")).alias("neg"),
                F.col("lang").alias("lang"),
            )
        ).alias("b")
    )
    return best.select(
        "doc_id",
        "true_lang",
        F.col("b.lang").alias("pred_lang"),
        (-F.col("b.neg")).alias("score_micro"),
    ).orderBy("doc_id")


TEXT_NB_ORACLE = rf"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, lang, unnest(t) AS term FROM toks),
cnt_lt AS (SELECT lang, term, COUNT(*) AS c FROM tok GROUP BY lang, term),
c_l AS (SELECT lang, SUM(c) AS c_l FROM cnt_lt GROUP BY lang),
v AS (SELECT COUNT(DISTINCT term) AS v FROM tok),
prior AS (
  SELECT lang,
         CAST(round(ln(CAST(COUNT(*) AS DOUBLE)
                       / (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents))
                    * 1000000, 0) AS BIGINT) AS prior_micro
  FROM documents GROUP BY lang
),
per_lang AS (
  SELECT c_l.lang,
         CAST(round(ln(1.0 / CAST(c_l.c_l + v.v AS DOUBLE)) * 1000000, 0)
              AS BIGINT) AS lp0_micro,
         prior.prior_micro
  FROM c_l CROSS JOIN v JOIN prior ON prior.lang = c_l.lang
),
delta AS (
  SELECT cnt_lt.term, cnt_lt.lang,
         CAST(round(ln(CAST(cnt_lt.c + 1 AS DOUBLE)
                       / CAST(c_l.c_l + v.v AS DOUBLE)) * 1000000, 0)
              AS BIGINT) - per_lang.lp0_micro AS delta_micro
  FROM cnt_lt
  JOIN c_l ON c_l.lang = cnt_lt.lang
  CROSS JOIN v
  JOIN per_lang ON per_lang.lang = cnt_lt.lang
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
ntok AS (SELECT doc_id, SUM(tf) AS n_tok FROM tf GROUP BY doc_id),
hits AS (
  SELECT tf.doc_id, delta.lang, SUM(tf.tf * delta.delta_micro) AS s_hit
  FROM tf JOIN delta USING (term) GROUP BY tf.doc_id, delta.lang
),
scored AS (
  SELECT ntok.doc_id, per_lang.lang,
         CAST(COALESCE(hits.s_hit, 0)
              + ntok.n_tok * per_lang.lp0_micro
              + per_lang.prior_micro AS BIGINT) AS score_micro
  FROM ntok CROSS JOIN per_lang
  LEFT JOIN hits ON hits.doc_id = ntok.doc_id
                AND hits.lang = per_lang.lang
),
pred AS (
  SELECT doc_id, lang AS pred_lang, score_micro,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY score_micro DESC, lang) AS rn
  FROM scored
)
SELECT p.doc_id, d.lang AS true_lang, p.pred_lang, p.score_micro
FROM pred p JOIN documents d ON d.doc_id = p.doc_id
WHERE p.rn = 1 ORDER BY p.doc_id
"""


# --- BM25 ranked retrieval ---------------------------------------------

BM25_QUERIES = 8  # top-df terms double as the query workload
BM25_TOPK = 10


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 (k1=1.2, b=0.75) top-{BM25_TOPK} ranked retrieval per
    query term — the relevance primitive behind retrieval-based
    curation (dedup against a reference set, quality-by-relevance
    filtering, RAG corpus selection). The query workload is the
    {BM25_QUERIES} highest-df terms (ties on term asc): bounded,
    data-derived, oracle-reproducible.

    Exactness: idf = ln((N - df + 0.5)/(df + 0.5) + 1) (the
    Lucene/BM25+ always-positive form) is micro-quantized; the tf
    saturation is then EXACT INTEGER arithmetic — with T = total
    tokens, N = docs, dl = doc length, multiplying the classic
    denominator through by 10*T gives
        score = idf_micro * 22 * tf * T / (10*T*tf + 3*T + 9*dl*N)
    (k1 = 12/10, b = 3/4), an integer-over-integer single IEEE
    division both engines compute identically, rounded to 6dp.

    Scale shape: one bounded query-term table broadcast against the
    session-memoized TF artifact (:func:`_corpus_tf`) — the scored
    stream is |postings of the query terms|, never corpus x queries —
    then a per-term top-k window over that bounded stream. int64
    headroom: idf_micro*22*tf*T needs ~log2(idf*22*tf*T) bits — at
    corpus sizes where it would overflow, reduce the rational by T
    first (score is invariant); the certified formula keeps the
    un-reduced form because both engines must round the SAME integers.
    """
    tfl = _corpus_tf(spark, sf_dir)
    dl = tfl.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = dl.agg(
        F.count(F.lit(1)).alias("n"), F.sum("dl").alias("t")
    )
    df_t = tfl.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        df_t.orderBy(F.col("df").desc(), "term")
        .limit(BM25_QUERIES)
        .crossJoin(F.broadcast(tot))
        .select(
            "term",
            F.round(
                F.log(
                    (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5)
                    + 1.0
                )
                * 1_000_000,
                0,
            )
            .cast("bigint")
            .alias("idf_micro"),
            "n",
            "t",
        )
    )
    scored = (
        tfl.select("doc_id", "term", "tf")
        .join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .select(
            "term",
            "doc_id",
            F.round(
                (
                    F.col("idf_micro") * 22 * F.col("tf") * F.col("t")
                ).cast("double")
                / (
                    10 * F.col("t") * F.col("tf")
                    + 3 * F.col("t")
                    + 9 * F.col("dl") * F.col("n")
                ).cast("double"),
                6,
            ).alias("score"),
        )
    )
    w = Window.partitionBy("term").orderBy(
        F.col("score").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= BM25_TOPK)
        .select("term", "rank", "doc_id", "score")
        .orderBy("term", "rank")
    )


TEXT_BM25_ORACLE = rf"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
tot AS (SELECT COUNT(*) AS n, SUM(dl) AS t FROM dl),
df_t AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
qterms AS (
  SELECT term,
         CAST(round(ln((CAST(n AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                    * 1000000, 0) AS BIGINT) AS idf_micro,
         n, t
  FROM df_t CROSS JOIN tot
  ORDER BY df DESC, term LIMIT {BM25_QUERIES}
),
scored AS (
  SELECT q.term, tf.doc_id,
         ROUND(CAST(q.idf_micro * 22 * tf.tf * q.t AS DOUBLE)
               / CAST(10 * q.t * tf.tf + 3 * q.t + 9 * dl.dl * q.n
                      AS DOUBLE), 6) AS score
  FROM tf JOIN qterms q USING (term) JOIN dl USING (doc_id)
)
SELECT term, rank, doc_id, score FROM (
  SELECT *, row_number() OVER (PARTITION BY term
                               ORDER BY score DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {BM25_TOPK} ORDER BY term, rank
"""


# --- weighted reservoir sampling (Efraimidis-Spirakis A-ES) ------------

WEIGHTED_SAMPLE_K = 20
_H_DOMAIN_PLUS1 = float(2**60)  # md5_long range [0, 2^60); (h+1)/2^60 in (0, 1]


def corpus_sample_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, Efraimidis-Spirakis
    A-ES: item i gets key u_i^(1/w_i) with u_i uniform; the k largest
    keys are a correct weighted sample. Derandomized: u_i comes from
    the portable md5 hash of the doc id, weights are ``n_chars``
    (zero-weight docs are definitionally never sampled and are
    filtered identically in both engines). Ranking uses the monotone
    transform ln(u)/w (pico-quantized) instead of u^(1/w) — no
    overflow, integer compare.

    Scale: a pure projection followed by a distributed top-k
    (``TakeOrderedAndProject``: O(k) heap state per partition, no
    global sort, no full shuffle) — the same plan shape Spark gives
    ORDER BY + LIMIT.
    """
    return weighted_sample(load_table(spark, sf_dir, "documents"))


def weighted_sample(docs: DataFrame, k: int = WEIGHTED_SAMPLE_K) -> DataFrame:
    """Sampling body of :func:`corpus_sample_weighted` over any
    ``(doc_id, lang, n_chars)`` frame (unit-testable)."""
    keyed = docs.where(F.col("n_chars") > 0).select(
        "doc_id",
        "lang",
        "n_chars",
        F.round(
            F.log(
                (md5_long("doc_id") + 1).cast("double") / F.lit(_H_DOMAIN_PLUS1)
            )
            / F.col("n_chars").cast("double")
            * 1_000_000_000_000,
            0,
        )
        .cast("bigint")
        .alias("key_pico"),
    )
    return keyed.orderBy(F.col("key_pico").desc(), "doc_id").limit(k)


CORPUS_WEIGHTED_ORACLE = rf"""
SELECT doc_id, lang, n_chars,
       CAST(round(ln(CAST({duckdb_md5_long("doc_id")} + 1 AS DOUBLE)
                     / {_H_DOMAIN_PLUS1!r})
                  / CAST(n_chars AS DOUBLE) * 1000000000000, 0) AS BIGINT)
           AS key_pico
FROM documents WHERE n_chars > 0
ORDER BY key_pico DESC, doc_id LIMIT {WEIGHTED_SAMPLE_K}
"""


# --- learned BPE: byte-pair-encoding merge training ---------------------

BPE_MERGES = 6
EOW = "</w>"


def text_bpe_learned_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRAINED byte-pair encoding (Sennrich et al. 2016) — the actual
    tokenizer-training loop, distributed: start from characters (+ an
    end-of-word marker), repeatedly count adjacent symbol pairs across
    the corpus and merge the most frequent one. Complements
    ``text_bpe_token_count`` (which only *applies* a GPT-style regex);
    this learns the merges.

    Scale shape: the corpus collapses to the distinct-WORD count table
    in one explode+shuffle (BPE's own trick — pair counts are weighted
    word counts, so the loop never touches the corpus again). Each
    merge round is one bounded pair-count aggregation; the winning pair
    (1 row) is driver-ferried into the next round's merge expression as
    literals (the k-means contract: bounded state, no driver
    arithmetic). The merge itself is a pure array map.

    Determinism: ties break on (count desc, a, b); merges restricted to
    a != b pairs, which makes greedy left-to-right merging exactly
    positional (no overlapping matches) and therefore expressible
    identically in both engines. Self-pair merges (rare in natural
    text: 'aa' runs) are the documented exclusion.

    PRODUCTION-TRAIN BOUND: this loop runs one Spark job per learned
    merge — exact greedy BPE's inherent sequential dependency (merge
    k+1's pair counts depend on merge k). That is the right shape for
    the certified entry (n_merges = {BPE_MERGES}, oracle unrolls the
    same loop) and for modest vocabularies, but a production 32k-64k
    vocabulary means 32k+ driver round-trips — hours of scheduling
    floor regardless of data size. The standard distributed remedy is
    FREQUENCY-THRESHOLD BATCHED merging: each round applies EVERY
    non-overlapping pair whose count clears a decaying threshold
    (tokenizers' queue / SentencePiece's EM shape), collapsing the
    rounds to O(log vocab) at the cost of exact greedy ORDER among
    near-tied pairs — a different (well-studied, quality-neutral)
    tokenizer, which is why it is not swapped in under this entry's
    exact-greedy hash gate. Deliberately out of scope here; the loop
    below is the exact-greedy reference implementation.
    """
    return bpe_segment(
        load_table(spark, sf_dir, "documents"), n_merges=BPE_MERGES
    )


def _sql_quote(s: str) -> str:
    # Backslash FIRST, then quote — a token like "a\b" or "it's" must
    # round-trip through Spark SQL's string-literal parser unchanged.
    return s.replace("\\", "\\\\").replace("'", "\\'")


def _merge_expr(a: str, b: str, col: str = "s") -> str:
    qa, qb = _sql_quote(a), _sql_quote(b)
    return f"""
    filter(transform({col}, (x, i) ->
      CASE WHEN x = '{qa}' AND get({col}, i + 1) = '{qb}'
             THEN concat(x, get({col}, i + 1))
           WHEN get({col}, i - 1) = '{qa}' AND x = '{qb}' THEN CAST(NULL AS STRING)
           ELSE x END), x -> x IS NOT NULL)
    """


def bpe_segment(docs: DataFrame, n_merges: int = BPE_MERGES) -> DataFrame:
    """Training body of :func:`text_bpe_learned_segment`: returns every
    distinct word as ``(word, wc, seg)`` with ``seg`` the space-joined
    symbol sequence after ``n_merges`` learned merges."""
    words = (
        _doc_tokens(docs)
        .groupBy(F.col("term").alias("word"))
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    return bpe_segment_words(words, n_merges)


def bpe_segment_words(
    words: DataFrame, n_merges: int = BPE_MERGES, batch_k: int = 1
) -> DataFrame:
    """BPE training over a prepared ``(word, wc)`` table — lets callers
    that already hold the corpus TF artifact (:func:`_corpus_tf`) train
    without re-exploding the corpus (``wc = sum(tf)`` is exactly the
    occurrence count the explode would produce).

    ``batch_k=1`` (default) is EXACT greedy BPE — one count/collect
    round per merge, the semantics the hash-certified entry and its
    oracle pin down. ``batch_k>1`` is frequency-batched training for
    production vocabulary sizes: see :func:`bpe_train_merges` (a 30k
    vocabulary becomes ~vocab/batch_k driver rounds, not 30k)."""
    syms, _, _ = _bpe_train(words, n_merges, batch_k)
    return syms.select(
        "word", "wc", F.array_join("s", " ").alias("seg")
    ).orderBy("word")


def bpe_train_merges(
    words: DataFrame, n_merges: int, batch_k: int = 1
) -> tuple[list[tuple[str, str]], int]:
    """The learned merge list (in application order) and the number of
    driver-synchronized count rounds it took — the trainer to use for
    production vocabulary sizes.

    Batched rule (``batch_k>1``): each round ranks pair counts once
    and accepts up to ``batch_k`` pairs greedily by (count desc, a, b),
    skipping any pair sharing a SYMBOL with one already accepted that
    round. Symbol-disjoint pairs cannot overlap in any word, so every
    accepted pair's count is exactly its pre-round count (merging one
    cannot create or destroy occurrences of another) — the batch is
    "top-k of the true distribution", not an approximation of counts.
    What batching gives up vs exact greedy is only ORDER: a pair
    involving a symbol created THIS round (e.g. ("th","e") right
    after t+h -> th) cannot be picked until the next round, while
    1-per-round greedy could take it immediately. That is the
    standard quality-neutral trade every distributed BPE trainer
    makes (driver rounds drop from O(vocab) to ~vocab/batch_k); the
    certified catalog entry stays on ``batch_k=1`` because its oracle
    unrolls exact-greedy order.
    """
    _, merges, rounds = _bpe_train(words, n_merges, batch_k)
    return merges, rounds


def _bpe_train(
    words: DataFrame, n_merges: int, batch_k: int
) -> tuple[DataFrame, list[tuple[str, str]], int]:
    if batch_k < 1:
        raise ValueError(f"batch_k must be >= 1, got {batch_k}")
    syms = words.select(
        "word",
        "wc",
        F.expr(
            f"array_append(transform(sequence(1, length(word)),"
            f" i -> substring(word, i, 1)), '{EOW}')"
        ).alias("s"),
    ).localCheckpoint(eager=True)
    merges: list[tuple[str, str]] = []
    rounds = 0
    # FIXED round budget, mirroring the unrolled oracle: exactly
    # ceil(n_merges / batch_k) count rounds, each accepting up to
    # batch_k symbol-disjoint pairs from its 4*batch_k over-fetch
    # window. A pair-poor round therefore yields FEWER total merges
    # (the oracle's empty-choice no-op slots) — never an extra recount
    # round, which on a pair-poor corpus would re-rank post-merge
    # counts the oracle never sees and diverge the merge sequences
    # (ADVICE r8). batch_k=1 degenerates to n_merges one-accept
    # rounds: exact greedy, unchanged.
    n_rounds = -(-n_merges // batch_k)
    for r_i in range(n_rounds):
        want = min(batch_k, n_merges - r_i * batch_k)
        # over-fetch 4x: rows skipped by the disjoint-symbol rule are
        # replaced from the same collected ranking instead of paying
        # another count round (a bounded driver transfer either way)
        top = (
            syms.select(
                "wc",
                F.explode(
                    F.expr(
                        "zip_with(slice(s, 1, size(s) - 1), slice(s, 2, size(s) - 1),"
                        " (x, y) -> struct(x AS a, y AS b))"
                    )
                ).alias("p"),
            )
            .where(F.col("p.a") != F.col("p.b"))
            .groupBy("p.a", "p.b")
            .agg(F.sum("wc").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "a", "b")
            .limit(want * 4)
            .collect()
        )
        rounds += 1
        if not top:  # pair space exhausted: remaining rounds are no-ops
            break
        used: set[str] = set()
        chosen: list[tuple[str, str]] = []
        for r in top:
            if len(chosen) == want:
                break
            if r.a in used or r.b in used:
                continue
            chosen.append((r.a, r.b))
            used.update((r.a, r.b))
        # one chained projection per accepted merge, ONE checkpoint per
        # round; Catalyst keeps the (expensive, thrice-referenced)
        # lambda exprs as a projection pipeline instead of inlining
        for a, b in chosen:
            syms = syms.select("word", "wc", F.expr(_merge_expr(a, b)).alias("s"))
        syms = syms.localCheckpoint(eager=True)
        merges.extend(chosen)
    return syms, merges, rounds


def _bpe_oracle(n_merges: int) -> str:
    return (
        f"WITH {_TOKS_CTE},\n{_bpe_ctes(n_merges)}"
        + f"\nSELECT word, wc, array_to_string(s, ' ') AS seg FROM s{n_merges}"
        " ORDER BY word"
    )


def _bpe_ctes(n_merges: int) -> str:
    """The training-loop CTE chain (``toks`` must already be defined);
    ends at ``s{n_merges}`` = ``(word, wc, s)`` with ``s`` the merged
    symbol list — shared by the train oracle and the apply oracle."""
    parts = [
        "tok2 AS (SELECT unnest(t) AS word FROM toks)",
        "w0 AS (SELECT word, COUNT(*) AS wc FROM tok2 GROUP BY word)",
        (
            "s0 AS (SELECT word, wc, list_append(list_transform("
            "range(1, length(word) + 1), i -> word[CAST(i AS INT):CAST(i AS INT)]),"
            f" '{EOW}') AS s FROM w0)"
        ),
    ]
    for r in range(n_merges):
        parts.append(
            f"pr{r} AS (SELECT pp.a AS a, pp.b AS b, SUM(wc) AS cnt FROM ("
            f"SELECT wc, unnest(list_transform(range(1, len(s)), "
            f"p -> struct_pack(a := s[p], b := s[p + 1]))) AS pp FROM s{r}"
            f") WHERE pp.a <> pp.b GROUP BY pp.a, pp.b)"
        )
        parts.append(
            f"best{r} AS (SELECT a, b FROM pr{r} ORDER BY cnt DESC, a, b LIMIT 1)"
        )
        parts.append(
            # LEFT JOIN ON TRUE (not CROSS JOIN): an exhausted pair space
            # leaves best{r} empty -> NULL literals -> the round is a
            # no-op, mirroring the Spark side's early break
            f"s{r + 1} AS (SELECT word, wc, "
            f"list_filter(list_transform(range(1, len(s) + 1), p -> "
            f"CASE WHEN s[p] = ba AND s[p + 1] = bb THEN s[p] || s[p + 1] "
            f"WHEN s[p - 1] = ba AND s[p] = bb THEN NULL "
            f"ELSE s[p] END), x -> x IS NOT NULL) AS s "
            f"FROM s{r} LEFT JOIN (SELECT a AS ba, b AS bb FROM best{r}) "
            f"ON TRUE)"
        )
    return ",\n".join(parts)


TEXT_BPE_LEARNED_ORACLE = _bpe_oracle(BPE_MERGES)


# --- frequency-BATCHED BPE training (the production trainer) -----------

BPE_BATCH_MERGES = 8
BPE_BATCH_K = 4  # merges accepted per count round -> 2 rounds not 8


def text_bpe_train_batched(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The frequency-BATCHED BPE trainer under its own hash gate:
    ``batch_k={BPE_BATCH_K}`` accepts up to k SYMBOL-DISJOINT pairs per
    count round, greedily by (count desc, a, b) over the round's single
    ranking — {BPE_BATCH_MERGES} merges in 2 driver rounds instead of
    8 (``bpe_segment_words(batch_k>1)``, the shape that makes a 32k
    vocabulary ~vocab/k rounds at 100 TB instead of 32k scheduling
    floors).

    Why this is EXACTLY certifiable (not an approximation): pairs
    accepted in one round share no symbol, so merging one cannot
    create or destroy occurrences of another — each accepted pair's
    count is its true pre-round count, and applying the batch
    sequentially equals applying it simultaneously. The batch rule is
    deterministic (rank, then first-fit symbol-disjoint scan bounded
    to the same 4k over-fetch the Spark side collects), so the oracle
    unrolls the IDENTICAL rule per round: rank CTE -> k chained
    first-eligible-choice CTEs (NOT EXISTS against every earlier
    choice) -> k chained merge applications. What batching trades vs
    exact greedy is only ORDER (a symbol created this round is not
    mergeable until the next round) — the rounds-vs-quality note in
    COVERAGE.md; `text_bpe_learned_segment` remains the exact-greedy
    certificate.

    Output: every distinct word as ``(word, wc, seg)`` after the
    {BPE_BATCH_MERGES} batched merges — the full downstream effect of
    the merge sequence, a stronger certificate than the merge list
    alone."""
    words = (
        _doc_tokens(load_table(spark, sf_dir, "documents"))
        .groupBy(F.col("term").alias("word"))
        .agg(F.count(F.lit(1)).alias("wc"))
    )
    return bpe_segment_words(
        words, n_merges=BPE_BATCH_MERGES, batch_k=BPE_BATCH_K
    )


def _bpe_batched_oracle(n_merges: int, batch_k: int) -> str:
    """Unrolled DuckDB twin of the batched trainer: per round, ONE
    ranking over the pair counts, then ``batch_k`` chained greedy
    choices (each the lowest-ranked pair symbol-disjoint from every
    earlier choice, within the same ``4 * batch_k`` over-fetch window
    the Spark side collects), then the chained merge applications."""
    parts = [
        "tok2 AS (SELECT unnest(t) AS word FROM toks)",
        "w0 AS (SELECT word, COUNT(*) AS wc FROM tok2 GROUP BY word)",
        (
            "s0 AS (SELECT word, wc, list_append(list_transform("
            "range(1, length(word) + 1), i -> word[CAST(i AS INT):CAST(i AS INT)]),"
            f" '{EOW}') AS s FROM w0)"
        ),
    ]
    assert n_merges % batch_k == 0  # fixed unroll: no partial round
    n_rounds = n_merges // batch_k
    cur = "s0"
    for r in range(n_rounds):
        parts.append(
            f"pr{r} AS (SELECT pp.a AS a, pp.b AS b, SUM(wc) AS cnt FROM ("
            f"SELECT wc, unnest(list_transform(range(1, len(s)), "
            f"p -> struct_pack(a := s[p], b := s[p + 1]))) AS pp FROM {cur}"
            f") WHERE pp.a <> pp.b GROUP BY pp.a, pp.b)"
        )
        parts.append(
            f"rk{r} AS (SELECT a, b, row_number() OVER "
            f"(ORDER BY cnt DESC, a, b) AS rk FROM pr{r} "
            f"QUALIFY rk <= {4 * batch_k})"
        )
        for j in range(1, batch_k + 1):
            disj = " AND ".join(
                f"NOT EXISTS (SELECT 1 FROM c{r}_{i} p "
                f"WHERE p.a IN (t.a, t.b) OR p.b IN (t.a, t.b))"
                for i in range(1, j)
            )
            where = f"WHERE {disj} " if disj else ""
            parts.append(
                f"c{r}_{j} AS (SELECT a, b FROM rk{r} t {where}"
                f"ORDER BY rk LIMIT 1)"
            )
        for j in range(1, batch_k + 1):
            nxt = f"s{r}a{j}"
            parts.append(
                f"{nxt} AS (SELECT word, wc, "
                f"list_filter(list_transform(range(1, len(s) + 1), p -> "
                f"CASE WHEN s[p] = ba AND s[p + 1] = bb THEN s[p] || s[p + 1] "
                f"WHEN s[p - 1] = ba AND s[p] = bb THEN NULL "
                f"ELSE s[p] END), x -> x IS NOT NULL) AS s "
                f"FROM {cur} LEFT JOIN (SELECT a AS ba, b AS bb FROM c{r}_{j}) "
                f"ON TRUE)"
            )
            cur = nxt
    return (
        f"WITH {_TOKS_CTE},\n"
        + ",\n".join(parts)
        + f"\nSELECT word, wc, array_to_string(s, ' ') AS seg FROM {cur}"
        " ORDER BY word"
    )


TEXT_BPE_BATCHED_ORACLE = _bpe_batched_oracle(BPE_BATCH_MERGES, BPE_BATCH_K)


_BPE_SEG_MEMO: dict[tuple[str, str, int], DataFrame] = {}


def text_bpe_apply_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the BPE merges, then APPLY them corpus-wide — the
    composition a tokenizer pipeline actually runs: per language,
    total word occurrences, total subword tokens under the learned
    segmentation, and the compression ratio in milli-units.

    Scale shape (r6): BOTH phases ride the session-memoized corpus TF
    artifact (:func:`_corpus_tf`) — training's word counts are
    ``sum(tf)`` (no second corpus explode) and the learned
    word->segment table is itself memoized per (session, corpus,
    n_merges) like the NB model: train the tokenizer once, apply it
    everywhere. The apply is the TF table equi-joined against the
    vocabulary-sized segment table (broadcasts under AQE here; rides a
    bucketed vocab table at 100 TB), with per-language token totals as
    tf-weighted sums. Integer milli-ratio keeps the output
    engine-exact.
    """
    tfl = _corpus_tf(spark, sf_dir)
    key = (spark.sparkContext.applicationId, sf_dir, BPE_MERGES)
    seg = _BPE_SEG_MEMO.get(key)
    if seg is None:
        words = tfl.groupBy(F.col("term").alias("word")).agg(
            F.sum("tf").alias("wc")
        )
        seg = (
            bpe_segment_words(words, n_merges=BPE_MERGES)
            .select(
                F.col("word").alias("term"),
                F.size(F.split("seg", " ")).alias("n_sub"),
            )
            .localCheckpoint(eager=True)  # bounded: vocabulary-sized
        )
        _BPE_SEG_MEMO[key] = seg
    return (
        tfl.join(seg, "term")
        .groupBy("lang")
        .agg(
            F.sum("tf").alias("n_words"),
            F.sum(F.col("tf") * F.col("n_sub")).alias("n_subwords"),
        )
        .select(
            "lang",
            "n_words",
            F.col("n_subwords").cast("bigint").alias("n_subwords"),
            F.expr("(CAST(n_subwords AS BIGINT) * 1000) div n_words").alias(
                "compression_milli"
            ),
        )
        .orderBy("lang")
    )


TEXT_BPE_APPLY_ORACLE = (
    f"WITH {_TOKS_CTE},\n{_bpe_ctes(BPE_MERGES)},\n"
    f"sub AS (SELECT word, len(s) AS n_sub FROM s{BPE_MERGES}),\n"
    "tokl AS (SELECT lang, unnest(t) AS word FROM toks)\n"
    "SELECT lang, COUNT(*) AS n_words,\n"
    "       CAST(SUM(n_sub) AS BIGINT) AS n_subwords,\n"
    "       (CAST(SUM(n_sub) AS BIGINT) * 1000) // COUNT(*)\n"
    "           AS compression_milli\n"
    "FROM tokl JOIN sub USING (word)\n"
    "GROUP BY lang ORDER BY lang"
)


# --- feature hashing (HashingTF) ---------------------------------------

HASHTF_DIM = 1024


def text_hashing_tf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Feature hashing (the HashingTF / Vowpal-Wabbit trick): each term
    maps to ``md5(term) % 1024`` and the document's sparse feature
    vector is the per-bucket term count — the vectorizer a 100 TB text
    pipeline uses when a fitted vocabulary is too big to broadcast
    (no vocab table AT ALL: the "model" is a hash function, so the op
    is one explode + one map-side-combinable groupBy, embarrassingly
    parallel and identical across engines via the portable hash).
    Output is the sparse COO triple ``(doc_id, bucket, tf)``."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _doc_tokens(docs)
        .select("doc_id", (md5_long("term") % HASHTF_DIM).alias("bucket"))
        .groupBy("doc_id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy("doc_id", "bucket")
    )


TEXT_HASHTF_ORACLE = rf"""
WITH {_TOKS_CTE},
terms AS (SELECT doc_id, unnest(t) AS term FROM toks)
SELECT doc_id,
       {duckdb_md5_long("term")} % {HASHTF_DIM} AS bucket,
       COUNT(*) AS tf
FROM terms
GROUP BY doc_id, bucket
ORDER BY doc_id, bucket
"""


# --- LM-Dirichlet ranked retrieval --------------------------------------

LMD_MU = 2000  # Dirichlet prior mass (Zhai & Lafferty's standard default)
LMD_QUERIES_SKIP = 8  # df ranks 9..16: a disjoint workload from BM25's top-8
LMD_QUERIES = 8
LMD_TOPK = 10


def text_lm_dirichlet_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Query-likelihood retrieval with Dirichlet smoothing (Zhai &
    Lafferty 2001), mu={LMD_MU} — the language-modeling alternative to
    BM25's tf-saturation family; the smoothed term likelihood

        p(t|d) = (tf + mu * cf/T) / (dl + mu)

    interpolates the document's ML estimate with the collection model,
    so long documents aren't over-penalized and unseen-term mass is
    principled. Query workload: the terms at df ranks 9..16 (ties on
    term asc) — DISJOINT from BM25's top-8 by construction, so the two
    retrieval entries exercise different posting lists. Candidates are
    the docs CONTAINING the query term — BY DEFINITION of this entry,
    not as a provably lossless pruning: under Dirichlet smoothing the
    background-only score mu*cf/((dl+mu)*T) still varies with document
    length, so a short non-containing doc CAN outrank a long containing
    one; both the Spark plan and the oracle apply the same containment
    restriction, and that restricted top-k is what the hash certifies
    (it is also what a posting-list index serves in practice).

    Exactness: multiplying through by T makes the score the integer
    rational (tf*T + mu*cf) / ((dl + mu)*T); each engine computes ONE
    double multiply by 10^6 and ONE division over those exact int64s
    (num <= ~1e10, den <= ~1e11 — exact in doubles to 2^53), rounded
    to 6dp — bit-identical, the BM25 recipe.

    Scale shape: identical to BM25 — the bounded query-term frame
    (8 rows) broadcast against the session-memoized TF artifact
    (:func:`_corpus_tf`); scored stream = postings of 8 terms;
    per-term top-k window over that bounded stream.
    """
    tfl = _corpus_tf(spark, sf_dir)
    dl = tfl.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    tot = dl.agg(F.sum("dl").alias("t"))
    stats = tfl.groupBy("term").agg(
        F.count(F.lit(1)).alias("df"), F.sum("tf").alias("cf")
    )
    ranked = (
        stats.orderBy(F.col("df").desc(), "term")
        .limit(LMD_QUERIES_SKIP + LMD_QUERIES)
        .withColumn(
            "rk",
            F.row_number().over(
                Window.orderBy(F.col("df").desc(), "term")
            ),
        )
        .where(F.col("rk") > LMD_QUERIES_SKIP)
    )
    qterms = ranked.crossJoin(F.broadcast(tot)).select("term", "cf", "t")
    scored = (
        tfl.select("doc_id", "term", "tf")
        .join(F.broadcast(qterms), "term")
        .join(dl, "doc_id")
        .select(
            "term",
            "doc_id",
            F.round(
                (
                    F.col("tf") * F.col("t") + F.lit(LMD_MU) * F.col("cf")
                ).cast("double")
                * 1_000_000
                / ((F.col("dl") + F.lit(LMD_MU)) * F.col("t")).cast("double"),
                6,
            ).alias("score_micro"),
        )
    )
    w = Window.partitionBy("term").orderBy(
        F.col("score_micro").desc(), F.col("doc_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= LMD_TOPK)
        .select("term", "rank", "doc_id", "score_micro")
        .orderBy("term", "rank")
    )


TEXT_LMD_ORACLE = rf"""
WITH {_TOKS_CTE},
tok AS (SELECT doc_id, unnest(t) AS term FROM toks),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term),
dl AS (SELECT doc_id, SUM(tf) AS dl FROM tf GROUP BY doc_id),
tot AS (SELECT SUM(dl) AS t FROM dl),
stats AS (SELECT term, COUNT(*) AS df, SUM(tf) AS cf
          FROM tf GROUP BY term),
ranked AS (
  SELECT term, cf,
         row_number() OVER (ORDER BY df DESC, term) AS rk
  FROM stats
),
qterms AS (
  SELECT term, cf, t FROM ranked CROSS JOIN tot
  WHERE rk > {LMD_QUERIES_SKIP} AND rk <= {LMD_QUERIES_SKIP + LMD_QUERIES}
),
scored AS (
  SELECT q.term, tf.doc_id,
         ROUND(CAST(tf.tf * q.t + {LMD_MU} * q.cf AS DOUBLE) * 1000000
               / CAST((dl.dl + {LMD_MU}) * q.t AS DOUBLE), 6) AS score_micro
  FROM tf JOIN qterms q USING (term) JOIN dl USING (doc_id)
)
SELECT term, rank, doc_id, score_micro FROM (
  SELECT *, row_number() OVER (PARTITION BY term
                               ORDER BY score_micro DESC, doc_id) AS rank
  FROM scored
) WHERE rank <= {LMD_TOPK} ORDER BY term, rank
"""
