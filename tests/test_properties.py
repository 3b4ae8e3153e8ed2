"""Property-based checks (SURVEY.md §5.3) over the engine's core
invariants. Hypothesis drives the generators; each property runs
against real Spark plans on small literal frames, so a failure is a
genuine semantics bug, not a fixture artifact.

Properties:
- flatten is lossless: unflatten(flatten(df)) reproduces every leaf
  value, for arbitrary nested structs;
- align_to_schema is idempotent and always emits the target shape;
- word shingling: count == max(0, tokens - n + 1) before dedup, every
  shingle has exactly n tokens, and shingling is insensitive to
  whitespace runs;
- Jaccard is symmetric, bounded in [0, 1], and 1.0 on self-pairs;
- the watermark filter and half-open range partition rows exactly.
"""

from __future__ import annotations

import datetime as dt
import re

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from personal_health_etl_pipeline_spark.functions.flatten import (
    flatten,
    unflatten_expr_map,
)
from personal_health_etl_pipeline_spark.functions.text import tokens, word_shingles
from personal_health_etl_pipeline_spark.operators.dedup import jaccard
from personal_health_etl_pipeline_spark.operators.incremental import half_open_range
from personal_health_etl_pipeline_spark.schema import align_to_schema

# Hypothesis x Spark: keep example counts small — each example is a job
PROP = settings(max_examples=15, deadline=None)

_leaf = st.one_of(
    st.integers(min_value=-(2**31), max_value=2**31),
    st.text(alphabet="abcxyz ", max_size=8),
    st.none(),
)


@st.composite
def nested_record(draw, depth=2):
    """A dict of leaves and sub-dicts, at most ``depth`` levels."""
    n = draw(st.integers(min_value=1, max_value=3))
    out = {}
    for i in range(n):
        if depth > 0 and draw(st.booleans()):
            out[f"s{i}"] = draw(nested_record(depth=depth - 1))
        else:
            out[f"f{i}"] = draw(_leaf)
    return out


def _spark_type(v):
    if isinstance(v, bool) or isinstance(v, int) or v is None:
        return LongType()
    if isinstance(v, str):
        return StringType()
    if isinstance(v, dict):
        return StructType(
            [StructField(k, _spark_type(x), True) for k, x in v.items()]
        )
    return DoubleType()


def _leaves(prefix, v, sep="__"):
    if isinstance(v, dict):
        for k, x in v.items():
            yield from _leaves(f"{prefix}{sep}{k}" if prefix else k, x, sep)
    else:
        yield prefix, v


class TestFlattenLossless:
    @PROP
    @given(rec=nested_record())
    def test_flatten_preserves_every_leaf(self, spark, rec):
        schema = _spark_type(rec)
        df = spark.createDataFrame([rec], schema)
        flat = flatten(df)
        row = flat.first().asDict()
        expect = dict(_leaves("", rec))
        assert row == expect
        # and the expr map inverts the naming
        mapping = unflatten_expr_map(schema)
        assert set(mapping.keys()) == set(expect.keys())


class TestAlignIdempotent:
    @PROP
    @given(
        present=st.sets(st.sampled_from(["a", "b", "c", "d"]), min_size=1),
    )
    def test_align_fills_and_orders(self, spark, present):
        target = StructType(
            [StructField(c, LongType(), True) for c in ("a", "b", "c", "d")]
        )
        df = spark.createDataFrame(
            [tuple(1 for _ in present)],
            StructType([StructField(c, LongType(), True) for c in sorted(present)]),
        )
        once = align_to_schema(df, target, strict_extra=False)
        twice = align_to_schema(once, target, strict_extra=False)
        assert once.columns == ["a", "b", "c", "d"] == twice.columns
        assert once.collect() == twice.collect()


class TestShingleProperties:
    @PROP
    @given(words=st.lists(st.text(alphabet="abc", min_size=1, max_size=4), max_size=12))
    def test_count_and_arity(self, spark, words):
        text = "  ".join(words)  # double spaces: tokenizer must collapse
        df = spark.createDataFrame([(text,)], "text string")
        row = df.select(
            F.size(tokens("text")).alias("n_tok"),
            word_shingles(tokens("text"), 3).alias("sh"),
        ).first()
        assert row.n_tok == len(words)
        assert len(row.sh) == max(0, len(words) - 2)
        for s in row.sh:
            assert len(re.split(r" ", s)) == 3


class TestJaccardProperties:
    @PROP
    @given(
        a=st.sets(st.integers(min_value=0, max_value=20), min_size=1, max_size=8),
        b=st.sets(st.integers(min_value=0, max_value=20), min_size=1, max_size=8),
    )
    def test_symmetric_bounded_reflexive(self, spark, a, b):
        df = spark.createDataFrame(
            [(sorted(a), sorted(b))], "a array<int>, b array<int>"
        )
        row = df.select(
            jaccard(F.col("a"), F.col("b")).alias("ab"),
            jaccard(F.col("b"), F.col("a")).alias("ba"),
            jaccard(F.col("a"), F.col("a")).alias("aa"),
        ).first()
        assert row.ab == row.ba
        assert 0.0 <= row.ab <= 1.0
        assert row.aa == 1.0
        if a == b:
            assert row.ab == 1.0


class TestRangePartition:
    @PROP
    @given(
        days=st.lists(
            st.dates(dt.date(2024, 1, 1), dt.date(2024, 3, 1)),
            min_size=1,
            max_size=20,
        ),
        lo=st.dates(dt.date(2024, 1, 10), dt.date(2024, 2, 1)),
        span=st.integers(min_value=0, max_value=30),
    )
    def test_half_open_range_is_exact_partition(self, spark, days, lo, span):
        hi = lo + dt.timedelta(days=span)
        df = spark.createDataFrame([(d,) for d in days], "day date")
        inside = df.where(half_open_range("day", lo, hi)).collect()
        outside = df.where(~half_open_range("day", lo, hi)).collect()
        assert len(inside) + len(outside) == len(days)
        assert all(lo <= r.day < hi for r in inside)
        assert all(not (lo <= r.day < hi) for r in outside)


class TestChunkingCoverage:
    @PROP
    @given(
        lens=st.lists(st.integers(min_value=1, max_value=200), min_size=1, max_size=6)
    )
    def test_windows_tile_any_token_count(self, spark, lens):
        """For arbitrary document lengths, the chunk windows must tile
        the token stream exactly: starts at i*STRIDE, sizes
        min(CHUNK, n - start), last window reaches the end, and no
        window is empty or starts past the end."""
        from personal_health_etl_pipeline_spark.plans.llm_surface2 import (
            CHUNK_STRIDE,
            CHUNK_TOKENS,
            chunk_documents,
        )

        docs = spark.createDataFrame(
            [(i, " ".join(f"t{j}" for j in range(n))) for i, n in enumerate(lens)],
            "doc_id long, text string",
        )
        rows = chunk_documents(docs).collect()
        by_doc = {}
        for r in rows:
            by_doc.setdefault(r.doc_id, []).append(r)
        assert set(by_doc) == set(range(len(lens)))
        for doc_id, n in enumerate(lens):
            chunks = sorted(by_doc[doc_id], key=lambda r: r.chunk_id)
            for i, r in enumerate(chunks):
                assert r.chunk_id == i
                assert r.chunk_start == i * CHUNK_STRIDE
                assert r.n_tok == min(CHUNK_TOKENS, n - r.chunk_start) >= 1
            assert chunks[-1].chunk_start + chunks[-1].n_tok == n
            if len(chunks) > 1:
                assert chunks[-2].chunk_start + CHUNK_TOKENS < n


class TestSubstringCutProperties:
    @PROP
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(["aa", "bb", "cc", "dd"]),
                min_size=0,
                max_size=14,
            ),
            min_size=1,
            max_size=4,
        )
    )
    def test_cut_invariants(self, spark, docs):
        """For ANY corpus: every doc appears exactly once; tokens are
        conserved (n_tokens - n_cut == |cleaned|); the cleaned text is
        a subsequence of the original; cuts happen iff a cross-doc
        repeated window exists; and the minimum-doc_id owner of every
        duplicated window is never cut below a full copy."""
        from personal_health_etl_pipeline_spark.operators.substring import (
            cut_repeated_spans,
            repeated_spans,
        )

        frame = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id long, text string",
        )
        out = {r.doc_id: r for r in cut_repeated_spans(frame, window=3).collect()}
        spans = repeated_spans(frame, window=3).collect()

        nonempty = {i for i, toks in enumerate(docs) if toks}
        assert set(out) == nonempty  # one row per tokenizable doc
        for i in nonempty:
            r = out[i]
            cleaned = r.cleaned_text.split() if r.cleaned_text else []
            assert r.n_tokens == len(docs[i])
            assert r.n_tokens - r.n_cut == len(cleaned)
            # subsequence check
            it = iter(docs[i])
            assert all(any(t == x for x in it) for t in cleaned)
        total_cut = sum(r.n_cut for r in out.values())
        assert (total_cut > 0) == (len(spans) > 0)


class TestBfsHopsProperty:
    @PROP
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 12), st.integers(0, 12)),
            min_size=1,
            max_size=30,
        ),
        seeds=st.sets(st.integers(0, 12), min_size=1, max_size=3),
    )
    def test_matches_python_bfs(self, spark, edges, seeds):
        from personal_health_etl_pipeline_spark.operators.graph import bfs_hops

        max_hops = 4
        # pure-Python reference: level-synchronous BFS over the digraph
        adj: dict[int, set[int]] = {}
        for s, d in edges:
            adj.setdefault(s, set()).add(d)
        want = {n: 0 for n in seeds}
        frontier = set(seeds)
        for level in range(1, max_hops + 1):
            nxt = set()
            for n in frontier:
                nxt |= adj.get(n, set())
            nxt -= want.keys()
            if not nxt:
                break
            for n in nxt:
                want[n] = level
            frontier = nxt

        e = spark.createDataFrame(edges, "src long, dst long")
        sd = spark.createDataFrame([(s,) for s in seeds], "node long")
        got = {
            r.node: r.dist
            for r in bfs_hops(e, sd, max_hops=max_hops).collect()
        }
        assert got == want


class TestEwmaProperty:
    @PROP
    @given(
        vals=st.lists(
            st.integers(0, 10_000).map(lambda c: c / 100.0),
            min_size=1,
            max_size=30,
        )
    )
    def test_matches_python_horner_exactly(self, spark, vals, tmp_path_factory):
        """The engine's EWMA must equal the Python float computation
        BIT-FOR-BIT (that is the exactness claim the oracle hash rests
        on), including across the 20-row truncation boundary."""
        import datetime as dt

        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            EWMA_WINDOW,
            ewma_events,
        )

        root = str(tmp_path_factory.mktemp("ewma_prop"))
        rows = [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), 1, "view",
             v, "{}")
            for i, v in enumerate(vals)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(f"{root}/events.parquet")
        # the full operator form: the certified entry slices 1-in-7,
        # but the exactness property must hold at EVERY row
        got = {
            r.event_id: r.ewma_cents
            for r in ewma_events(spark, root).collect()
        }
        for t in range(len(vals)):
            lo = max(0, t - EWMA_WINDOW + 1)
            num = 0.0
            for i in range(lo, t + 1):  # oldest -> newest, Horner
                num = num / 2 + float(round(vals[i] * 100))
            n = t + 1 - lo
            wsum = 2.0 - 1.0 / (2.0 ** (n - 1))
            assert got[t] == num / wsum  # exact equality, no tolerance


class TestRankStatsProperties:
    """a30/a31 vs pure-Python references on adversarial tie-heavy
    samples — the catalog oracle certifies one corpus; these certify
    the FORMULAS (midrank ties, scaled KS sup) on arbitrary data."""

    @PROP
    @given(
        a=st.lists(st.integers(0, 6), min_size=2, max_size=25),
        b=st.lists(st.integers(0, 6), min_size=2, max_size=25),
    )
    def test_mwu_matches_python_midranks(self, spark, a, b):
        from personal_health_etl_pipeline_spark.plans.stats_surface import (
            a31_mannwhitney_u,
        )
        import tempfile

        rows = [(i, dt.datetime(2024, 1, 1), 0, "purchase", v / 100.0, "{}")
                for i, v in enumerate(a)]
        rows += [(1000 + i, dt.datetime(2024, 1, 1), 0, "view", v / 100.0,
                  "{}") for i, v in enumerate(b)]
        import shutil

        root = tempfile.mkdtemp(prefix="mwu_prop_")
        try:
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long,"
                " event_type string, value double, props string",
            ).write.mode("overwrite").parquet(f"{root}/events.parquet")
            [r] = [
                r for r in a31_mannwhitney_u(spark, root).collect()
                if r.cohort == 0
            ]
        finally:
            shutil.rmtree(root, ignore_errors=True)
        # pure-Python midrank U, doubled
        pooled = sorted(a + b)
        def rank2(v):  # 2 * average rank of value v in the pooled sample
            lo = sum(1 for x in pooled if x < v)
            eq = sum(1 for x in pooled if x == v)
            return 2 * lo + eq + 1
        r2a = sum(rank2(v) for v in a)
        u2a = r2a - len(a) * (len(a) + 1)
        assert r.r2_a == r2a
        assert r.u2_a == u2a
        assert r.u2_a + r.u2_b == 2 * len(a) * len(b)
        assert r.identity_ok

    @PROP
    @given(
        a=st.lists(st.integers(0, 6), min_size=1, max_size=25),
        b=st.lists(st.integers(0, 6), min_size=1, max_size=25),
    )
    def test_ks_matches_python_sup(self, spark, a, b):
        from personal_health_etl_pipeline_spark.plans.stats_surface import (
            a30_ks_statistic,
        )
        import tempfile

        rows = [(i, dt.datetime(2024, 1, 1), 0, "purchase", v / 100.0, "{}")
                for i, v in enumerate(a)]
        rows += [(1000 + i, dt.datetime(2024, 1, 1), 0, "view", v / 100.0,
                  "{}") for i, v in enumerate(b)]
        import shutil

        root = tempfile.mkdtemp(prefix="ks_prop_")
        try:
            spark.createDataFrame(
                rows,
                "event_id long, ts timestamp, user_id long,"
                " event_type string, value double, props string",
            ).write.mode("overwrite").parquet(f"{root}/events.parquet")
            [r] = [
                r for r in a30_ks_statistic(spark, root).collect()
                if r.cohort == 0
            ]
        finally:
            shutil.rmtree(root, ignore_errors=True)
        na, nb = len(a), len(b)
        want = max(
            abs(sum(1 for x in a if x <= v) * nb
                - sum(1 for x in b if x <= v) * na)
            for v in set(a + b)
        )
        assert (r.n_a, r.n_b, r.d_scaled) == (na, nb, want)


class TestApproxPercentileConvention:
    @PROP
    @given(
        vals=st.lists(st.integers(0, 40), min_size=30, max_size=64),
    )
    def test_exact_regime_matches_sorted_index(
        self, spark, vals, tmp_path_factory
    ):
        """a33's certified claim, as a property: in the exact regime
        (frame n=30 <= accuracy) ``percentile_approx`` over a trailing
        frame equals sorted_frame[ceil(p*30) - 1] for every emitted
        full frame — including heavy ties (values drawn from 0..40,
        so a 30-frame always has collisions)."""
        import datetime as dt
        import math

        from personal_health_etl_pipeline_spark.plans.stats_surface import (
            APCTL_FRAME,
            APCTL_PS,
            a33_approx_percentile_window,
        )

        root = str(tmp_path_factory.mktemp("apctl_prop"))
        rows = [
            (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i), 1,
             "view", v / 100.0, "{}")
            for i, v in enumerate(vals)
        ]
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(f"{root}/events.parquet")
        got = {
            r.event_id: (r.p25_cents, r.p50_cents, r.p90_cents)
            for r in a33_approx_percentile_window(spark, root).collect()
        }
        for t in range(len(vals)):
            if t + 1 < APCTL_FRAME or t % 5 != 0:
                continue  # entry emits full frames on the 1-in-5 slice
            frame = sorted(vals[t - APCTL_FRAME + 1 : t + 1])
            want = tuple(
                frame[math.ceil(p * APCTL_FRAME) - 1] for p in APCTL_PS
            )
            assert got[t] == want
        emitted = {
            t for t in range(len(vals))
            if t + 1 >= APCTL_FRAME and t % 5 == 0
        }
        assert set(got) == emitted

    @PROP
    @given(
        vals=st.lists(st.integers(0, 40), min_size=5, max_size=48),
    )
    def test_approx_percentile_full_matches_sorted_frame(self, spark, vals):
        """ADVICE-r9 convention: the UNSLICED production twin
        (approx_percentile_windows_full) is pinned over EVERY emitted
        row — full frames only, sorted_frame[ceil(p*n) - 1] per
        percentile — so the 1-in-5 certified slice of a33 never leaves
        uncovered rows."""
        import datetime as dt
        import math

        from personal_health_etl_pipeline_spark.plans.stats_surface import (
            approx_percentile_windows_full,
        )

        n = 5  # small frame: exact regime (n <= accuracy) at low cost
        ps = (0.25, 0.5, 0.9)
        ev = spark.createDataFrame(
            [
                (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=i),
                 1, v)
                for i, v in enumerate(vals)
            ],
            "event_id long, ts timestamp, user_id long, cents long",
        )
        out = approx_percentile_windows_full(ev, frame_rows=n, ps=ps)
        got = {
            r.event_id: (r.p25_cents, r.p50_cents, r.p90_cents)
            for r in out.collect()
        }
        want = {}
        for t in range(n - 1, len(vals)):
            frame = sorted(vals[t - n + 1 : t + 1])
            want[t] = tuple(frame[math.ceil(p * n) - 1] for p in ps)
        assert got == want


class TestSessionizedFunnelProperty:
    @PROP
    @given(
        steps=st.lists(
            st.tuples(
                st.sampled_from([1, 10, 300, 2000]),  # 2000s > 30-min gap
                st.sampled_from(["view", "click", "purchase", "other"]),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def test_matches_python_simulation(self, spark, steps, tmp_path_factory):
        """w13 against a transparent simulation: gap-sessionize, then
        per-session strictly-ordered funnel, then the per-stage
        rollup — random event streams incl. pre-view clicks, re-entry
        and cross-gap sequences."""
        import datetime as dt

        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            w13_sessionized_funnel,
        )

        t, rows, stream = 0, [], []
        for i, (gap, etype) in enumerate(steps):
            t += gap
            rows.append(
                (i, dt.datetime(2024, 1, 1) + dt.timedelta(seconds=t), 1,
                 etype, 1.0, "{}")
            )
            stream.append((t * 1_000_000, etype))

        # python reference
        sessions, cur = [], [stream[0]]
        for prev, nxt in zip(stream, stream[1:]):
            if nxt[0] - prev[0] > 30 * 60 * 1_000_000:
                sessions.append(cur)
                cur = []
            cur.append(nxt)
        sessions.append(cur)
        agg: dict = {}
        for sess in sessions:
            t1 = min((us for us, e in sess if e == "view"), default=None)
            if t1 is None:
                continue
            t2 = min(
                (us for us, e in sess if e == "click" and us > t1),
                default=None,
            )
            t3 = None
            if t2 is not None:
                t3 = min(
                    (us for us, e in sess if e == "purchase" and us > t2),
                    default=None,
                )
            stage = 1 + (t2 is not None) + (t3 is not None)
            a = agg.setdefault(stage, [0, 0, 0, False, False])
            a[0] += 1
            if t2 is not None:
                a[1] += t2 - t1
                a[3] = True
            if t3 is not None:
                a[2] += t3 - t1
                a[4] = True

        root = str(tmp_path_factory.mktemp("w13_prop"))
        spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, event_type string,"
            " value double, props string",
        ).write.mode("overwrite").parquet(f"{root}/events.parquet")
        got = {
            r.stage_reached: r
            for r in w13_sessionized_funnel(spark, root).collect()
        }
        assert set(got) == set(agg)
        for stage, (n, lat2, lat3, has2, has3) in agg.items():
            r = got[stage]
            assert r.n_sessions == n
            assert r.n_users == 1
            assert r.sum_lat2_us == (lat2 if has2 else None)
            assert r.sum_lat3_us == (lat3 if has3 else None)


class TestCappedNgramJaccardProperty:
    """The r11 capped filter-verify redesign's exact characterization
    (operators/dedup.py:ngram_jaccard_pairs): against the uncapped
    ground truth U, the capped output must equal EXACTLY

        { pair in U : the pair shares >= 1 rare shingle }

    with bit-identical (4-decimal-rounded) scores. This pins all three
    capped-path claims at once across arbitrary corpora: the df-capped
    index only ever drops pairs whose every shared shingle is hot (the
    documented loss case), the upper-bound prune is LOSSLESS (a
    too-tight bound would drop a reachable pair and break equality),
    and the exact re-verify never changes a score (a rare-only score
    would differ from U's full-set score). The planted-corpus test in
    test_llm_operators.py covers the designed case; this drives the
    space — all-hot corpora (index empties), boundary Jaccards at the
    rounding edge, single-token overlaps, identical docs."""

    @PROP
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(
                    "alpha beta gamma delta eps zeta eta theta".split()
                ),
                min_size=3,
                max_size=9,
            ),
            min_size=4,
            max_size=12,
        ),
        max_df=st.integers(min_value=1, max_value=5),
        threshold=st.sampled_from([0.25, 0.5, 0.8]),
    )
    def test_capped_equals_uncapped_restricted_to_rare_sharing(
        self, spark, docs, max_df, threshold
    ):
        from personal_health_etl_pipeline_spark.functions.text import (
            distinct_shingles,
        )
        from personal_health_etl_pipeline_spark.operators.dedup import (
            ngram_jaccard_pairs,
        )

        frame = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id long, text string",
        )
        uncapped = {
            (r.id_a, r.id_b): r.jaccard_sim
            for r in ngram_jaccard_pairs(
                frame, "doc_id", "text", threshold=threshold
            ).collect()
        }
        capped = {
            (r.id_a, r.id_b): r.jaccard_sim
            for r in ngram_jaccard_pairs(
                frame, "doc_id", "text", threshold=threshold, max_df=max_df
            ).collect()
        }
        # ground-truth shingle sets from the engine's own shingler, so
        # the python-side df/rarity math can't drift from the operator
        sh = {
            r.doc_id: set(r.sh)
            for r in frame.select(
                "doc_id", distinct_shingles("text", 3).alias("sh")
            ).collect()
        }
        df_count: dict[str, int] = {}
        for toks in sh.values():
            for t in toks:
                df_count[t] = df_count.get(t, 0) + 1
        expected = {
            pair: score
            for pair, score in uncapped.items()
            if any(
                df_count[t] <= max_df
                for t in sh[pair[0]] & sh[pair[1]]
            )
        }
        assert capped == expected


class TestMinhashPrecisionProperty:
    """MinHash banding is probabilistic in RECALL only: the exact-
    Jaccard verify stage must make every emitted pair exactly correct.
    Against the uncapped inverted-index ground truth U, for arbitrary
    corpora: minhash output ⊆ U, with bit-identical 4-decimal scores
    (a pair emitted by a colliding band but scoring under threshold —
    or scoring differently than the full-set Jaccard — would break
    subset equality on the (id_a, id_b, score) triple). Complements
    TestCappedNgramJaccardProperty, which pins the capped path."""

    @PROP
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(
                    "alpha beta gamma delta eps zeta eta theta".split()
                ),
                min_size=3,
                max_size=9,
            ),
            min_size=4,
            max_size=12,
        ),
        threshold=st.sampled_from([0.5, 0.8]),
    )
    def test_every_emitted_pair_is_exactly_true(
        self, spark, docs, threshold
    ):
        from personal_health_etl_pipeline_spark.operators.dedup import (
            minhash_lsh_pairs,
            ngram_jaccard_pairs,
        )

        frame = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id long, text string",
        )
        truth = {
            (r.id_a, r.id_b): r.jaccard_sim
            for r in ngram_jaccard_pairs(
                frame, "doc_id", "text", threshold=threshold
            ).collect()
        }
        got = {
            (r.id_a, r.id_b): r.jaccard_sim
            for r in minhash_lsh_pairs(
                frame, "doc_id", "text", threshold=threshold
            ).collect()
        }
        assert set(got) <= set(truth)
        for pair, score in got.items():
            assert score == truth[pair]
            assert score >= threshold


class TestSetsimPrefixExactness:
    """AllPairs/PPJoin prefix filtering claims ZERO false negatives —
    a completeness guarantee (unlike LSH recall), so the property is
    full EQUALITY with brute force, not subset: for arbitrary corpora
    and thresholds,

        setsim_prefix_pairs(docs)  ==  brute-force exact Jaccard

    as an (id_a, id_b) -> 4-decimal-score dict. Hypothesis drives the
    edges a planted corpus misses: docs too short to shingle (empty
    sets must never pair, not pair-with-everything), identical docs,
    exact-boundary Jaccards where the integer accept and the exact
    rational prefix ceil both matter (an IEEE ``0.8*n`` ceil is off by
    one exactly at multiples of 5), and thresholds at both extremes
    (1/1 keeps only identical sets; 1/3 makes prefixes long and the
    candidate set dense). Complements test_setsim.py's seeded
    neardup corpus with the generated space."""

    @PROP
    @given(
        docs=st.lists(
            st.lists(
                st.sampled_from(
                    "alpha beta gamma delta eps zeta eta theta".split()
                ),
                min_size=1,  # < shingle_n -> EMPTY set edge included
                max_size=9,
            ),
            min_size=2,
            max_size=10,
        ),
        threshold=st.sampled_from([(1, 3), (1, 2), (4, 5), (1, 1)]),
    )
    def test_equals_brute_force_for_arbitrary_corpora(
        self, spark, docs, threshold
    ):
        import itertools

        from personal_health_etl_pipeline_spark.operators.dedup import (
            setsim_prefix_pairs,
        )

        num, den = threshold
        n = 3
        sets = {}
        for i, toks in enumerate(docs):
            sh = {
                " ".join(toks[j : j + n])
                for j in range(len(toks) - n + 1)
            }
            if sh:
                sets[i] = sh
        truth = {}
        for a, b in itertools.combinations(sorted(sets), 2):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if den * inter >= num * union:
                truth[(a, b)] = round(inter / union, 4)

        frame = spark.createDataFrame(
            [(i, " ".join(toks)) for i, toks in enumerate(docs)],
            "doc_id long, text string",
        )
        got = {
            (r.id_a, r.id_b): r.jaccard_sim
            for r in setsim_prefix_pairs(
                frame,
                "doc_id",
                "text",
                shingle_n=n,
                threshold_num=num,
                threshold_den=den,
            ).collect()
        }
        assert got == truth


class TestConnectedComponentsProperty:
    """connected_components vs a Python union-find over arbitrary edge
    lists: the returned map must label EVERY node appearing in any
    edge with exactly the minimum node id of its component. The
    example tests in test_graph.py pin shapes (paths, chains, empty);
    this drives the space — duplicate edges, self-loops, reversed
    duplicates, edges landing on shared nodes in any order — where the
    large-star/small-star + pointer-jumping loop could in principle
    mislabel or lose a node."""

    @PROP
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=12),
                st.integers(min_value=0, max_value=12),
            ),
            min_size=1,
            max_size=20,
        )
    )
    def test_matches_python_union_find(self, spark, edges):
        from personal_health_etl_pipeline_spark.operators.graph import (
            connected_components,
        )

        parent = {}

        def find(x):
            while parent.setdefault(x, x) != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            parent[find(a)] = find(b)
        groups = {}
        for node in parent:
            groups.setdefault(find(node), set()).add(node)
        truth = {
            node: min(members)
            for members in groups.values()
            for node in members
        }

        frame = spark.createDataFrame(edges, "id_a long, id_b long")
        # driver_cap=0 keeps this property on the DISTRIBUTED loop (the
        # gated driver path IS a union-find — testing it against one
        # would be circular; its equality to the loop is pinned in
        # tests/test_graph.py)
        got = {
            r.node: r.component
            for r in connected_components(frame, driver_cap=0).collect()
        }
        assert got == truth


class TestWeightedMedianProperty:
    """a22's two-phase bucketed weighted median vs the direct Python
    definition — lower weighted median: the smallest price p with
    2 * sum(weight | price <= p) >= total weight, per flag. The
    bucketed composition (static price grid, exclusive bucket-prefix
    offsets, per-bucket cumulative windows) must be invisible: prices
    are drawn wide enough to span MULTIPLE 200k-cent buckets and
    tie-heavy enough that a tie group's internal row order could leak
    (only its END cumulative weight may decide membership). Zero
    weights and single-row groups ride along as edges."""

    @PROP
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["A", "N", "R"]),
                # dollars; x100 -> cents spans ~0..1.2e6 = many buckets,
                # coarse grid forces frequent exact price ties
                st.integers(min_value=0, max_value=12).map(
                    lambda k: k * 997.0
                ),
                st.integers(min_value=0, max_value=5).map(
                    float
                ),  # quantity/weight
            ),
            min_size=1,
            max_size=30,
        )
    )
    def test_matches_python_lower_weighted_median(self, spark, rows):
        import tempfile

        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            a22_weighted_median,
        )

        import shutil

        root = tempfile.mkdtemp(prefix="wmed_prop_")
        try:
            spark.createDataFrame(
                rows, "l_returnflag string, l_extendedprice double,"
                " l_quantity double",
            ).write.mode("overwrite").parquet(f"{root}/lineitem.parquet")

            truth = {}
            flags = {f for f, _, _ in rows}
            for flag in flags:
                grp = [
                    (round(p * 100), int(round(q)))
                    for f, p, q in rows
                    if f == flag
                ]
                tot = sum(w for _, w in grp)
                for price in sorted({p for p, _ in grp}):
                    cum = sum(w for p, w in grp if p <= price)
                    if 2 * cum >= tot:
                        truth[flag] = (price, tot)
                        break

            got = {
                r.l_returnflag: (r.wmedian_cents, r.total_weight)
                for r in a22_weighted_median(spark, root).collect()
            }
            assert got == truth
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestTrimmedMeanProperty:
    """a24's bucket-offset global ranks vs the direct definition: sort
    each flag's prices, drop floor(n/10) from each end, average the
    rest — the sum and count of kept rows must be EXACT integers and
    tie-order-invariant (ranks at the trim boundary can fall either
    side of the cut only among rows carrying the same price). Prices
    come from a coarse tied grid spanning multiple 200k-cent buckets
    so the two-phase offsets, the in-bucket row_number, and boundary
    ties are all exercised; group sizes cross the n=10 and n=20 trim
    steps."""

    @PROP
    @given(
        rows=st.lists(
            st.tuples(
                st.sampled_from(["A", "N"]),
                st.integers(min_value=0, max_value=12).map(
                    lambda k: k * 997.0
                ),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def test_matches_python_sorted_trim(self, spark, rows):
        import tempfile

        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            a24_trimmed_mean,
        )

        import shutil

        root = tempfile.mkdtemp(prefix="trim_prop_")
        try:
            spark.createDataFrame(
                [
                    (flag, float(price), i + 1, 1)
                    for i, (flag, price) in enumerate(rows)
                ],
                "l_returnflag string, l_extendedprice double,"
                " l_orderkey long, l_linenumber int",
            ).write.mode("overwrite").parquet(f"{root}/lineitem.parquet")

            truth = {}
            for flag in {f for f, _ in rows}:
                prices = sorted(
                    round(p * 100) for f, p in rows if f == flag
                )
                n = len(prices)
                lo = n // 10
                kept = prices[lo : n - lo]
                truth[flag] = (
                    n,
                    lo,
                    len(kept),
                    sum(kept),
                    sum(kept) / len(kept),
                )

            got = {
                r.l_returnflag: (
                    r.n_total,
                    r.n_trimmed_each_side,
                    r.n_kept,
                    r.sum_kept_cents,
                    r.trimmed_mean_cents,
                )
                for r in a24_trimmed_mean(spark, root).collect()
            }
            assert got == truth
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestIntervalConcurrencyProperty:
    """w9's one-scan sweep-line vs a direct Python replay of its
    declared semantics: every event opens [ts, ts+30m); intervals are
    clipped at midnight (a crossing session closes at day end and
    re-opens at 00:00 next day — an end EXACTLY at midnight re-opens
    and closes at the same instant, net zero); boundaries order by
    (ts, delta) so a close at t never overlaps an open at t; the
    running count uses RANGE-frame peer groups (all equal (ts, delta)
    rows share one cumulative). Timestamps are drawn on a 10-minute
    grid across two days, dense around midnight, so exact 30-minute
    adjacency ties, same-instant opens, and midnight crossers all
    occur."""

    @PROP
    @given(
        mins=st.lists(
            st.one_of(
                st.integers(min_value=0, max_value=288).map(lambda k: k * 10),
                # dense band around the first midnight (1440)
                st.integers(min_value=138, max_value=150).map(
                    lambda k: k * 10
                ),
            ),
            min_size=1,
            max_size=25,
        )
    )
    def test_matches_python_sweep_line(self, spark, mins):
        import tempfile
        from collections import defaultdict

        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            w9_interval_concurrency,
        )

        base = dt.datetime(2024, 1, 1)
        stamps = [base + dt.timedelta(minutes=m) for m in mins]
        import shutil

        root = tempfile.mkdtemp(prefix="w9_prop_")
        try:
            self._check(spark, root, stamps)
        finally:
            shutil.rmtree(root, ignore_errors=True)

    @staticmethod
    def _check(spark, root, stamps):
        from collections import defaultdict

        from personal_health_etl_pipeline_spark.plans.analytics_surface import (
            w9_interval_concurrency,
        )

        spark.createDataFrame(
            [(i, ts) for i, ts in enumerate(stamps)],
            "event_id long, ts timestamp",
        ).write.mode("overwrite").parquet(f"{root}/events.parquet")

        # replay the four boundary branches exactly
        bounds = defaultdict(list)  # day -> [(bts, delta, is_start)]
        for ts in stamps:
            end = ts + dt.timedelta(minutes=30)
            d1 = ts.date()
            day_end = dt.datetime.combine(
                d1 + dt.timedelta(days=1), dt.time()
            )
            bounds[d1].append((ts, 1, 1))
            bounds[d1].append((min(end, day_end), -1, 0))
            if end.date() > d1:
                reopen = dt.datetime.combine(end.date(), dt.time())
                bounds[end.date()].append((reopen, 1, 0))
                bounds[end.date()].append((end, -1, 0))
        truth = {}
        for day, rows in bounds.items():
            # RANGE-frame peer groups: cumulative through each whole
            # (bts, delta) group; -1 sorts before +1 at equal bts
            groups = defaultdict(int)
            for bts, delta, _ in rows:
                groups[(bts, delta)] += delta
            cum, peak = 0, None
            for key in sorted(groups):
                cum += groups[key]
                peak = cum if peak is None else max(peak, cum)
            truth[day] = (peak, sum(s for _, _, s in rows))

        got = {
            r.day: (r.max_concurrent, r.n_starts)
            for r in w9_interval_concurrency(spark, root).collect()
        }
        assert got == truth


class TestDecileBucketsProperty:
    """a14's sample-cut bucketization vs a direct Python replay of its
    declared recipe (VERDICT-r13 item 6): take the BUCKET_SAMPLE
    hash-smallest rows, rank them by (value, hash), pick the fixed
    rank positions ``(d*(m-1))//10 + 1`` as cuts, and assign every row
    bucket = #cuts <= value + 1. BUCKET_SAMPLE is shrunk to 16 for the
    property so corpora of <= 40 rows exercise BOTH regimes the sf
    fixtures cannot hit together: n > m (the hash-sample truncation
    actually drops rows) and n < max(rank) (some rank positions match
    nothing and the cut list is short). Values come from a coarse tied
    grid so duplicate cuts and boundary ties occur; integer-dollar
    values keep the cents sums exact doubles."""

    @PROP
    @given(
        vals=st.lists(
            st.integers(min_value=0, max_value=12).map(lambda k: k * 997.0),
            min_size=1,
            max_size=40,
        )
    )
    def test_matches_python_sample_cuts(self, spark, vals):
        import hashlib
        import shutil
        import tempfile

        from personal_health_etl_pipeline_spark.plans import (
            analytics_surface as AS,
        )

        def h(key: int) -> int:
            return int(
                hashlib.md5(str(key).encode()).hexdigest()[:15], 16
            )

        root = tempfile.mkdtemp(prefix="decile_prop_")
        old_m = AS.BUCKET_SAMPLE
        AS.BUCKET_SAMPLE = 16
        try:
            rows = [(i + 1, float(v)) for i, v in enumerate(vals)]
            spark.createDataFrame(
                rows, "o_orderkey long, o_totalprice double"
            ).write.mode("overwrite").parquet(f"{root}/orders.parquet")

            m = 16
            hashed = [(v, h(k)) for k, v in rows]
            assert len({hh for _, hh in hashed}) == len(hashed)
            sample = sorted(hashed, key=lambda t: t[1])[:m]
            ranked = sorted(sample)  # (value, h) total order
            ranks = {(d * (m - 1)) // AS.BUCKET_N + 1 for d in range(1, AS.BUCKET_N)}
            cuts = sorted(
                v for rn, (v, _) in enumerate(ranked, start=1) if rn in ranks
            )
            truth = {}
            for _, v in rows:
                b = sum(1 for c in cuts if c <= v) + 1
                n, s, lo, hi = truth.get(b, (0, 0, None, None))
                truth[b] = (
                    n + 1,
                    s + round(v * 100),
                    v if lo is None else min(lo, v),
                    v if hi is None else max(hi, v),
                )
            truth = {
                b: (n, round(s / 100, 2), lo, hi)
                for b, (n, s, lo, hi) in truth.items()
            }

            got = {
                r.bucket: (
                    r.n_orders,
                    float(r.sum_price),
                    r.min_price,
                    r.max_price,
                )
                for r in AS.a14_decile_buckets(spark, root).collect()
            }
            assert got == truth
        finally:
            AS.BUCKET_SAMPLE = old_m
            shutil.rmtree(root, ignore_errors=True)


class TestMovingMedianProperty:
    """ts6's sorted-frame trailing median vs the direct definition
    (VERDICT-r13 item 6): per user, order by (ts, event_id), take the
    last <= 9 values, sort them, and return the middle element (odd
    count) or the exact midpoint of the two middle elements (even
    count). Timestamps come from a tiny grid so equal-ts rows force
    the event_id tiebreak; values are exact quarter-dollars so cents
    and midpoints are exact. Group sizes straddle the window length 9
    (shorter, equal, and longer-than-frame histories all occur)."""

    @PROP
    @given(
        rows=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=1),  # user_id
                st.integers(min_value=0, max_value=3),  # ts grid (ties!)
                st.integers(min_value=0, max_value=8).map(
                    lambda k: k * 0.25
                ),  # value
            ),
            min_size=1,
            max_size=24,
        )
    )
    def test_matches_python_trailing_median(self, spark, rows):
        import shutil
        import tempfile

        from personal_health_etl_pipeline_spark.plans.temporal_surface import (
            MOVMED_WINDOW,
            ts6_moving_median,
        )

        base = dt.datetime(2024, 1, 1)
        recs = [
            (i, u, base + dt.timedelta(hours=t), float(v))
            for i, (u, t, v) in enumerate(rows)
        ]
        root = tempfile.mkdtemp(prefix="movmed_prop_")
        try:
            spark.createDataFrame(
                recs, "event_id long, user_id long, ts timestamp,"
                " value double",
            ).write.mode("overwrite").parquet(f"{root}/events.parquet")

            truth = {}
            for uid in {u for _, u, _, _ in recs}:
                hist = sorted(
                    (ts, eid, round(v * 100))
                    for eid, u, ts, v in recs
                    if u == uid
                )
                for i, (_, eid, _) in enumerate(hist):
                    frame = sorted(
                        c
                        for _, _, c in hist[max(0, i - MOVMED_WINDOW + 1) : i + 1]
                    )
                    n = len(frame)
                    if n % 2 == 1:
                        med = float(frame[n // 2])
                    else:
                        med = (frame[n // 2 - 1] + frame[n // 2]) / 2.0
                    truth[eid] = (uid, med)

            got = {
                r.event_id: (r.user_id, r.med_cents)
                for r in ts6_moving_median(spark, root).collect()
            }
            assert got == truth
        finally:
            shutil.rmtree(root, ignore_errors=True)


class TestSsspBoundedProperty:
    """sssp_bounded vs the direct Python hop-bounded Bellman-Ford DP:
    after R synchronous rounds the table must hold, for every reachable
    node, EXACTLY the minimum total weight over paths of at most R
    edges from the seed set (seeds at 0, unreachable nodes absent).
    The catalog differential pins graph_sssp_weighted on the fixed
    corpus; this drives the space — parallel edges with different
    weights, self-loops, seeds with no out-edges, distances that
    improve in a late round — where the relax-then-fold loop could in
    principle drop a node or fold against the wrong round's table."""

    @PROP
    @given(
        edges=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=10),
                st.integers(min_value=0, max_value=10),
                st.integers(min_value=1, max_value=5),
            ),
            min_size=1,
            max_size=24,
        ),
        seeds=st.sets(st.integers(0, 10), min_size=1, max_size=3),
    )
    def test_matches_python_bellman_ford(self, spark, edges, seeds):
        from personal_health_etl_pipeline_spark.operators.graph import (
            sssp_bounded,
        )

        max_rounds = 3
        want = {s: 0 for s in seeds}
        for _ in range(max_rounds):
            prev = dict(want)
            for s, d, w in edges:
                if s in prev and prev[s] + w < want.get(d, float("inf")):
                    want[d] = prev[s] + w

        e = spark.createDataFrame(edges, "src long, dst long, w long")
        sd = spark.createDataFrame([(s,) for s in seeds], "node long")
        got = {
            r.node: r.dist
            for r in sssp_bounded(e, sd, max_rounds=max_rounds).collect()
        }
        assert got == want


class TestTriangleCountsProperty:
    """triangle_counts vs brute-force triangle enumeration: for every
    node in >= 1 triangle of the canonicalized undirected graph, the
    per-node participation count must match exactly (and no other node
    may appear). The degree-ordered orientation is the part under
    test: ties on (degree, id), duplicate and reversed input edges,
    and self-loops are exactly where a wrong orientation double-counts
    a wedge or loses a closing edge."""

    @PROP
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=25,
        )
    )
    def test_matches_bruteforce_enumeration(self, spark, edges):
        from itertools import combinations

        from personal_health_etl_pipeline_spark.operators.graph import (
            triangle_counts,
        )

        und = {(min(a, b), max(a, b)) for a, b in edges if a != b}
        nodes = sorted({n for e in und for n in e})
        want: dict[int, int] = {}
        for x, y, z in combinations(nodes, 3):
            if {(x, y), (x, z), (y, z)} <= und:
                for n in (x, y, z):
                    want[n] = want.get(n, 0) + 1

        frame = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r.node: r.n_triangles for r in triangle_counts(frame).collect()
        }
        assert got == want


class TestHllRegisterInvariance:
    """The two algebraic guarantees the HLL design rests on, over
    arbitrary inputs: (1) the register table is invariant under row
    duplication (max absorbs repeats — the reason the estimate is a
    DISTINCT count at all), and (2) registers built from any 2-way
    split of the input and merged by per-(group, idx) max equal the
    registers built from the whole — the mergeable-state contract the
    streaming sink (`streaming/hll_sink.py`) persists per micro-batch
    and the 1000-executor partial-build story both depend on. The
    catalog differential pins the estimate on the fixed corpus; these
    pin the ALGEBRA."""

    @PROP
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from("ab"), st.integers(0, 60)),
            min_size=1,
            max_size=40,
        ),
        dups=st.lists(st.integers(1, 3), min_size=40, max_size=40),
        cut=st.integers(0, 39),
    )
    def test_duplication_and_split_merge(self, spark, rows, dups, cut):
        from personal_health_etl_pipeline_spark.plans.sketches import (
            hll_registers,
        )

        schema = "event_type string, user_id long"

        def regs(data):
            df = spark.createDataFrame(data, schema)
            return {
                (r.event_type, r.idx): r.r for r in hll_registers(df).collect()
            }

        want = regs(rows)

        duplicated = [row for row, k in zip(rows, dups) for _ in range(k)]
        assert regs(duplicated) == want

        i = cut % len(rows)
        m1, m2 = regs(rows[:i] or []), regs(rows[i:] or [])
        merged = {
            key: max(m1.get(key, 0), m2.get(key, 0)) for key in m1.keys() | m2.keys()
        }
        assert merged == want


class TestKmvSetOpsExactRegime:
    """sketch_kmv_set_ops' declared exact regime, over arbitrary
    corpora: whenever a pair's true union fits inside the k=64 sketch,
    the union AND intersection estimates must equal the exact counts
    (the `full` branch returns the sketch contents themselves), and the
    exact columns must equal a direct Python set computation for every
    type pair. Corpora are capped at 60 events so every union fits —
    the guarantee is deterministic, no stochastic error bound to
    flake on."""

    @PROP
    @given(
        rows=st.lists(
            st.tuples(st.sampled_from(["a", "b", "c"]), st.integers(0, 200)),
            min_size=2,
            max_size=60,
        )
    )
    def test_small_unions_are_exact(self, spark, rows):
        import shutil
        import tempfile
        from itertools import combinations

        from personal_health_etl_pipeline_spark.plans.sketches import (
            sketch_kmv_set_ops,
        )

        data = [
            (i, dt.datetime(2024, 1, 1), u, t, 0.0, "{}")
            for i, (t, u) in enumerate(rows)
        ]
        root = tempfile.mkdtemp(prefix="kmv_prop_")
        try:
            spark.createDataFrame(
                data,
                "event_id long, ts timestamp, user_id long,"
                " event_type string, value double, props string",
            ).write.mode("overwrite").parquet(f"{root}/events.parquet")
            out = sketch_kmv_set_ops(spark, root).collect()
        finally:
            shutil.rmtree(root, ignore_errors=True)

        users: dict[str, set[int]] = {}
        for t, u in rows:
            users.setdefault(t, set()).add(u)
        want_pairs = list(combinations(sorted(users), 2))
        assert [(r.ta, r.tb) for r in out] == want_pairs
        for r in out:
            ua, ub = users[r.ta], users[r.tb]
            assert r.exact_union == len(ua | ub)
            assert r.exact_inter == len(ua & ub)
            assert r.est_union == r.exact_union  # union fits the sketch
            assert r.est_inter == r.exact_inter


class TestLabelPropagationProperty:
    """label_propagation_sync vs a direct Python replay of its declared
    semantics: every node starts as its own label; each round every
    node simultaneously adopts the most frequent label among its
    neighbor MULTISET (duplicate input edges count twice, a self-loop
    contributes the node's own label twice — the adjacency is built
    without distinct), ties to the smallest label. The synchronous
    variant is a pure function of the graph, so exact (node, label)
    map equality must hold after any fixed round count — duplicate and
    reversed edges, self-loops, and count-vs-label tie collisions are
    exactly where the struct-argmax could diverge from the spec."""

    @PROP
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=24,
        )
    )
    def test_matches_python_replay(self, spark, edges):
        from collections import Counter

        from personal_health_etl_pipeline_spark.operators.graph import (
            label_propagation_sync,
        )

        n_rounds = 3
        adj: dict[int, list[int]] = {}
        for a, b in edges:
            adj.setdefault(a, []).append(b)
            adj.setdefault(b, []).append(a)
        labels = {n: n for n in adj}
        for _ in range(n_rounds):
            labels = {
                n: min((-c, lab) for lab, c in Counter(
                    labels[m] for m in nbrs
                ).items())[1]
                for n, nbrs in adj.items()
            }

        frame = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.label
            for r in label_propagation_sync(frame, n_rounds=n_rounds).collect()
        }
        assert got == labels


class TestPagerankIntegerProperty:
    """pagerank's integer micro-unit recipe vs a direct Python replay:
    the determinism contract says integer addition makes Spark's
    unordered partial aggregation bit-identical to a serial replay, so
    EXACT (node, rank_micro) map equality must hold after 3 iterations
    over arbitrary digraphs — duplicate edges (deduped by contract),
    self-loops (a node feeding itself), dangling nodes donating
    ``dang div N`` to every node's inflow, and the truncating ``div``
    at each of the three places it appears (contribution, pool,
    damping) are each a spot a float mental model would get wrong."""

    @PROP
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=24,
        )
    )
    def test_matches_python_replay(self, spark, edges):
        from personal_health_etl_pipeline_spark.operators.pagerank import (
            PAGERANK_MICRO,
            pagerank,
        )

        n_iters = 3
        e = sorted({(s, d) for s, d in edges})  # dedup_edges contract
        nodes = sorted({n for t in e for n in t})
        outdeg: dict[int, int] = {}
        for s, _ in e:
            outdeg[s] = outdeg.get(s, 0) + 1
        n = len(nodes)
        ranks = {v: PAGERANK_MICRO for v in nodes}
        for _ in range(n_iters):
            inflow = {v: 0 for v in nodes}
            for s, d in e:
                inflow[d] += ranks[s] // outdeg[s]
            dang = sum(ranks[v] for v in nodes if v not in outdeg)
            pool = dang // n
            ranks = {
                v: (15 * PAGERANK_MICRO + 85 * (inflow[v] + pool)) // 100
                for v in nodes
            }

        frame = spark.createDataFrame(edges, "src long, dst long")
        got = {
            r.node: r.rank_micro
            for r in pagerank(frame, n_iters=n_iters).collect()
        }
        assert got == ranks


class TestCountMinOneSidedProperty:
    """sketch_countmin_heavy's Cormode-Muthukrishnan guarantee, which
    holds for ANY hash function and so tests the sketch STRUCTURE
    itself (the depth-row explode, the (row, bucket) groupBy, the
    min-over-rows probe): every probe's estimate must be >= its true
    count, the true counts must equal a Python whitespace-tokenization
    replay, and the probed rows must be exactly the top-20 terms by
    (count desc, term). Corpora are tiny words from a 3-letter
    alphabet, so bucket collisions (the over-estimate case) actually
    occur alongside the clean case."""

    @PROP
    @given(
        texts=st.lists(
            st.text(alphabet="ab x", min_size=0, max_size=24),
            min_size=1,
            max_size=12,
        )
    )
    def test_estimate_dominates_true_count(self, spark, texts):
        import re
        import shutil
        import tempfile
        from collections import Counter

        from personal_health_etl_pipeline_spark.plans.sketches import (
            CM_PROBES,
            sketch_countmin_heavy,
        )

        true = Counter(
            t for s in texts for t in re.split(r"\s+", s) if t != ""
        )
        root = tempfile.mkdtemp(prefix="cm_prop_")
        try:
            spark.createDataFrame(
                [(i, s, "en", "prop", len(s)) for i, s in enumerate(texts)],
                "doc_id long, text string, lang string,"
                " source string, n_chars long",
            ).write.mode("overwrite").parquet(f"{root}/documents.parquet")
            out = sketch_countmin_heavy(spark, root).collect()
        finally:
            shutil.rmtree(root, ignore_errors=True)

        want_probes = sorted(true.items(), key=lambda kv: (-kv[1], kv[0]))
        want_probes = want_probes[:CM_PROBES]
        assert [(r.term, r.true_count) for r in out] == want_probes
        for r in out:
            assert r.est_count >= r.true_count, r


class TestBpeTrainMergesProperty:
    """bpe_train_merges vs a direct Python replay of its declared
    protocol, over arbitrary tiny-alphabet word tables and both
    batch_k regimes: per round, rank pair counts by (sum(wc) desc, a,
    b) over adjacent symbol pairs with a != b (EOW sentinel included),
    take the top 4*want rows only (the over-fetch LIMIT is part of the
    contract — an all-skipped window accepts fewer, never refetches),
    greedily accept up to `want` symbol-disjoint pairs, apply each
    accepted merge SEQUENTIALLY as the simultaneous positional
    transform (x + next when (x, next) = (a, b); drop x when
    (prev, x) = (a, b); evaluated against the pre-merge array), over
    exactly ceil(n_merges / batch_k) fixed rounds with an
    empty-ranking early break. Exact (merge list, round count)
    equality — order included, which is what the segmenter consumes."""

    @staticmethod
    def _replay(word_rows, n_merges, batch_k):
        from personal_health_etl_pipeline_spark.plans.llm_surface3 import EOW

        def apply_merge(seq, a, b):
            n = len(seq)
            out = []
            for i, x in enumerate(seq):
                nxt = seq[i + 1] if i + 1 < n else None
                prv = seq[i - 1] if i >= 1 else None
                if x == a and nxt == b:
                    out.append(x + nxt)
                elif prv == a and x == b:
                    out.append(None)
                else:
                    out.append(x)
            return [x for x in out if x is not None]

        tbl = {w: (list(w) + [EOW], wc) for w, wc in word_rows}
        merges = []
        rounds = 0
        n_rounds = -(-n_merges // batch_k)
        for r_i in range(n_rounds):
            want = min(batch_k, n_merges - r_i * batch_k)
            cnt: dict[tuple[str, str], int] = {}
            for seq, wc in tbl.values():
                for a, b in zip(seq, seq[1:]):
                    if a != b:
                        cnt[(a, b)] = cnt.get((a, b), 0) + wc
            ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
            top = [p for p, _ in ranked[: want * 4]]
            rounds += 1
            if not top:
                break
            used: set[str] = set()
            chosen = []
            for a, b in top:
                if len(chosen) == want:
                    break
                if a in used or b in used:
                    continue
                chosen.append((a, b))
                used.update((a, b))
            for a, b in chosen:
                tbl = {
                    w: (apply_merge(seq, a, b), wc)
                    for w, (seq, wc) in tbl.items()
                }
            merges.extend(chosen)
        return merges, rounds

    @PROP
    @given(
        words=st.dictionaries(
            st.text(alphabet="abc", min_size=1, max_size=6),
            st.integers(1, 5),
            min_size=1,
            max_size=10,
        ),
        batch_k=st.sampled_from([1, 3]),
    )
    def test_matches_python_replay(self, spark, words, batch_k):
        from personal_health_etl_pipeline_spark.plans.llm_surface3 import (
            bpe_train_merges,
        )

        n_merges = 6
        rows = sorted(words.items())
        frame = spark.createDataFrame(rows, "word string, wc long")
        got_merges, got_rounds = bpe_train_merges(
            frame, n_merges=n_merges, batch_k=batch_k
        )
        want_merges, want_rounds = self._replay(rows, n_merges, batch_k)
        assert got_merges == want_merges
        assert got_rounds == want_rounds


class TestKcoreBoundedProperty:
    """kcore_bounded vs the direct Python synchronous peel: after R
    rounds of dropping every node whose degree within the survivor set
    is < k, the table must hold EXACTLY the surviving nodes with their
    within-core degrees. This was the last hand-rolled iterative
    algorithm without a property (VERDICT-r14 item 7); the peel now
    lives in operators/graph.kcore_bounded so the property drives the
    engine code. The drive targets cascade behavior — removing a node
    lowers neighbors below k in LATER rounds — plus parallel edges
    (each counts toward degree), self-loops (count twice via the
    symmetrized directions), and graphs that empty out entirely."""

    @staticmethod
    def _python_peel(edges, k, rounds):
        und = [(a, b) for a, b in edges] + [(b, a) for a, b in edges]
        surv = {n for e in und for n in e}

        def degrees(s):
            d = {}
            for n, m in und:
                if n in s and m in s:
                    d[n] = d.get(n, 0) + 1
            return d

        for _ in range(rounds):
            surv = {n for n, d in degrees(surv).items() if d >= k}
        return degrees(surv)

    @PROP
    @given(
        edges=st.lists(
            st.tuples(st.integers(0, 9), st.integers(0, 9)),
            min_size=1,
            max_size=25,
        ),
        k=st.integers(min_value=1, max_value=4),
    )
    def test_matches_python_peel(self, spark, edges, k):
        from personal_health_etl_pipeline_spark.operators.graph import (
            kcore_bounded,
        )

        rounds = 3
        want = self._python_peel(edges, k, rounds)
        frame = spark.createDataFrame(edges, "id_a long, id_b long")
        got = {
            r.node: r.deg
            for r in kcore_bounded(frame, k=k, rounds=rounds).collect()
        }
        assert got == want

    def test_cascade_needs_every_round(self, spark):
        # a triangle {5,6,7} with a tail 0-1-2-3-4-5 at k=2: exactly
        # one tail node drops per round (only the current endpoint has
        # degree < 2), so each round count yields a distinct non-empty
        # survivor set — distinguishes a true R-round peel from a
        # single-pass degree filter
        from personal_health_etl_pipeline_spark.operators.graph import (
            kcore_bounded,
        )

        edges = [(i, i + 1) for i in range(5)] + [(5, 6), (6, 7), (5, 7)]
        frame = spark.createDataFrame(edges, "id_a long, id_b long")
        after1 = {r.node for r in kcore_bounded(frame, 2, 1).collect()}
        after2 = {r.node for r in kcore_bounded(frame, 2, 2).collect()}
        after3 = {r.node for r in kcore_bounded(frame, 2, 3).collect()}
        assert after1 == {1, 2, 3, 4, 5, 6, 7}
        assert after2 == {2, 3, 4, 5, 6, 7}
        assert after3 == {3, 4, 5, 6, 7}
