"""Bloom-filter runtime pre-filtering for selective joins.

The 100 TB problem: ``huge_probe JOIN selective_build`` shuffles every
probe row, although almost none survive. Spark's own runtime row-level
filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects
exactly this pattern when statistics justify it; this module exposes it
as an explicit operator so the pre-filter is (a) deterministic (a fixed
seeded hash family — xxhash64 by default, the codegen intrinsic; or the
md5-derived ``functions/hashing.py`` family when the bit array must be
reproducible outside the JVM) and (b) oracle-checkable — the final
result is provably the plain semi-join because a Bloom filter has no
false negatives and an exact join runs on the survivors.

Shape:

* ``bloom_build`` — one aggregation of the build side into a single row
  holding the bit array as ``array<bigint>`` (``m_bits/64`` words; 2^16
  bits = 1 KiB default for tests, 2^27 bits = 16 MiB is a realistic
  cluster setting). Bits are OR-accumulated with ``bit_or`` partial
  aggregation — map-side combine, one tiny shuffle.
* ``bloom_prefilter`` — broadcast the 1-row bit array to every probe
  task (a 1-row broadcast nested-loop join, the same physical shape as
  Spark's scalar-subquery runtime filters) and keep rows whose ``k``
  hash bits are all set. Pure map-side: the probe is NOT shuffled,
  exploded, or re-aggregated.
* ``bloom_semi_join`` — prefilter, then exact ``left_semi`` join on the
  survivors. Survivor count ≈ |matches| + FPR·|probe|; with m/n ≈ 13
  bits/key and k=3 the false-positive rate is under 2%, so the shuffle
  that remains moves ~the matching rows only.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.functions.hashing import (
    md5_long_seeded,
)

DEFAULT_M_BITS = 1 << 16
DEFAULT_K = 3

# Hash family for the k probe positions. Correctness does NOT depend
# on the choice (a Bloom filter has no false negatives under any hash
# family, and the exact join runs on the survivors — the certified
# result is the plain semi-join either way), so the default is
# xxhash64, Spark's whole-stage-codegen intrinsic: the r9 A/B at
# sf0.1 measured the 3x md5 probe hashing as the dominant j10 cost.
# "md5" remains for flows that must reproduce the BIT ARRAY itself
# outside the JVM (functions/hashing.py is the DuckDB-portable family).
DEFAULT_HASH_FAMILY = "xxhash64"


def _positions(
    key: Column, m_bits: int, k: int, hash_family: str = DEFAULT_HASH_FAMILY
) -> list[Column]:
    if hash_family == "xxhash64":
        # seed folded in as a literal column; pmod because xxhash64 is
        # signed and a negative position would index out of the array
        return [
            F.pmod(F.xxhash64(F.lit(seed), key), F.lit(m_bits))
            for seed in range(k)
        ]
    if hash_family == "md5":
        return [md5_long_seeded(key, seed) % m_bits for seed in range(k)]
    raise ValueError(f"unknown hash_family: {hash_family!r}")


def bloom_build(
    build: DataFrame,
    key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    hash_family: str = DEFAULT_HASH_FAMILY,
) -> DataFrame:
    """Aggregate the build side's keys into a 1-row Bloom bit array.

    Returns a single row ``words: array<bigint>`` of ``m_bits/64``
    words. The per-word OR runs as a partial aggregate (map-side
    combine), so the shuffle carries at most ``m_bits/64`` rows per
    partition regardless of build size.
    """
    if m_bits % 64:
        raise ValueError("m_bits must be a multiple of 64")
    n_words = m_bits // 64
    pos = F.explode(
        F.array(*_positions(F.col(key), m_bits, k, hash_family))
    ).alias("pos")
    words = (
        build.select(pos)
        .select(
            (F.col("pos") / 64).cast("int").alias("word_idx"),
            (F.col("pos") % 64).cast("int").alias("bit"),
        )
        # shiftleft's Python API takes a literal bit count; the bit
        # position is a column here, so drop to the SQL form.
        .withColumn("bitmask", F.expr("shiftleft(CAST(1 AS BIGINT), bit)"))
        .groupBy("word_idx")
        .agg(F.bit_or("bitmask").alias("word"))
    )
    dense = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("wmap"), i.cast("int")), F.lit(0).cast("bigint")
        ),
    )
    # The build parameters travel WITH the bit array as column metadata
    # (schema-side only — no extra job, survives broadcast). A bit
    # array built with one hash family but probed with another would
    # produce FALSE NEGATIVES, breaking the module's central
    # no-false-negatives guarantee; bloom_prefilter reads these back
    # and refuses a mismatched probe (ADVICE-r9).
    meta = {"m_bits": m_bits, "k": k, "hash_family": hash_family}
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word_idx", "word"))).alias("wmap")
    ).select(dense.alias("words", metadata=meta))


def _bit_test(pos_col: str, words_col: str = "words") -> Column:
    """True iff the ``pos_col``-th bit of the bit array is set.

    SQL form because shiftright's Python binding takes only literal bit
    counts. The ``% 2 != 0`` oddness test is sign-safe: for a negative
    word (bit 63 set) the arithmetic shift keeps two's-complement bit
    ``b`` as the parity of ``word >> b`` (remainder is then -1, still
    != 0).
    """
    return F.expr(
        f"(shiftright(element_at({words_col}, "
        f"CAST({pos_col} DIV 64 AS INT) + 1), "
        f"CAST({pos_col} % 64 AS INT)) % 2) != 0"
    )


def bloom_prefilter(
    probe: DataFrame,
    key: str,
    bloom: DataFrame,
    m_bits: int | None = None,
    k: int | None = None,
    hash_family: str | None = None,
) -> DataFrame:
    """Map-side probe filter: broadcast the 1-row bit array, keep rows
    that might be in the build set (superset of the true matches).

    The probe parameters default to the ones recorded in the bloom
    DataFrame's column metadata by :func:`bloom_build` — probing with a
    different hash family / m_bits / k than the array was built with
    silently yields false negatives, so an explicit argument that
    contradicts the recorded build parameters is a hard error, and for a
    bit array that arrived without metadata (e.g. read back from a sink
    that drops it) every build parameter MUST be passed explicitly —
    falling back to module defaults there would silently produce false
    negatives for any non-default build, so that is a hard error too
    (ADVICE-r10)."""
    recorded = (
        dict(bloom.schema["words"].metadata or {})
        if "words" in bloom.columns
        else {}
    )
    resolved: dict[str, int | str] = {}
    for arg, name in ((m_bits, "m_bits"), (k, "k"),
                      (hash_family, "hash_family")):
        if arg is not None and name in recorded and arg != recorded[name]:
            raise ValueError(
                f"bloom_prefilter {name}={arg!r} contradicts the value "
                f"recorded at build time ({recorded[name]!r}); probing "
                "with mismatched parameters produces false negatives"
            )
        value = arg if arg is not None else recorded.get(name)
        if value is None:
            raise ValueError(
                f"bloom_prefilter: the bit array carries no recorded "
                f"{name} and none was passed; a bloom persisted through "
                "a metadata-dropping sink must be probed with explicit "
                "m_bits/k/hash_family — guessing defaults would yield "
                "silent false negatives for a non-default build"
            )
        resolved[name] = value
    m_bits = int(resolved["m_bits"])
    k = int(resolved["k"])
    hash_family = str(resolved["hash_family"])
    out_cols = probe.columns
    staged = probe.crossJoin(F.broadcast(bloom))
    for seed, p in enumerate(_positions(F.col(key), m_bits, k, hash_family)):
        staged = staged.withColumn(f"_bloom_pos_{seed}", p)
    cond = reduce(
        lambda a, b: a & b, [_bit_test(f"_bloom_pos_{s}") for s in range(k)]
    )
    return staged.filter(cond).select(*out_cols)


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    key: str,
    m_bits: int = DEFAULT_M_BITS,
    k: int = DEFAULT_K,
    hash_family: str = DEFAULT_HASH_FAMILY,
) -> DataFrame:
    """Exact ``probe LEFT SEMI JOIN build ON key``, Bloom-prefiltered.

    Result is identical to the plain semi-join (no false negatives +
    exact verify); only the cost moves: the shuffle sees the ~2%
    surviving probe rows instead of everything.
    """
    bloom = bloom_build(build, key, m_bits, k, hash_family)
    # prefilter reads the build parameters from the bloom's column
    # metadata — by construction they cannot mismatch
    survivors = bloom_prefilter(probe, key, bloom)
    return survivors.join(build.select(key).distinct(), on=key, how="left_semi")
