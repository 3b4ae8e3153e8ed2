"""Multimodal columns: opaque binary media + typed metadata.

Images/audio/video ride through the engine as ``binary`` content
columns next to a typed metadata struct — the lakehouse-standard
layout (content-addressable bytes, queryable metadata). Heavy per-item
work (decode, feature extraction, resize, frame sampling) runs as
Arrow-batched ``mapInPandas`` / ``pandas_udf`` stages: Python touches
each batch once, the surrounding plan (partitioning, pruning, joins)
stays pure Catalyst.

Real codecs (PIL/ffmpeg/soundfile) are NOT available in this
environment, so decoding is split in two layers:

* a **deterministic fake container format** (``FAKEM``) with a real
  parser — exercises the full plumbing (schema, batching, explode
  semantics, partition preservation) end to end, and
* ``decode_real()``, the integration point that raises
  ``NotImplementedError`` until a codec library is importable —
  clearly marked, import-gated, never on the hot path here.

Scale notes (100 TB of media): content stays off the shuffle path —
every transform here is a narrow map over batches; feature vectors
(small arrays) are what flows onward into joins/ANN. Batch size is
bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch`` so
executor memory is independent of media size distribution.
"""

from __future__ import annotations

import hashlib
import struct as _struct
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# --- the FAKEM container (deterministic stand-in for real codecs) -----

_MAGIC = b"FAKEM"
_HEADER = ">5sBHHI"  # magic, kind, width, height, n_frames
_KINDS = ("image", "audio", "video")

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("media_type", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("n_frames", IntegerType()),
                ]
            ),
        ),
    ]
)


def encode_fake(media_id: int) -> tuple[bytes, str, int, int, int]:
    """Deterministic fake media blob for ``media_id``: a parseable
    header + md5-chain payload. Same id -> same bytes, everywhere."""
    kind_i = media_id % 3
    width = 16 + (media_id * 7) % 48
    height = 16 + (media_id * 13) % 32
    n_frames = 1 if kind_i == 0 else 4 + media_id % 5
    header = _struct.pack(_HEADER, _MAGIC, kind_i, width, height, n_frames)
    payload = b""
    seed = f"media|{media_id}".encode()
    for f_i in range(n_frames):
        payload += hashlib.md5(seed + bytes([f_i])).digest()
    return header + payload, _KINDS[kind_i], width, height, n_frames


def synth_media_df(spark, n: int = 100) -> DataFrame:
    """A media table fixture: (media_id, content binary, meta struct)."""
    rows = []
    for i in range(n):
        blob, kind, w, h, nf = encode_fake(i)
        rows.append((i, bytearray(blob), (kind, w, h, nf)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


# --- decode -----------------------------------------------------------

DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("media_type", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("n_frames", IntegerType()),
        StructField("payload_bytes", LongType()),
        StructField("payload_digest", StringType()),
    ]
)


def _parse_fake(blob: bytes) -> tuple[str, int, int, int, bytes]:
    if blob[:5] != _MAGIC:
        raise ValueError("not a FAKEM container")
    _, kind_i, width, height, n_frames = _struct.unpack_from(_HEADER, blob)
    return _KINDS[kind_i], width, height, n_frames, blob[_struct.calcsize(_HEADER):]


def decode_real(blob: bytes):  # pragma: no cover - integration point
    """Decode real image/audio/video bytes. STUB: requires a codec
    library (PIL / soundfile / av) that this environment does not
    ship; wire it here when available."""
    try:
        import PIL.Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "real media decoding needs PIL/soundfile/av installed"
        ) from exc
    raise NotImplementedError("real decode path not implemented")


def decode_media(media: DataFrame) -> DataFrame:
    """mapInPandas decode: header parse + payload stats per item.

    One Arrow batch in, one out; the UDF is pure, so Spark is free to
    pipeline it behind the scan with zero extra shuffles.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                kind, w, h, nf, payload = _parse_fake(bytes(blob))
                out.append(
                    (
                        media_id,
                        kind,
                        w,
                        h,
                        nf,
                        len(payload),
                        # digest over the canonical lowercase-hex encoding,
                        # not the raw bytes: every SQL engine can hash a
                        # VARCHAR, few can hash a BLOB, and the content
                        # certificate is equally strong either way.
                        hashlib.md5(payload.hex().encode()).hexdigest(),
                    )
                )
            yield pd.DataFrame(out, columns=[f.name for f in DECODED_SCHEMA.fields])

    return media.select("media_id", "content").mapInPandas(_decode, DECODED_SCHEMA)


# --- feature extraction ----------------------------------------------

N_FEATURES = 16

FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("features", ArrayType(DoubleType())),
    ]
)


def extract_features(media: DataFrame) -> DataFrame:
    """Byte-histogram features (16 buckets, L1-normalized) over the
    payload — a real, deterministic feature extractor whose output
    feeds the ANN/centroid operators like any embedding column."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, feats = [], []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                _, _, _, _, payload = _parse_fake(bytes(blob))
                arr = np.frombuffer(payload, dtype=np.uint8)
                hist = np.bincount(arr >> 4, minlength=N_FEATURES).astype(np.float64)
                total = hist.sum()
                ids.append(media_id)
                # plain IEEE int/int division, no rounding: numpy's
                # round-half-even differs from SQL round-half-away at
                # exact ties (k/128), while the unrounded quotient is
                # bit-identical in any IEEE-754 engine.
                feats.append((hist / total if total else hist).tolist())
            yield pd.DataFrame({"media_id": ids, "features": feats})

    return media.select("media_id", "content").mapInPandas(_feat, FEATURES_SCHEMA)


# --- resize (stub transform, real plumbing) ---------------------------

def resize_media(media: DataFrame, width: int, height: int) -> DataFrame:
    """Re-encode every item at (width, height). The fake codec rewrites
    its header (payload unchanged); real codecs plug into
    :func:`decode_real`. Output schema == input schema, so resize
    composes with any downstream media operator."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            contents = []
            metas = []
            for blob in pdf["content"]:
                kind, _, _, nf, payload = _parse_fake(bytes(blob))
                header = _struct.pack(
                    _HEADER, _MAGIC, _KINDS.index(kind), width, height, nf
                )
                contents.append(header + payload)
                metas.append(
                    {"media_type": kind, "width": width, "height": height,
                     "n_frames": nf}
                )
            yield pd.DataFrame(
                {"media_id": pdf["media_id"], "content": contents, "meta": metas}
            )

    return media.mapInPandas(_resize, MEDIA_SCHEMA)


# --- frame sampling ---------------------------------------------------

FRAMES_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("frame_index", IntegerType()),
        StructField("frame_bytes", BinaryType()),
    ]
)


def sample_frames(media: DataFrame, every: int = 2) -> DataFrame:
    """Explode each video/audio item into every ``every``-th frame —
    a one-to-many mapInPandas (pandas handles the fan-out inside the
    batch; no Spark-side explode of the binary column needed)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                _, _, _, nf, payload = _parse_fake(bytes(blob))
                frame_len = len(payload) // nf if nf else 0
                for f_i in range(0, nf, every):
                    out.append(
                        (
                            media_id,
                            f_i,
                            payload[f_i * frame_len:(f_i + 1) * frame_len],
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in FRAMES_SCHEMA.fields]
            )

    return media.select("media_id", "content").mapInPandas(_frames, FRAMES_SCHEMA)


# --- audio analysis windows ------------------------------------------

AUDIO_WINDOW = 16  # samples per analysis window (== one payload block)

AUDIO_ENERGY_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("window_index", LongType()),
        StructField("n_samples", LongType()),
        StructField("energy", LongType()),
        StructField("peak", LongType()),
    ]
)


def audio_window_energy(
    media: DataFrame, window: int = AUDIO_WINDOW
) -> DataFrame:
    """Per-window energy/peak over audio payloads — the windowed
    feature-extraction shape (RMS/VAD front ends) as a one-to-many
    mapInPandas: samples are the payload's unsigned bytes, each window
    emits (sum of squares, max) as EXACT integers, so the output is
    hash-certifiable with no float formatting concerns.

    The audio filter runs on the typed ``meta`` column BEFORE the UDF,
    so non-audio binary never crosses the Arrow boundary — at 100 TB
    the predicate prunes the transfer, not just the compute. Inside the
    batch the per-window reduction is vectorized numpy (a reshape +
    axis-sum), not a Python loop over samples."""

    def _energy(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for media_id, blob in zip(pdf["media_id"], pdf["content"]):
                _, _, _, _, payload = _parse_fake(bytes(blob))
                arr = np.frombuffer(payload, dtype=np.uint8).astype(np.int64)
                n_win = (len(arr) + window - 1) // window
                # zero-pad the ragged tail and reduce per-row: pads are
                # 0, so energy and (unsigned) peak are unaffected
                m = np.pad(arr, (0, n_win * window - len(arr))).reshape(
                    n_win, window
                )
                lens = np.full(n_win, window, dtype=np.int64)
                lens[-1] = len(arr) - (n_win - 1) * window
                energies = (m * m).sum(axis=1)
                peaks = m.max(axis=1)
                for wi in range(n_win):
                    out.append(
                        (
                            media_id,
                            wi,
                            int(lens[wi]),
                            int(energies[wi]),
                            int(peaks[wi]),
                        )
                    )
            yield pd.DataFrame(
                out, columns=[f.name for f in AUDIO_ENERGY_SCHEMA.fields]
            )

    audio = media.where(F.col("meta.media_type") == "audio")
    return audio.select("media_id", "content").mapInPandas(
        _energy, AUDIO_ENERGY_SCHEMA
    )


# --- oracle-checkable byte stats over text-derived binary -------------

BYTE_STATS_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("byte_sum", LongType()),
        StructField("distinct_bytes", LongType()),
    ]
)


def doc_byte_stats(docs: DataFrame) -> DataFrame:
    """Treat document text as an opaque binary payload and compute byte
    stats in a vectorized Pandas stage — the oracle-checked certificate
    that the Arrow binary plumbing computes what SQL says it should."""

    def _stats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, blob in zip(pdf["doc_id"], pdf["payload"]):
                arr = np.frombuffer(bytes(blob), dtype=np.uint8)
                rows.append(
                    (doc_id, len(arr), int(arr.sum()), len(np.unique(arr)))
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in BYTE_STATS_SCHEMA.fields]
            )

    payload = docs.select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return payload.mapInPandas(_stats, BYTE_STATS_SCHEMA)
