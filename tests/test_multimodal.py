"""Multimodal-column tests: binary content + metadata struct through
Arrow-batched mapInPandas stages (decode, features, resize, frame
sampling). The codec is the deterministic FAKEM container — real
decoders are import-gated stubs (no codec libs in this environment) —
but the Spark plumbing (schemas, batching, fan-out, composition) is
fully real and pinned by golden values here.
"""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from personal_health_etl_pipeline_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def media(spark):
    return MM.synth_media_df(spark, n=30)


class TestDecode:
    def test_decode_matches_encoded_metadata(self, spark, media):
        got = {r.media_id: r for r in MM.decode_media(media).collect()}
        assert len(got) == 30
        for i in range(30):
            blob, kind, w, h, nf = MM.encode_fake(i)
            r = got[i]
            assert (r.media_type, r.width, r.height, r.n_frames) == (kind, w, h, nf)
            assert r.payload_bytes == nf * 16  # one md5 block per frame
            assert r.payload_digest == hashlib.md5(blob[14:].hex().encode()).hexdigest()

    def test_unknown_container_blob_is_an_error(self, spark):
        bad = spark.createDataFrame(
            [(1, bytearray(b"JUNKDATA"), ("image", 1, 1, 1))], MM.MEDIA_SCHEMA
        )
        with pytest.raises(Exception, match="container|PythonException"):
            MM.decode_media(bad).collect()

    def test_truncated_real_container_is_an_error(self):
        # PNG magic but no IHDR: the real decoder must refuse, not guess
        with pytest.raises(ValueError):
            MM.decode_real(b"\x89PNG\r\n\x1a\n")


class TestFeatures:
    def test_histogram_is_normalized_and_deterministic(self, spark, media):
        rows = MM.extract_features(media).collect()
        assert len(rows) == 30
        for r in rows:
            assert len(r.features) == MM.N_FEATURES
            assert abs(sum(r.features) - 1.0) < 1e-4
        again = {r.media_id: r.features for r in MM.extract_features(media).collect()}
        assert all(again[r.media_id] == r.features for r in rows)


class TestResize:
    def test_resize_rewrites_header_keeps_payload(self, spark, media):
        resized = MM.resize_media(media, 8, 8)
        assert resized.schema == MM.MEDIA_SCHEMA
        got = {r.media_id: r for r in MM.decode_media(resized).collect()}
        for i in range(30):
            _, kind, _, _, nf = MM.encode_fake(i)
            assert (got[i].width, got[i].height) == (8, 8)
            # payload untouched by the fake re-encode
            orig = MM.encode_fake(i)[0][14:]
            assert got[i].payload_digest == hashlib.md5(orig.hex().encode()).hexdigest()

    def test_resize_composes_with_features(self, spark, media):
        f1 = {r.media_id: r.features
              for r in MM.extract_features(media).collect()}
        f2 = {r.media_id: r.features
              for r in MM.extract_features(MM.resize_media(media, 4, 4)).collect()}
        assert f1 == f2  # features depend on payload only


class TestFrameSampling:
    def test_every_other_frame(self, spark, media):
        frames = MM.sample_frames(media, every=2).collect()
        by_id: dict[int, list] = {}
        for r in frames:
            by_id.setdefault(r.media_id, []).append(r)
        for i in range(30):
            _, kind, _, _, nf = MM.encode_fake(i)
            expect_idx = list(range(0, nf, 2))
            got = sorted(by_id[i], key=lambda r: r.frame_index)
            assert [r.frame_index for r in got] == expect_idx
            seed = f"media|{i}".encode()
            for r in got:
                assert bytes(r.frame_bytes) == hashlib.md5(
                    seed + bytes([r.frame_index])
                ).digest()

    def test_partitioning_preserved_no_shuffle(self, spark, media):
        plan = MM.sample_frames(media).rdd.toDebugString().decode()
        assert "ShuffledRDD" not in plan  # narrow map, no exchange


class TestByteStats:
    def test_matches_python_reference(self, spark, sf_dir):
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(50)
        got = {r.doc_id: r for r in MM.doc_byte_stats(docs).collect()}
        for row in docs.select("doc_id", "text").collect():
            b = row.text.encode()
            r = got[row.doc_id]
            assert (r.n_bytes, r.byte_sum, r.distinct_bytes) == (
                len(b), sum(b), len(set(b))
            )


def test_audio_window_energy_ragged_and_filtered(spark):
    from personal_health_etl_pipeline_spark.operators.multimodal import (
        audio_window_energy,
        synth_media_df,
    )

    media = synth_media_df(spark, n=12)
    # window=24 does not divide the 16-byte frames: tails are ragged
    rows = audio_window_energy(media, window=24).collect()
    assert rows
    # only audio ids (media_id % 3 == 1) appear
    assert {r.media_id % 3 for r in rows} == {1}
    for r in rows:
        assert 1 <= r.n_samples <= 24
        assert 0 <= r.peak <= 255
        # energy is bounded by n_samples * 255^2 and >= peak^2
        assert r.peak * r.peak <= r.energy <= r.n_samples * 255 * 255
    # per-item sample counts must add back up to the payload length
    by_item = {}
    for r in rows:
        by_item[r.media_id] = by_item.get(r.media_id, 0) + r.n_samples
    for mid, total in by_item.items():
        assert total == (4 + mid % 5) * 16


class TestRealCodecs:
    """Stdlib-only real codecs: WAV (wave module) and PNG (zlib +
    filter reversal) behind the same parse_media dispatch as FAKEM."""

    def test_wav_round_trip_and_dispatch(self):
        pcm = bytes(range(256)) * 5
        wav = MM.encode_wav(pcm, n_channels=1, sample_rate=16000)
        assert wav[:4] == b"RIFF" and wav[8:12] == b"WAVE"
        kind, nch, bits, nf, out = MM.decode_wav(wav)
        assert (kind, nch, bits, nf) == ("audio", 1, 8, len(pcm))
        assert out == pcm
        # parse_media dispatches on magic
        assert MM.parse_media(wav)[4] == pcm
        assert MM.decode_real(wav)[4] == pcm

    def test_png_round_trip_all_channel_counts(self):
        import random

        random.seed(11)
        for ch in (1, 3, 4):
            w, h = 17, 7
            px = bytes(random.randrange(256) for _ in range(w * h * ch))
            png = MM.encode_png(px, w, h, channels=ch)
            kind, ww, hh, nf, out = MM.decode_png(png)
            assert (kind, ww, hh, nf) == ("image", w, h, 1)
            assert out == px
            assert MM.parse_media(png)[4] == px

    def test_png_all_filter_types_reverse_exactly(self):
        """Hand-encode a PNG whose scanlines cycle through filter types
        0-4; the decoder must reverse every one bit-exactly."""
        import random
        import struct
        import zlib

        random.seed(23)
        w, h, ch = 8, 10, 3
        px = bytes(random.randrange(256) for _ in range(w * h * ch))
        stride = w * ch

        def filt(ftype, line, prev):
            res = bytearray()
            for i, x in enumerate(line):
                a = line[i - ch] if i >= ch else 0
                b = prev[i]
                c = prev[i - ch] if i >= ch else 0
                if ftype == 0:
                    pred = 0
                elif ftype == 1:
                    pred = a
                elif ftype == 2:
                    pred = b
                elif ftype == 3:
                    pred = (a + b) // 2
                else:
                    p = a + b - c
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                    pred = (
                        a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                    )
                res.append((x - pred) & 0xFF)
            return bytes(res)

        raw, prev = b"", bytes(stride)
        for y in range(h):
            line = px[y * stride : (y + 1) * stride]
            f = y % 5
            raw += bytes([f]) + filt(f, line, prev)
            prev = line

        def chunk(tag, data):
            return (
                struct.pack(">I", len(data))
                + tag
                + data
                + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF)
            )

        blob = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )
        assert MM.decode_png(blob)[4] == px

    def test_unsupported_container_raises(self):
        import pytest

        with pytest.raises(ValueError):
            MM.decode_real(b"\xff\xd8\xff\xe0 not-actually-jpeg")

    def test_real_audio_fixture_decodes_identically(self, spark):
        """real_audio=True swaps containers, not samples: the windowed
        energy table must be IDENTICAL to the FAKEM fixture's."""
        fake = MM.audio_window_energy(MM.synth_media_df(spark, n=12))
        real = MM.audio_window_energy(
            MM.synth_media_df(spark, n=12, real_audio=True)
        )
        key = lambda r: (r.media_id, r.window_index)  # noqa: E731
        assert sorted(map(tuple, fake.collect())) == sorted(
            map(tuple, real.collect())
        )
