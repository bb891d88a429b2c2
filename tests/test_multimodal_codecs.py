"""Probe-gated real-codec decode tests (Pillow PNG/JPEG, soundfile FLAC).

These skip cleanly where the codec libraries are absent (as in the build
container) and run the full encode→decode→formula-oracle round trip where
they exist — the same gating the conditional query registration uses
(queries_multimodal._register_codec_gated), so green-where-possible is
mechanical, not hand-maintained.
"""

from __future__ import annotations

import pytest

from wordcount_spark.operators.multimodal import (
    BMP_A,
    BMP_B,
    BMP_C,
    WAV_SAMP_A,
    WAV_SAMP_B,
    jpeg_dims,
    pillow_available,
    png_dims,
    soundfile_available,
    wav_n_samples,
)


def test_probe_matches_registration():
    """The query registry holds the codec queries IFF the probe passes —
    the conditional registration can't drift from the capability."""
    from wordcount_spark.registry import get_queries

    qs = get_queries()
    assert ("multimodal_decode_png_pillow" in qs) == pillow_available()
    assert ("multimodal_decode_jpeg" in qs) == pillow_available()
    assert ("multimodal_decode_flac" in qs) == soundfile_available()


@pytest.mark.skipif(not pillow_available(), reason="Pillow not in this env")
def test_png_roundtrip_exact(spark, sf_dir):
    """PNG is lossless: decoded per-channel sums must equal the generator
    formula exactly."""
    from wordcount_spark.operators.multimodal import (
        decode_image_features_pillow,
        synth_png_payload,
    )
    from wordcount_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    got = {
        r["doc_id"]: r.asDict()
        for r in decode_image_features_pillow(synth_png_payload(docs)).collect()
    }
    for doc_id, row in got.items():
        w, h = png_dims(doc_id)
        assert (row["width"], row["height"]) == (w, h)
        for ci, col in enumerate(("sum_r", "sum_g", "sum_b")):
            want = sum(
                (doc_id * BMP_A + p * BMP_B + ci * BMP_C) % 256
                for p in range(w * h)
            )
            assert row[col] == want, (doc_id, col)


@pytest.mark.skipif(not pillow_available(), reason="Pillow not in this env")
def test_jpeg_roundtrip_container_facts(spark, sf_dir):
    """JPEG is lossy: assert the container facts (format, dims, mode) and
    that a FULL decode happened (in_range forces pixel materialization)."""
    from wordcount_spark.operators.multimodal import (
        decode_image_dims_pillow,
        synth_jpeg_payload,
    )
    from wordcount_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    for r in decode_image_dims_pillow(synth_jpeg_payload(docs)).collect():
        w, h = jpeg_dims(r["doc_id"])
        assert r["fmt"] == "JPEG"
        assert (r["width"], r["height"]) == (w, h)
        assert r["mode"] == "RGB"
        assert r["in_range"]


@pytest.mark.skipif(not soundfile_available(), reason="soundfile not in this env")
def test_flac_roundtrip_exact(spark, sf_dir):
    """FLAC is lossless: decompressed PCM features must equal the WAV
    generator formula exactly (compression must be bit-transparent)."""
    from wordcount_spark.operators.multimodal import (
        decode_flac_features,
        synth_flac_payload,
    )
    from wordcount_spark.sources.readers import load_table

    docs = load_table(spark, sf_dir, "documents").limit(40)
    for r in decode_flac_features(synth_flac_payload(docs)).collect():
        n = wav_n_samples(r["doc_id"])
        samples = [
            ((r["doc_id"] * WAV_SAMP_A + i * WAV_SAMP_B) % 4096) - 2048
            for i in range(n)
        ]
        assert r["n_samples"] == n
        assert r["sample_rate"] == 16000
        assert r["sum_abs"] == sum(abs(s) for s in samples)
        assert r["sum_sq"] == sum(s * s for s in samples)
        assert r["peak_abs"] == max(abs(s) for s in samples)
