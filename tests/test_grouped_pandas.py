"""Grouped-map applyInPandas: per-group OLS in pandas must agree with the
JVM regr_slope/regr_intercept aggregates — completing the UDF API matrix
(pandas_udf scalar ✓, mapInPandas ✓, applyInPandasWithState ✓, grouped map)."""

from __future__ import annotations

import pandas as pd
import pytest


def test_applyinpandas_ols_matches_builtin(spark, sf_dir):
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")

    def ols(pdf: pd.DataFrame) -> pd.DataFrame:
        x, y = pdf["l_quantity"], pdf["l_extendedprice"]
        mx, my = x.mean(), y.mean()
        cov = ((x - mx) * (y - my)).sum()
        var = ((x - mx) ** 2).sum()
        slope = cov / var
        return pd.DataFrame(
            {
                "l_returnflag": [pdf["l_returnflag"].iloc[0]],
                "slope": [slope],
                "intercept": [my - slope * mx],
            }
        )

    got = {
        r["l_returnflag"]: (r["slope"], r["intercept"])
        for r in li.groupBy("l_returnflag")
        .applyInPandas(ols, schema="l_returnflag string, slope double, intercept double")
        .collect()
    }
    from wordcount_spark.operators.queries_relational import agg_regression

    want = {
        r["l_returnflag"]: (r["slope"], r["intercept"])
        for r in agg_regression(spark, sf_dir).collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == pytest.approx(want[k][0], abs=1e-3)
        assert got[k][1] == pytest.approx(want[k][1], abs=1e-1)


def test_pgm_decoder_rejects_corrupt_payloads(spark):
    """The real PGM decoder must actually PARSE — a corrupted magic or a
    truncated pixel buffer raises instead of producing silent garbage."""
    import pandas as pd
    import pytest as _pytest

    from wordcount_spark.operators.multimodal import decode_pgm_features

    good = b"P5\n2 2\n255\n" + bytes([1, 2, 3, 4])
    rows = decode_pgm_features(
        spark.createDataFrame(pd.DataFrame({"doc_id": [1], "payload": [good]}))
    ).collect()
    assert rows[0]["sum_pixels"] == 10 and rows[0]["max_pixel"] == 4

    for bad in (b"P6\n2 2\n255\n" + bytes(4), b"P5\n2 2\n255\n" + bytes(3)):
        df = decode_pgm_features(
            spark.createDataFrame(pd.DataFrame({"doc_id": [1], "payload": [bad]}))
        )
        with _pytest.raises(Exception):
            df.collect()


def test_wav_decoder_reads_header_fields(spark):
    """sample_rate must come from the PARSED header, not assumption."""
    import struct

    import numpy as np
    import pandas as pd

    from wordcount_spark.operators.multimodal import decode_wav_features

    samples = np.array([100, -200, 300], dtype="<i2")
    data = samples.tobytes()
    hdr = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVEfmt "
        + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(data))
    )
    rows = decode_wav_features(
        spark.createDataFrame(pd.DataFrame({"doc_id": [7], "payload": [hdr + data]}))
    ).collect()
    r = rows[0]
    assert r["sample_rate"] == 8000  # parsed, not the default 16000
    assert r["n_samples"] == 3 and r["sum_abs"] == 600 and r["peak_abs"] == 300
    assert r["sum_sq"] == 100 * 100 + 200 * 200 + 300 * 300


def test_mulaw_expansion_exhaustive():
    """The vectorized G.711 expansion must agree with an independently
    spelled scalar reference on ALL 256 companded byte values (the oracle
    SQL is a third spelling; this pins the Python/numpy one)."""
    from wordcount_spark.operators.multimodal import mulaw_expand

    def ref(u: int) -> int:
        u = ~u & 0xFF
        t = ((u & 0x0F) << 3) + 0x84
        t <<= (u & 0x70) >> 4
        return (0x84 - t) if (u & 0x80) else (t - 0x84)

    got = mulaw_expand(list(range(256)))
    for u in range(256):
        assert int(got[u]) == ref(u), u
    # anchors (complement-first convention, mirrored in the SQL oracle):
    # 0xFF expands to 0 (silence), 0x80/0x00 are the ± peaks
    assert int(got[0xFF]) == 0
    assert int(got[0x80]) == 32124
    assert int(got[0x00]) == -32124


def test_ppm_decode_roundtrip_spark(spark):
    """P6 synth → Arrow → decode must reproduce the per-channel formula
    (independent recomputation in numpy, not the SQL oracle)."""
    import numpy as np

    from wordcount_spark.operators.multimodal import (
        PPM_A,
        PPM_B,
        decode_ppm_features,
        ppm_dims,
        synth_ppm_payload,
    )

    docs = spark.range(0, 12).withColumnRenamed("id", "doc_id")
    rows = {r["doc_id"]: r for r in decode_ppm_features(synth_ppm_payload(docs)).collect()}
    for d in range(12):
        w, h = ppm_dims(d)
        flat = (d * PPM_A + np.arange(3 * w * h, dtype=np.int64) * PPM_B) % 256
        rgb = flat.reshape(-1, 3)
        r = rows[d]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["sum_r"] == int(rgb[:, 0].sum())
        assert r["sum_g"] == int(rgb[:, 1].sum())
        assert r["sum_b"] == int(rgb[:, 2].sum())
        assert r["max_rgb"] == int(rgb.max())


def test_bmp_decode_roundtrip_spark(spark):
    """24-bit BMP synth → decode must undo bottom-up rows, BGR order, and
    4-byte row padding to reproduce the top-down RGB formula (independent
    numpy recomputation; widths cycle through every padding amount)."""
    import numpy as np

    from wordcount_spark.operators.multimodal import (
        BMP_A,
        BMP_B,
        BMP_C,
        bmp_dims,
        decode_bmp_features,
        synth_bmp_payload,
    )

    docs = spark.range(0, 16).withColumnRenamed("id", "doc_id")
    rows = {r["doc_id"]: r for r in decode_bmp_features(synth_bmp_payload(docs)).collect()}
    pads = set()
    for d in range(16):
        w, h = bmp_dims(d)
        pads.add((-w * 3) % 4)
        idx = np.arange(w * h, dtype=np.int64)
        chans = [(d * BMP_A + idx * BMP_B + c * BMP_C) % 256 for c in range(3)]
        r = rows[d]
        assert (r["width"], r["height"], r["n_pixels"]) == (w, h, w * h)
        assert r["sum_r"] == int(chans[0].sum())
        assert r["sum_g"] == int(chans[1].sum())
        assert r["sum_b"] == int(chans[2].sum())
        assert r["max_rgb"] == int(max(c.max() for c in chans))
    assert pads == {0, 1, 2, 3}  # every padding amount exercised
