"""Multimodal column handling: opaque binary payloads + typed metadata.

The container has no image/audio codecs, so DECODING is stubbed (real
decode raises NotImplementedError behind an import-try; the deterministic
fake derives features arithmetically from the payload bytes). What is real
— and tested — is the Spark-side plumbing a 100 TB multimodal pipeline
needs: binary columns with schemas, Arrow-batched ``mapInPandas`` operators
that consume raw bytes per batch, fan-out (frame sampling) done inside the
iterator without materializing per-row lists driver-side.

Payloads here are synthesized from ``documents.text`` (utf-8 bytes) so
every byte-level result is independently checkable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: fake modality assignment: documents cycle image/audio/video by doc_id
MIME_BY_MOD = {0: "image/png", 1: "audio/wav", 2: "video/mp4"}


def with_binary_payload(docs: DataFrame) -> DataFrame:
    """documents → (doc_id, mime, payload: binary, n_bytes).

    At real scale the payload column comes from the lakehouse (parquet
    BINARY / external object refs); here it is the utf-8 bytes of ``text``.
    """
    mime = (
        F.when(F.col("doc_id") % 3 == 0, MIME_BY_MOD[0])
        .when(F.col("doc_id") % 3 == 1, MIME_BY_MOD[1])
        .otherwise(MIME_BY_MOD[2])
    )
    return docs.select(
        "doc_id",
        mime.alias("mime"),
        F.encode("text", "utf-8").alias("payload"),
        F.octet_length(F.encode("text", "utf-8")).alias("n_bytes"),
    )


def _decode_real(payload: bytes, mime: str):  # pragma: no cover - no codecs in env
    """Real decode path — requires codec libs absent from this container."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image/audio codecs not available in this environment; "
            "use the deterministic stub features instead"
        ) from exc
    raise NotImplementedError("real decode wired when codec libs are present")


def fake_dims(n_bytes: int) -> tuple[int, int]:
    """Deterministic stand-in for decoded media dimensions."""
    return 64 + (n_bytes % 960), 64 + ((n_bytes * 7) % 704)


def extract_features(binary_df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload bytes.

    The UDF consumes the REAL bytes per batch (hashes them, measures them)
    and emits stub 'decoded' dimensions — swapping ``fake_dims`` for a real
    decoder is the only change needed when codecs exist.
    """
    import hashlib

    def feats(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            n = payloads.map(len)
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": n,
                    "checksum": payloads.map(lambda b: hashlib.md5(b).hexdigest()),
                    "width": n.map(lambda x: fake_dims(x)[0]),
                    "height": n.map(lambda x: fake_dims(x)[1]),
                }
            )

    return binary_df.mapInPandas(
        feats,
        schema="doc_id long, mime string, n_bytes long, checksum string, "
        "width long, height long",
    )


def sample_frames(binary_df: DataFrame, frame_stride: int = 4096, max_frames: int = 5) -> DataFrame:
    """Frame sampling for 'video' payloads: one output row per sampled
    frame, fanned out INSIDE the Arrow batch iterator (no driver-side
    explode, no per-row Python lists crossing the boundary)."""

    def frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_idx": [], "byte_offset": [], "frame_bytes": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n_frames = min(len(payload) // frame_stride + 1, max_frames)
                for i in range(n_frames):
                    off = i * frame_stride
                    out["doc_id"].append(doc_id)
                    out["frame_idx"].append(i)
                    out["byte_offset"].append(off)
                    out["frame_bytes"].append(len(payload[off : off + frame_stride]))
            yield pd.DataFrame(out)

    return binary_df.filter(F.col("mime") == "video/mp4").mapInPandas(
        frames,
        schema="doc_id long, frame_idx int, byte_offset long, frame_bytes long",
    )


def resize_media(binary_df: DataFrame, target: int = 224) -> DataFrame:
    """Aspect-preserving resize-to-fit plan for decoded media.

    Decode is stubbed (``fake_dims``), the resize geometry + Arrow batch
    shape are real: per batch, vectorized numpy computes the scale to fit
    a ``target``×``target`` box and the resulting dimensions. Swapping in
    a real decoder/resampler changes only the two marked lines — the
    Spark-side contract (binary in, typed row out, no driver round-trip)
    stays."""
    import numpy as np

    def resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = pdf["payload"].map(len).to_numpy()
            w = 64 + (n % 960)            # stub decode: fake_dims
            h = 64 + ((n * 7) % 704)      # stub decode: fake_dims
            scale = np.minimum(target / w, target / h)
            new_w = np.maximum(1, np.floor(w * scale)).astype("int64")
            new_h = np.maximum(1, np.floor(h * scale)).astype("int64")
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "width": w,
                    "height": h,
                    "new_width": new_w,
                    "new_height": new_h,
                    "scale": scale,
                }
            )

    return binary_df.mapInPandas(
        resize,
        schema="doc_id long, mime string, width long, height long, "
        "new_width long, new_height long, scale double",
    )
