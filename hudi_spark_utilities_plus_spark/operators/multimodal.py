"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (100 TB): image/audio/video payloads ride as ``binary`` columns
with a typed metadata struct alongside (mime, n_bytes, checksum). Decode
/ feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages — Python touches each batch once, vectorized;
partitioning is by payload row-group, so a 1000-executor cluster decodes
embarrassingly parallel.

The actual codec calls are STUBBED in this environment (no image/audio
libs in the container): ``decode_image``/``decode_audio`` raise
``NotImplementedError`` unless a deterministic fake decoder is requested.
The Spark-side plumbing — schema, batch iteration, UDF signatures — is
real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Metadata struct carried with every payload column.
MEDIA_META_SCHEMA = "mime STRING, n_bytes BIGINT, sha256 STRING"

FEATURE_SCHEMA = (
    "doc_id BIGINT, n_bytes BIGINT, payload_sha STRING, width INT, height INT"
)


def attach_payload(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Materialize an opaque binary payload column (+ metadata struct)
    from a source column. In production this is the raw media read; here
    the deterministic stand-in payload is the UTF-8 encoding."""
    payload = F.col(text_col).cast("binary")
    return df.select(
        F.col(id_col),
        payload.alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.octet_length(payload).cast("bigint").alias("n_bytes"),
            F.sha2(payload, 256).alias("sha256"),
        ).alias("media_meta"),
    )


def decode_image(payload: bytes) -> "object":
    """Real decoder entry point — image libs absent in this container."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; use fake_decode_dims for deterministic testing"
    )


def fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode': derive (width, height) from the
    payload checksum — stable stand-in for codec metadata extraction."""
    h = hashlib.sha256(payload).digest()
    return (int.from_bytes(h[:2], "big") % 1920 + 1,
            int.from_bytes(h[2:4], "big") % 1080 + 1)


def extract_features(df_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over payload batches.

    mapInPandas: each Arrow batch crosses the JVM→Python boundary once;
    per-row work is plain bytes hashing (vectorized-enough for the stub;
    a real decoder slots into the same loop)."""

    # Self-contained closure (stdlib-only refs): cloudpickle ships it by
    # value, so executors don't need this package importable.
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def _dims(raw: bytes) -> tuple[int, int]:
            h = _hl.sha256(raw).digest()
            return (
                int.from_bytes(h[:2], "big") % 1920 + 1,
                int.from_bytes(h[2:4], "big") % 1080 + 1,
            )

        for pdf in batches:
            payloads = [bytes(p) for p in pdf["payload"]]
            dims = [_dims(p) for p in payloads]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "payload_sha": [_hl.sha256(p).hexdigest() for p in payloads],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df_with_payload.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_media(
    df_with_payload: DataFrame, target_w: int = 224, target_h: int = 224
) -> DataFrame:
    """Resize plumbing: aspect-preserving fit of the (fake-)decoded
    dimensions into a target box, plus a deterministic stand-in for the
    resampled payload (byte budget ∝ output area). A real resampler
    slots into the same Arrow-batched mapInPandas loop — the schema,
    batch shape, and scale math are the production plumbing."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl

        import pandas as _pd

        def _dims(raw: bytes) -> tuple[int, int]:
            h = _hl.sha256(raw).digest()
            return (
                int.from_bytes(h[:2], "big") % 1920 + 1,
                int.from_bytes(h[2:4], "big") % 1080 + 1,
            )

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "in_w": [], "in_h": [],
                "out_w": [], "out_h": [], "resized": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                in_w, in_h = _dims(raw)
                scale = min(target_w / in_w, target_h / in_h)
                out_w = max(1, int(in_w * scale))
                out_h = max(1, int(in_h * scale))
                budget = max(1, out_w * out_h // 256)
                out["doc_id"].append(doc_id)
                out["in_w"].append(in_w)
                out["in_h"].append(in_h)
                out["out_w"].append(out_w)
                out["out_h"].append(out_h)
                out["resized"].append(raw[:budget])
            yield _pd.DataFrame(out)

    return df_with_payload.mapInPandas(
        gen,
        schema="doc_id BIGINT, in_w INT, in_h INT, out_w INT, out_h INT, "
        "resized BINARY",
    )


def sample_frames(
    df_with_payload: DataFrame, every_n_bytes: int = 64, max_frames: int = 8
) -> DataFrame:
    """Frame-sampling plumbing: emit ≤max_frames fixed-stride 'frames'
    (byte slices) per payload — one output row per frame, the shape a
    video pipeline needs (explode on the Python side of mapInPandas)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        for pdf in batches:
            out: dict[str, list] = {"doc_id": [], "frame_no": [], "frame": []}
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload)
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame"].append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield _pd.DataFrame(out)

    return df_with_payload.mapInPandas(
        gen, schema="doc_id BIGINT, frame_no INT, frame BINARY"
    )
