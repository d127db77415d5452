"""Multimodal column handling: opaque binary payloads + typed metadata.

Design (100 TB): image/audio/video payloads ride as ``binary`` columns
with a typed metadata struct alongside (mime, n_bytes, checksum). Decode
/ feature-extraction / resize / frame-sampling run as Arrow-batched
``mapInPandas`` stages — Python touches each batch once, vectorized;
partitioning is by payload row-group, so a 1000-executor cluster decodes
embarrassingly parallel.

Codec strategy: the REAL decode path (Pillow) sits behind a guarded
import — when PIL is installed, ``decode_image``/``decode_dims`` decode
actual image bytes and ``resize_media`` re-encodes real resampled
pixels; when it isn't (this container), or when a payload isn't
decodable media, they fall back to the deterministic stand-in
(``fake_decode_dims``: dims from the payload checksum). The driver
oracles pin the STAND-IN contract — their payloads are UTF-8 text, never
decodable images, so their results are identical with or without PIL —
while a real deployment with Pillow installed gets real decoding through
the same plumbing. The Spark-side plumbing — schema, batch iteration,
UDF signatures — is real and tested either way.
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
    """Real decoder entry point: a PIL Image when Pillow is installed.

    Raises ``NotImplementedError`` when no imaging library is present
    (this container), and lets PIL's own error propagate for payloads
    that aren't decodable images — callers wanting a total function use
    ``decode_dims``."""
    try:
        from PIL import Image
    except ImportError:
        raise NotImplementedError(
            "image decoding requires Pillow, not present in this "
            "environment; use decode_dims/fake_decode_dims for "
            "deterministic fallback behavior"
        ) from None
    import io

    return Image.open(io.BytesIO(payload))


def fake_decode_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic fake 'decode': derive (width, height) from the
    payload checksum — stable stand-in for codec metadata extraction."""
    h = hashlib.sha256(payload).digest()
    return (int.from_bytes(h[:2], "big") % 1920 + 1,
            int.from_bytes(h[2:4], "big") % 1080 + 1)


def decode_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) of a payload — total function.

    Real PIL decode when Pillow is importable AND the bytes are a
    decodable image; the deterministic checksum stand-in otherwise. The
    driver oracles feed UTF-8 text payloads, so they always take (and
    pin) the stand-in branch regardless of whether PIL is installed."""
    try:
        from PIL import Image
    except ImportError:
        return fake_decode_dims(payload)
    import io

    try:
        with Image.open(io.BytesIO(payload)) as im:
            return im.size
    except Exception:
        return fake_decode_dims(payload)


def extract_features(
    df_with_payload: DataFrame, use_codec: bool = True
) -> DataFrame:
    """Arrow-batched feature extraction over payload batches.

    mapInPandas: each Arrow batch crosses the JVM→Python boundary once;
    per-row work is plain bytes hashing (vectorized-enough for the stub;
    a real decoder slots into the same loop). ``use_codec=False`` pins
    the checksum stand-in dims even with Pillow installed — the
    driver-oracle contract (PIL's PPM/XBM plugins can decode some
    plain-ASCII payloads, so text-ness alone doesn't pin the branch)."""

    # Self-contained closure (stdlib-only refs): cloudpickle ships it by
    # value, so executors don't need this package importable. Mirrors
    # decode_dims: guarded PIL import, checksum stand-in fallback.
    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import io as _io

        import pandas as _pd

        _Img = None
        if use_codec:
            try:
                from PIL import Image as _Img
            except ImportError:
                _Img = None

        def _dims(raw: bytes, h: bytes) -> tuple[int, int]:
            if _Img is not None:
                try:
                    with _Img.open(_io.BytesIO(raw)) as im:
                        return im.size
                except Exception:
                    pass  # not decodable media — stand-in below
            return (
                int.from_bytes(h[:2], "big") % 1920 + 1,
                int.from_bytes(h[2:4], "big") % 1080 + 1,
            )

        for pdf in batches:
            # NULL payloads ride as empty bytes (total per-row behavior:
            # bytes(None) would kill the whole task); the sha-256 digest
            # is computed ONCE per payload and reused for both the
            # stand-in dims and the hex fingerprint — hashing is the
            # dominant per-byte cost of this operator
            payloads = [
                bytes(p) if p is not None else b"" for p in pdf["payload"]
            ]
            digs = [_hl.sha256(p) for p in payloads]
            dims = [
                _dims(p, d.digest()) for p, d in zip(payloads, digs)
            ]
            yield _pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in payloads],
                    "payload_sha": [d.hexdigest() for d in digs],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                }
            )

    return df_with_payload.mapInPandas(gen, schema=FEATURE_SCHEMA)


def resize_media(
    df_with_payload: DataFrame,
    target_w: int = 224,
    target_h: int = 224,
    use_codec: bool = True,
) -> DataFrame:
    """Resize: aspect-preserving fit of the decoded dimensions into a
    target box. With Pillow installed and a decodable payload this is a
    REAL resample (PIL resize, re-encoded bytes out); otherwise the
    deterministic stand-in (checksum dims, byte budget ∝ output area).
    Both branches share the Arrow-batched mapInPandas loop and scale
    math — the production plumbing is identical.

    The ENTIRE real branch (decode, resize, re-encode) is guarded: a
    payload PIL can open but not re-encode (PSD/DDS and other read-only
    formats), or any other codec error, falls back to the stand-in for
    that row instead of failing the Spark task — the operator is total.
    ``use_codec=False`` pins the stand-in branch regardless of whether
    Pillow is installed — the driver-oracle contract (some plain-ASCII
    payloads ARE decodable images to PIL's PPM/XBM plugins, so 'text
    payload' alone does not guarantee the stand-in branch)."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import hashlib as _hl
        import io as _io

        import pandas as _pd

        _Img = None
        if use_codec:
            try:
                from PIL import Image as _Img
            except ImportError:
                _Img = None

        def _fake_dims(raw: bytes) -> tuple[int, int]:
            h = _hl.sha256(raw).digest()
            return (
                int.from_bytes(h[:2], "big") % 1920 + 1,
                int.from_bytes(h[2:4], "big") % 1080 + 1,
            )

        def _fit(in_w: int, in_h: int) -> tuple[int, int]:
            # Aspect-preserving fit with the BOUND side exactly at the
            # target, computed in pure integers: the float form
            # int(in_w * min(tw/in_w, th/in_h)) truncated products like
            # 223.99999999999997 to 223, so the fitted dimension came
            # out target-1 for ~9% of input widths — a 224-fit contract
            # that emits 223-px images. Width binds iff
            # tw*in_h <= th*in_w (integer-exact cross-multiply).
            if target_w * in_h <= target_h * in_w:
                return target_w, max(1, (in_h * target_w) // in_w)
            return max(1, (in_w * target_h) // in_h), target_h

        def _fake_resize(raw: bytes) -> tuple[int, int, int, int, bytes]:
            in_w, in_h = _fake_dims(raw)
            out_w, out_h = _fit(in_w, in_h)
            return in_w, in_h, out_w, out_h, raw[: max(1, out_w * out_h // 256)]

        for pdf in batches:
            out: dict[str, list] = {
                "doc_id": [], "in_w": [], "in_h": [],
                "out_w": [], "out_h": [], "resized": [],
            }
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                row = None
                if _Img is not None:
                    try:
                        with _Img.open(_io.BytesIO(raw)) as im:
                            im.load()
                            in_w, in_h = im.size
                            out_w, out_h = _fit(in_w, in_h)
                            buf = _io.BytesIO()
                            fmt = im.format or "PNG"
                            try:
                                im.resize((out_w, out_h)).save(buf, format=fmt)
                            except Exception:
                                # read-only format (PSD/DDS/...): PIL
                                # decodes but has no save handler
                                buf = _io.BytesIO()
                                im.resize((out_w, out_h)).convert("RGB").save(
                                    buf, format="PNG"
                                )
                            row = (in_w, in_h, out_w, out_h, buf.getvalue())
                    except Exception:
                        row = None  # not decodable media — stand-in
                if row is None:
                    row = _fake_resize(raw)
                out["doc_id"].append(doc_id)
                out["in_w"].append(row[0])
                out["in_h"].append(row[1])
                out["out_w"].append(row[2])
                out["out_h"].append(row[3])
                out["resized"].append(row[4])
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
                raw = bytes(payload) if payload is not None else b""
                for i in range(min(max_frames, max(1, len(raw) // every_n_bytes))):
                    out["doc_id"].append(doc_id)
                    out["frame_no"].append(i)
                    out["frame"].append(raw[i * every_n_bytes : (i + 1) * every_n_bytes])
            yield _pd.DataFrame(out)

    return df_with_payload.mapInPandas(
        gen, schema="doc_id BIGINT, frame_no INT, frame BINARY"
    )


AUDIO_ENERGY_SCHEMA = (
    "doc_id BIGINT, window_idx BIGINT, n_samples BIGINT, energy BIGINT"
)


def audio_window_energy(
    df_with_payload: DataFrame, window: int = 64
) -> DataFrame:
    """Audio-pipeline windowed feature extraction: the payload decodes to
    a sample stream and each fixed-size window emits one energy row
    (sum of squared samples) — the exact shape a real PCM loudness /
    VAD / silence-trim stage takes, including the one-to-many explode
    (each payload row becomes n_windows feature rows on the Python side
    of mapInPandas).

    Codec stand-in: samples are the payload's UTF-32 code units
    (vectorized ``np.frombuffer`` — no per-sample Python loop), exactly
    reproducible cross-engine; a real deployment swaps the decode line
    for ``soundfile``/ffmpeg PCM and keeps every other line. Energy is
    summed in int64 (code points ≤ 0x10FFFF, 64/window → far inside
    exact-float and int64 range), so the contract is repr-exact.

    Scale: Arrow-batched, embarrassingly parallel per payload; output
    partitioning inherits the input's — no shuffle."""
    import numpy as np

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, widx, ns, energy = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    s = bytes(payload).decode("utf-8", errors="strict")
                except UnicodeDecodeError:
                    # undecodable payload (real binary audio reaching the
                    # stand-in decode): total per-row behavior is to emit
                    # no windows, never to fail the Spark task — a real
                    # deployment swaps in soundfile/ffmpeg here
                    continue
                cp = np.frombuffer(
                    s.encode("utf-32-le"), dtype="<u4"
                ).astype("int64")
                n = len(cp)
                if n == 0:
                    continue
                # windows are CONTIGUOUS runs of `window` samples, so
                # add.reduceat on int64 boundaries sums each window
                # exactly in int64 — np.bincount(weights=...) accumulates
                # in float64, which silently rounds once a window's
                # energy exceeds 2^53 (~7.3k max-codepoint samples),
                # breaking the repr-exact contract for large windows
                bounds = np.arange(0, n, window)
                e = np.add.reduceat(cp * cp, bounds)
                c = np.diff(np.append(bounds, n))
                nw = len(bounds)
                ids.extend([doc_id] * nw)
                widx.extend(range(nw))
                ns.extend(int(x) for x in c)
                energy.extend(int(x) for x in e)
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "window_idx": pd.Series(widx, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "energy": pd.Series(energy, dtype="int64"),
                }
            )

    return df_with_payload.select("doc_id", "payload").mapInPandas(
        gen, AUDIO_ENERGY_SCHEMA
    )
