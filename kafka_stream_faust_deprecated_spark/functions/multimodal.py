"""Multimodal column plumbing (SURVEY.md §2b E26).

Model: media lives in opaque ``binary`` payload columns next to typed
metadata (mime, byte length, content hash); decode / feature-extract /
resize / frame-sample run as Arrow-batched Python over ``mapInPandas``.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode step is stubbed: ``decode_media`` raises
``NotImplementedError`` unless ``fake=True``, in which case it emits a
deterministic md5-derived pseudo-feature. Everything Spark-side —
schema, batch iteration, partitioning, output contract — is real and
tested; swapping in a real codec touches only ``_fake_feature``.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Output contract of the extraction pass.
EXTRACT_SCHEMA = (
    "doc_id long, mime string, n_bytes long, content_hash string, feature array<double>"
)

FEATURE_DIM = 4


def _fake_feature(payload: bytes) -> list[float]:
    """Deterministic stand-in for a real embedding: first bytes of the
    content digest, scaled to [0, 1)."""
    digest = hashlib.md5(payload).digest()
    return [b / 256.0 for b in digest[:FEATURE_DIM]]


def decode_media(payload: bytes, mime: str, fake: bool = False) -> list[float]:
    """Decode one media payload into a feature vector.

    Real decoders (image resize, audio resample, video frame-sample) are
    not available in this environment; gate them explicitly instead of
    failing deep inside an executor.
    """
    if fake:
        return _fake_feature(payload)
    raise NotImplementedError(
        f"no codec for {mime!r} in this environment; run with fake=True "
        "or install a decoder and replace decode_media"
    )


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Treat a text column as the opaque binary payload + typed metadata
    — the same shape an image/audio table would have."""
    return docs.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("text/plain").alias("mime"),
    )


def extract_features(media: DataFrame, fake: bool = True) -> DataFrame:
    """Arrow-batched decode + feature extraction over binary payloads.

    ``mapInPandas`` keeps the existing partitioning (no shuffle) and
    streams pandas batches through Python once — the only sane shape for
    a 100 TB binary-column scan. Output rows are 1:1 with input.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = pdf["payload"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "n_bytes": payloads.map(len),
                    "content_hash": payloads.map(
                        lambda b: hashlib.md5(bytes(b)).hexdigest()
                    ),
                    "feature": payloads.map(
                        lambda b: decode_media(bytes(b), "text/plain", fake=fake)
                    ),
                }
            )

    return media.mapInPandas(run, schema=EXTRACT_SCHEMA)


#: resize: 1 row in -> 1 row out, payload replaced, dims recorded.
RESIZE_SCHEMA = (
    "doc_id long, mime string, payload binary, width int, height int"
)

#: frame-sample: 1 row in -> N rows out (one per sampled frame).
FRAME_SCHEMA = (
    "doc_id long, mime string, frame_idx int, frame_payload binary, frame_hash string"
)


def resize_media(
    media: DataFrame, width: int = 64, height: int = 64, fake: bool = True
) -> DataFrame:
    """Row-preserving transform (resize / resample): payload in, payload
    out, target dims recorded. The fake codec truncates-or-pads the
    payload to width*height bytes deterministically — the real one is a
    PIL/ffmpeg call with the SAME batch shape, so swapping it in touches
    no Spark code. ``mapInPandas`` over existing partitions: no shuffle,
    1:1 rows, bounded memory per batch."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no resize codec in this environment; run with fake=True"
                )
            out = [
                bytes(b)[:target].ljust(target, b"\0") for b in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "mime": pdf["mime"],
                    "payload": out,
                    "width": width,
                    "height": height,
                }
            )

    return media.mapInPandas(run, schema=RESIZE_SCHEMA)


def sample_frames(
    media: DataFrame, n_frames: int = 3, fake: bool = True
) -> DataFrame:
    """Row-expanding transform (video frame-sampling): each payload
    yields ``n_frames`` evenly-spaced chunks as standalone rows — the
    shape for frame-level feature pipelines. The fan-out is bounded
    (n_frames per input row), stays partition-local, and downstream
    per-frame ops parallelize over the expanded rows."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "no frame decoder in this environment; run with fake=True"
                )
            rows = []
            for doc_id, mime, b in zip(pdf["doc_id"], pdf["mime"], pdf["payload"]):
                raw = bytes(b)
                step = max(1, len(raw) // n_frames)
                for k in range(n_frames):
                    chunk = raw[k * step : (k + 1) * step]
                    rows.append(
                        (doc_id, mime, k, chunk, hashlib.md5(chunk).hexdigest())
                    )
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "mime", "frame_idx", "frame_payload", "frame_hash"],
            )

    return media.mapInPandas(run, schema=FRAME_SCHEMA)
