"""Multimodal columns: opaque binary payloads + typed metadata, processed
by Arrow-batched ``mapInPandas`` kernels.

The pattern a 100 TB training-data pipeline needs: media lives as
``binary`` columns (or object-store pointers) beside typed metadata;
decode / feature-extract / frame-sample run as vectorized pandas kernels
over Arrow batches, never row-at-a-time Python. The image/audio codec
libraries are not available in this environment, so the *codec* call is
stubbed (clearly marked), while everything Spark-side — schema, binary
column handling, batch iteration, kernel signature, partitioning — is real
and oracle-checked.

Payloads here are synthesized deterministically from document text
(``encode(text, 'utf-8')``) so the DuckDB oracle can recompute every
output from the characters (the corpus is ASCII, so byte == codepoint).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame

IMAGE_META_SCHEMA = "doc_id bigint, n_bytes int, width int, height int, checksum int"
FRAME_SCHEMA = "doc_id bigint, n_bytes int, n_frames int, frame_checksum int"
RESIZE_SCHEMA = (
    "doc_id bigint, width int, height int, out_width int, out_height int, "
    "out_bytes int, sample_checksum int"
)
AUDIO_CHUNK_SCHEMA = (
    "doc_id bigint, chunk_ix int, n_samples int, abs_energy bigint"
)

#: stride (bytes) for the frame-sampling stub
FRAME_STRIDE = 16
#: aspect-fit bounding box for the resize stub
RESIZE_MAX_DIM = 16
#: samples per chunk for the audio feature-extract stub
AUDIO_CHUNK_SAMPLES = 64


def with_payload(docs: DataFrame) -> DataFrame:
    """Attach the opaque binary payload + mime metadata.

    In production this column is read straight from parquet/Iceberg
    (binary physical type, no decode at scan); here it is synthesized from
    text. Narrow op.
    """
    return docs.select(
        F.col("doc_id").cast("bigint").alias("doc_id"),
        F.encode(F.col("text"), "utf-8").alias("payload"),
        F.lit("application/x-fake-image").alias("mime"),
    )


def decode_image(payload: bytes) -> "object":
    """REAL image decode — STUB: the codec library (PIL/opencv) is not
    installed in this environment. The Spark plumbing around it
    (:func:`image_metadata`) is real; swap this function for
    ``PIL.Image.open(io.BytesIO(payload))`` in production."""
    raise NotImplementedError(
        "image codec not available in this environment; "
        "use fake_image_meta for the deterministic stand-in"
    )


def fake_image_meta(payload: bytes) -> tuple[int, int, int, int]:
    """Deterministic stand-in for header decode: dimensions from the first
    two bytes, checksum over a strided byte sample."""
    n = len(payload)
    # short payloads: missing header bytes read as 0, matching the DuckDB
    # oracle's substr/ascii semantics (ascii('') = 0) instead of raising
    b0 = payload[0] if n >= 1 else 0
    b1 = payload[1] if n >= 2 else 0
    width = 1 + b0 % 64
    height = 1 + b1 % 64
    checksum = sum(payload[::FRAME_STRIDE]) % 256
    return n, width, height, checksum


def image_metadata(docs: DataFrame) -> DataFrame:
    """mapInPandas kernel: binary payload -> typed image metadata.

    Arrow carries the binary column zero-copy into pandas; the kernel is
    vectorized per batch (one Python call per ~4k rows, not per row).
    Output schema: IMAGE_META_SCHEMA.
    """
    payloads = with_payload(docs)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_image_meta(p) for p in pdf["payload"]]
            out = pd.DataFrame(
                metas, columns=["n_bytes", "width", "height", "checksum"]
            )
            out.insert(0, "doc_id", pdf["doc_id"].values)
            yield out

    return payloads.mapInPandas(kernel, schema=IMAGE_META_SCHEMA)


def frame_samples(docs: DataFrame, stride: int = FRAME_STRIDE) -> DataFrame:
    """mapInPandas kernel: strided frame sampling over the payload (the
    video/audio analog — sample every ``stride``-th byte as a 'frame').

    Output: (doc_id, n_bytes, n_frames, frame_checksum).
    """
    payloads = with_payload(docs)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                sample = p[::stride]
                rows.append((doc_id, len(p), len(sample), sum(sample) % 256))
            yield pd.DataFrame(
                rows, columns=["doc_id", "n_bytes", "n_frames", "frame_checksum"]
            )

    return payloads.mapInPandas(kernel, schema=FRAME_SCHEMA)


def resize_image(docs: DataFrame, max_dim: int = RESIZE_MAX_DIM) -> DataFrame:
    """mapInPandas kernel: aspect-fit resize planning + strided resample.

    The pixel-level resample is the codec stub (swap for
    ``PIL.Image.resize`` in production); everything the Spark layer is
    responsible for is real: dimensions come from the (fake) header
    decode, the target box is integer aspect-fit math
    ``out_w = max(1, w*max_dim // max(w, h))``, and the "resampled"
    payload is a deterministic strided byte sample sized to the target —
    so batch shape, output schema, and the one-pass binary scan are all
    exercised and oracle-checked.

    Output: (doc_id, width, height, out_width, out_height, out_bytes,
    sample_checksum).
    """
    payloads = with_payload(docs)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                n, w, h, _ = fake_image_meta(p)
                m = max(w, h)
                out_w = max(1, w * max_dim // m)
                out_h = max(1, h * max_dim // m)
                out_bytes = out_w * out_h
                stride = max(1, n // out_bytes) if n else 1
                sample = p[::stride][:out_bytes]
                rows.append(
                    (doc_id, w, h, out_w, out_h, len(sample), sum(sample) % 256)
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "doc_id", "width", "height", "out_width", "out_height",
                    "out_bytes", "sample_checksum",
                ],
            )

    return payloads.mapInPandas(kernel, schema=RESIZE_SCHEMA)


def audio_chunks(
    docs: DataFrame, chunk_samples: int = AUDIO_CHUNK_SAMPLES
) -> DataFrame:
    """mapInPandas kernel: 1->N feature extraction over a binary payload.

    Treats the payload as unsigned 8-bit PCM (the decode to real PCM is
    the codec stub), windows it into fixed ``chunk_samples`` chunks and
    emits one row per chunk with an integer energy feature
    ``sum(|s - 128|)`` — the shape of a real audio featurizer (VAD,
    loudness, fingerprinting): one binary scan in, many typed feature
    rows out, numpy-vectorized inside the Arrow batch.

    Output: (doc_id, chunk_ix, n_samples, abs_energy).
    """
    import numpy as np

    payloads = with_payload(docs)

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, ixs, lens, energies = [], [], [], []
            for doc_id, p in zip(pdf["doc_id"], pdf["payload"]):
                s = np.frombuffer(p, dtype=np.uint8).astype(np.int64)
                for c in range(0, max(len(s), 1), chunk_samples):
                    w = s[c : c + chunk_samples]
                    ids.append(doc_id)
                    ixs.append(c // chunk_samples)
                    lens.append(len(w))
                    energies.append(int(np.abs(w - 128).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "chunk_ix": pd.Series(ixs, dtype="int32"),
                    "n_samples": pd.Series(lens, dtype="int32"),
                    "abs_energy": pd.Series(energies, dtype="int64"),
                }
            )

    return payloads.mapInPandas(kernel, schema=AUDIO_CHUNK_SCHEMA)
