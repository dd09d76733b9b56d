"""Multimodal columns: binary payloads + typed metadata, processed by
Arrow-batched Pandas UDFs over ``mapInPandas``.

Design (per the engine's training-pipeline charter): image/audio/video
are opaque ``binary`` columns beside a metadata struct. Decode /
feature-extraction run as ``mapInPandas`` stages so each Arrow batch
crosses the Python boundary once; partitioning is inherited, so a
100-TB corpus processes embarrassingly parallel with no shuffle.

The actual codecs (PIL/ffmpeg/librosa) are NOT in this container —
the decode kernel is stubbed: ``decode_stub=True`` (default) derives
deterministic fake features from the bytes (so the plumbing — schema,
batching, partition behavior — is fully testable); ``decode_stub=
False`` raises NotImplementedError where the real library call goes.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width: int, height: int, sample_rate: int, duration_ms: int>"
)

FEATURE_SCHEMA = "media_id long, kind string, n_bytes int, feature array<float>"


def make_media_table(df: DataFrame, id_col: str, payload_col, kind: str) -> DataFrame:
    """Wrap an arbitrary column as a media table (payload cast to binary)."""
    return df.select(
        F.col(id_col).alias("media_id"),
        F.lit(kind).alias("kind"),
        payload_col.cast("binary").alias("payload"),
        F.expr(
            "named_struct('width', CAST(NULL AS INT), 'height', CAST(NULL AS INT), "
            "'sample_rate', CAST(NULL AS INT), 'duration_ms', CAST(NULL AS INT))"
        ).alias("meta"),
    )


def _stub_feature(payload: bytes, dim: int) -> list[float]:
    """Deterministic fake embedding: sha256-seeded values in [-1, 1)."""
    out = []
    h = hashlib.sha256(payload if payload is not None else b"")
    buf = b""
    while len(out) < dim:
        buf = hashlib.sha256(buf + h.digest()).digest()
        for i in range(0, len(buf) - 1, 2):
            if len(out) >= dim:
                break
            v = int.from_bytes(buf[i : i + 2], "big")
            out.append((v - 32768) / 32768.0)
    return out


def extract_features(
    media: DataFrame, dim: int = 16, decode_stub: bool = True, batch_size_hint: int = 0
) -> DataFrame:
    """Decode + featurize each payload via mapInPandas (Arrow batches).

    Real implementation point: replace ``_stub_feature`` with the
    codec call (PIL decode → resize → model features, etc.). The Spark
    side — schema, batch iteration, no shuffle — is production-shaped
    either way.
    """

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not decode_stub:
                raise NotImplementedError(
                    "real media decode requires PIL/ffmpeg/librosa (not in container); "
                    "run with decode_stub=True for the deterministic fake kernel"
                )
            feats = [_stub_feature(p, dim) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": [len(p) if p is not None else 0 for p in pdf["payload"]],
                    "feature": feats,
                }
            )

    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: one output row per frame timestamp
    (explode of a generated sequence) — the decode of each frame is an
    extract_features call downstream. Pure column algebra, no UDF."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    ts = F.sequence(F.lit(0), F.greatest(dur - 1, F.lit(0)), F.lit(every_ms))
    return media.filter(F.col("kind") == "video").select(
        "media_id", F.explode(ts).alias("frame_ms")
    )
