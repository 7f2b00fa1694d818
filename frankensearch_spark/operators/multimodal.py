"""Multimodal column plumbing: opaque binary payloads + typed metadata.

A large-scale training-data pipeline treats image/audio/video as opaque
``binary`` columns with typed metadata, decoded/featurized inside
Arrow-batched ``mapInPandas`` kernels.  The image/audio codec libraries
are not in this container, so the DECODE step is a clearly marked stub
(deterministic fake features derived from the bytes); everything
Spark-side — schemas, batch shapes, partitioning, UDF signatures — is
real and tested, and a real decoder drops into ``_decode_stub`` without
touching the plumbing.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "declared_mime string, n_bytes long"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, n_bytes long, sha256 string, "
    "width int, height int, n_frames int, embedding array<float>"
)


def media_from_documents(docs: DataFrame, kind: str = "image") -> DataFrame:
    """Adapter: wrap a text table's bytes as opaque media payloads (the
    sandbox has no real image corpus; payload bytes are the UTF-8 text)."""
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode("text", "utf-8").alias("payload"),
        F.lit("application/octet-stream").alias("declared_mime"),
        F.octet_length("text").cast("long").alias("n_bytes"),
    )


def _decode_stub(payload: bytes, kind: str) -> dict:
    """STUB decoder — deterministic fake features from the bytes.

    Replace with PIL/ffmpeg/torchaudio in a real deployment; the stub
    raises for unknown kinds exactly like a real decoder would.
    """
    if kind not in ("image", "audio", "video"):
        raise NotImplementedError(f"no decoder for media kind {kind!r}")
    digest = hashlib.sha256(payload).digest()
    width = 1 + digest[0] % 64
    height = 1 + digest[1] % 64
    n_frames = 1 if kind == "image" else 1 + digest[2] % 32
    rng = np.frombuffer(digest, dtype=np.uint8).astype(np.float32)
    emb = (rng[:16] / np.float32(255.0)).astype(np.float32)
    return {
        "sha256": digest.hex(),
        "width": int(width),
        "height": int(height),
        "n_frames": int(n_frames),
        "embedding": emb,
    }


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched decode/feature kernel over opaque payloads.

    One ``mapInPandas`` pass; the per-row work is the (stubbed) decoder.
    Partitioning: payloads stay where they are — no shuffle; feature
    extraction is embarrassingly parallel over input splits.
    """

    def run(batches):
        for pdf in batches:
            rows = []
            for mid, kind, payload, nb in zip(
                pdf["media_id"], pdf["kind"], pdf["payload"], pdf["n_bytes"]
            ):
                if payload is None:
                    # a null source row (e.g. null text upstream) is not
                    # decodable media — skip it instead of killing the
                    # whole stage on bytes(None)
                    continue
                feat = _decode_stub(bytes(payload), kind)
                rows.append(
                    {
                        "media_id": mid,
                        "kind": kind,
                        "n_bytes": nb,
                        "sha256": feat["sha256"],
                        "width": feat["width"],
                        "height": feat["height"],
                        "n_frames": feat["n_frames"],
                        "embedding": feat["embedding"],
                    }
                )
            yield pd.DataFrame(rows)

    return media.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 4) -> DataFrame:
    """Frame-sampling plumbing for video payloads: one output row per
    sampled frame index (the decode itself is the stub)."""
    feats = extract_features(media.filter(F.col("kind") == "video"))
    return feats.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
        "sha256",
    )


def resize_metadata(media: DataFrame, max_side: int = 32) -> DataFrame:
    """Resize planning: target dims preserving aspect ratio (metadata-only
    — the pixel op lives behind the decode stub)."""
    feats = extract_features(media)
    scale = F.least(
        F.lit(1.0),
        F.lit(float(max_side)) / F.greatest("width", "height").cast("double"),
    )
    return feats.select(
        "media_id",
        "width",
        "height",
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)).alias(
            "target_width"
        ),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1)).alias(
            "target_height"
        ),
    )
