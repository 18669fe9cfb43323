"""Multimodal columns: image/audio/video as opaque binary + typed
metadata, with decode/feature steps as Arrow-batched pandas functions.

The Spark-side plumbing is real and tested — BinaryType columns,
metadata structs, mapInPandas batch iterators with explicit output
schemas, partition sizing — while the actual media decode is stubbed
(this container has no image/audio libs): ``decode_stub=True`` swaps
in a deterministic fake extractor so the pipeline shape is fully
exercisable; wiring a real decoder is replacing ONE pandas function.

At 100 TB the pattern is: binary payloads stay in executor-local Arrow
batches (never collected), metadata-only predicates prune before any
decode, and `spark.sql.files.maxPartitionBytes` bounds batch memory.
"""
from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType()),
                    T.StructField("n_bytes", T.LongType()),
                    T.StructField("source", T.StringType()),
                ]
            ),
        ),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("mime", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_head", T.ArrayType(T.LongType())),
    ]
)


def binarize(df: DataFrame, id_col: str, payload_text_col: str, source_col: str, mime: str = "application/octet-stream") -> DataFrame:
    """Build a multimodal table from any text column: payload becomes a
    real BinaryType column with a typed metadata struct — the schema
    every downstream media op consumes."""
    payload = F.encode(F.col(payload_text_col), "UTF-8")
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        payload.alias("payload"),
        F.struct(
            F.lit(mime).alias("mime"),
            F.length(payload).cast("long").alias("n_bytes"),
            F.col(source_col).alias("source"),
        ).alias("meta"),
    )


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a media decoder: byte-level stats.
    A real pipeline replaces this one function with PIL/ffmpeg/etc."""
    if payload is None:
        return {"feat_mean": None, "feat_head": None}
    arr = list(payload[:8])
    mean = sum(payload) / len(payload) if len(payload) else 0.0
    return {"feat_mean": round(mean, 6), "feat_head": arr}


FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("frame_idx", T.LongType()),
        T.StructField("frame_hash", T.StringType()),
        T.StructField("frame_bytes", T.LongType()),
    ]
)


def frame_sample(
    df: DataFrame, frame_size: int = 256, every_nth: int = 4, decode_stub: bool = True
) -> DataFrame:
    """Frame sampling over binary payloads (the video/audio keyframe
    pattern): split each payload into fixed-size frames, keep every
    Nth, emit per-frame metadata + content hash. The stub 'decoder' is
    byte slicing — a real one swaps in ffmpeg keyframe extraction with
    the SAME (id, frame_idx, ...) output contract.

    Spark shape that survives 100 TB: one mapInPandas pass, payloads
    never leave the executors, output is per-frame METADATA (small)
    rather than frames themselves; downstream joins/dedup work on
    hashes."""
    import hashlib

    if not decode_stub:
        raise NotImplementedError(
            "real frame extraction needs media codecs not present in this "
            "environment; pass decode_stub=True or plug a decoder in"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "frame_idx": [], "frame_hash": [], "frame_bytes": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                n_frames = (len(payload) + frame_size - 1) // frame_size
                for f in range(0, n_frames, every_nth):
                    chunk = payload[f * frame_size : (f + 1) * frame_size]
                    out["media_id"].append(mid)
                    out["frame_idx"].append(f)
                    out["frame_hash"].append(hashlib.md5(chunk).hexdigest())
                    out["frame_bytes"].append(len(chunk))
            yield pd.DataFrame(out)

    return df.mapInPandas(run, FRAME_SCHEMA)


def extract_features(df: DataFrame, decode_stub: bool = True) -> DataFrame:
    """Decode + feature-extract over mapInPandas: Arrow batches in,
    Arrow batches out; payload bytes never leave the executors."""
    if not decode_stub:
        raise NotImplementedError(
            "real media decoding requires image/audio libraries not present "
            "in this environment; pass decode_stub=True or plug a decoder "
            "into _fake_decode's slot"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_decode)
            out = pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "mime": pdf["meta"].map(lambda m: m["mime"] if m is not None else None),
                    "n_bytes": pdf["meta"].map(lambda m: m["n_bytes"] if m is not None else None),
                    "feat_mean": feats.map(lambda f: f["feat_mean"]),
                    "feat_head": feats.map(lambda f: f["feat_head"]),
                }
            )
            yield out

    return df.mapInPandas(run, FEATURE_SCHEMA)
