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
    # raw double mean (sum/len, ONE float rounding): a decimal re-round
    # here would diverge from any SQL replay (Python round() is
    # banker's; engines' round() is half-up) — quantization belongs to
    # the caller (q43 emits micros-bigint)
    mean = sum(payload) / len(payload) if len(payload) else 0.0
    return {"feat_mean": mean, "feat_head": arr}


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

    # ship ONLY the columns the function reads across the Python
    # boundary — Spark cannot see inside an opaque mapInPandas, so an
    # unprojected frame would move (and defeat scan pruning for) every
    # other column, e.g. binarize's meta struct (optimization guide
    # §4.1; r6 opt)
    return df.select("media_id", "payload").mapInPandas(run, FRAME_SCHEMA)


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

    # explicit projection: this op DOES read meta (mime/n_bytes), but
    # callers may pass wider frames — name the boundary columns (§4.1)
    return df.select("media_id", "payload", "meta").mapInPandas(run, FEATURE_SCHEMA)


THUMB_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("thumb", T.BinaryType()),
        T.StructField("thumb_bytes", T.LongType()),
        T.StructField("thumb_md5", T.StringType()),
    ]
)


def thumbnail(df: DataFrame, stride: int = 7, decode_stub: bool = True) -> DataFrame:
    """Resize/thumbnail plumbing (the image path): produce a reduced
    payload per media row — the stub 'resampler' is byte decimation
    (every `stride`-th byte), a real one swaps in PIL's resize with the
    SAME (id, thumb, thumb_bytes, thumb_md5) output contract.

    Scale shape: one mapInPandas pass; thumbnails (small) are the only
    thing that moves downstream — e.g. into md5-keyed near-dup grouping
    — while full payloads stay in the scan."""
    import hashlib

    if not decode_stub:
        raise NotImplementedError(
            "real image resizing needs PIL/libvips, absent in this "
            "environment; pass decode_stub=True or plug a resizer in"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "thumb": [], "thumb_bytes": [], "thumb_md5": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                th = bytes(payload[::stride])
                out["media_id"].append(mid)
                out["thumb"].append(th)
                out["thumb_bytes"].append(len(th))
                out["thumb_md5"].append(hashlib.md5(th).hexdigest())
            yield pd.DataFrame(out)

    # boundary projection, same reasoning as frame_sample (§4.1)
    return df.select("media_id", "payload").mapInPandas(run, THUMB_SCHEMA)


ENERGY_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("win_idx", T.LongType()),
        T.StructField("win_bytes", T.LongType()),
        T.StructField("energy", T.LongType()),
    ]
)


def windowed_energy(
    df: DataFrame, win: int = 128, hop: int = 64, decode_stub: bool = True
) -> DataFrame:
    """Windowed-energy plumbing (the audio path): overlapping windows
    of `win` bytes at `hop` spacing, each emitting an integer energy
    (sum of byte values) — the stub for an RMS/spectrogram frontend; a
    real one swaps in librosa/ffmpeg with the SAME (id, win_idx, ...)
    contract. Integer energies make the whole pipeline oracle-checkable.

    Same 100 TB shape as frame_sample: one mapInPandas pass, payloads
    never collected, per-window METADATA is the output."""
    if not decode_stub:
        raise NotImplementedError(
            "real audio decoding needs librosa/ffmpeg, absent in this "
            "environment; pass decode_stub=True or plug a frontend in"
        )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {"media_id": [], "win_idx": [], "win_bytes": [], "energy": []}
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                if payload is None:
                    continue
                # ceil tail coverage: every byte lands in >=1 window
                n_wins = (max(len(payload) - win, 0) + hop - 1) // hop + 1 if len(payload) else 0
                for k in range(n_wins):
                    chunk = payload[k * hop : k * hop + win]
                    out["media_id"].append(mid)
                    out["win_idx"].append(k)
                    out["win_bytes"].append(len(chunk))
                    out["energy"].append(int(sum(chunk)))
            yield pd.DataFrame(out)

    # boundary projection, same reasoning as frame_sample (§4.1)
    return df.select("media_id", "payload").mapInPandas(run, ENERGY_SCHEMA)
