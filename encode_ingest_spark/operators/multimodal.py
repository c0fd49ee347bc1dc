"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with a typed metadata struct
alongside; all heavy per-item work runs as Arrow-batched pandas iterators
(``mapInPandas``) so bytes never round-trip through Python row objects.

The actual codecs (PIL/librosa/ffmpeg) are NOT in this environment, so the
decode kernels are stubbed two ways, per the brief:
* ``decode_stub='raise'`` → NotImplementedError naming the missing lib —
  the production wiring point.
* ``decode_stub='fake'``  → a deterministic fake decoder (md5-derived
  pixel stats / frame samples) — keeps the Spark-side plumbing (schema,
  batch shape, partitioning) real and testable.

A real codec drops in with ZERO plumbing changes through the decoder
registry: ``register_decoder("pil", fn)`` where ``fn(payload: bytes,
kind: str) -> (mean, std, dim)``; then ``extract_features(media,
decode_stub="pil")``. The resolved callable is captured in the kernel
closure and cloudpickled by value — workers need no package imports.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int, mime:string>"
)

FEATURE_SCHEMA = (
    "media_id long, kind string, feat_mean double, feat_std double, "
    "feat_dim int, decoder string"
)


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table: payload bytes = repeated md5 of
    (seed, id); metadata consistent with kind. Column-expression only."""
    df = spark.range(0, n)
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("id") % 3 + 1).cast("int"),
    )
    payload = F.to_binary(
        F.repeat(F.md5(F.concat(F.lit(str(seed)), F.col("id").cast("string"))), 8),
        F.lit("hex"),
    )
    meta = F.struct(
        F.when(kind != "audio", ((F.col("id") % 16 + 1) * 64).cast("int")).alias("width"),
        F.when(kind != "audio", ((F.col("id") % 9 + 1) * 64).cast("int")).alias("height"),
        F.when(kind == "audio", F.lit(16000)).cast("int").alias("sample_rate"),
        F.when(kind == "video", (F.col("id") % 120 + 1).cast("int"))
        .otherwise(F.lit(1))
        .alias("n_frames"),
        F.concat(F.lit("x-fake/"), kind).alias("mime"),
    )
    return df.select(
        F.col("id").alias("media_id"), kind.alias("kind"), payload.alias("payload"), meta.alias("meta")
    )


def _fake_decode(payload: bytes) -> tuple[float, float, int]:
    """Deterministic stand-in for a real decoder: statistics of the md5
    keystream of the payload's HEX form. Hashing the hex text (not the
    raw bytes) keeps the fake cross-engine checkable — SQL engines can
    md5 a string but not an arbitrary byte blob — while the payload
    column itself stays real binary through the Arrow boundary."""
    h = hashlib.md5(payload.hex().encode()).digest()
    vals = list(h)
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / len(vals)
    return mean, var**0.5, len(vals)


#: decoder registry: name -> fn(payload: bytes, kind: str) -> (mean, std, dim)
_DECODERS: dict = {}


def register_decoder(name: str, fn) -> None:
    """Register a real decode kernel (e.g. PIL pixel stats, librosa MFCC
    means). ``fn`` must be pickle-self-contained (imports inside)."""
    if name in ("fake", "raise"):
        raise ValueError(f"{name!r} is a reserved built-in stub name")
    _DECODERS[name] = fn


def extract_features(
    media: DataFrame, decode_stub: str = "fake", batch_note: dict | None = None
) -> DataFrame:
    """Per-item feature extraction via mapInPandas (Arrow batches).

    Real deployment: replace the kernel body with PIL / librosa / pyav
    decode + model features; the Spark contract (schema in/out, iterator
    of pandas batches, no driver collect) is unchanged.

    The kernel is deliberately self-contained (stdlib imports inside, no
    module-global references): cloudpickle then ships it by VALUE, so
    Python workers need neither this package on their PYTHONPATH nor a
    --py-files zip — the safe default for a pickled-UDF boundary.
    """
    # resolve the decoder HERE (driver side): the callable rides the
    # kernel closure by value — registry lookups never happen on workers
    registered = _DECODERS.get(decode_stub)
    decoder_label = (
        "fake-md5" if decode_stub == "fake" else decode_stub
    )

    def kernel(batches: "Iterator[pd.DataFrame]") -> "Iterator[pd.DataFrame]":
        import hashlib as _hl

        import pandas as _pd

        def fake_decode(payload: bytes, kind: str = ""):
            # hex-keystream fake (see _fake_decode): oracle-checkable
            h = _hl.md5(bytes(payload).hex().encode()).digest()
            vals = list(h)
            mean = sum(vals) / len(vals)
            var = sum((v - mean) ** 2 for v in vals) / len(vals)
            return mean, var**0.5, len(vals)

        decode = registered if registered is not None else fake_decode

        for pdf in batches:
            if decode_stub == "raise":
                raise NotImplementedError(
                    "media decode requires PIL/librosa/ffmpeg — not available "
                    "in this environment; use decode_stub='fake' for plumbing "
                    "tests or register_decoder() a real kernel"
                )
            if batch_note is not None:  # test hook: observe Arrow batch shape
                batch_note.setdefault("batches", []).append(len(pdf))
            stats = [
                decode(p, k) for p, k in zip(pdf["payload"], pdf["kind"])
            ]
            yield _pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feat_mean": [s[0] for s in stats],
                    "feat_std": [s[1] for s in stats],
                    "feat_dim": [s[2] for s in stats],
                    "decoder": decoder_label,
                }
            )

    if registered is None and decode_stub not in ("fake", "raise"):
        raise ValueError(
            f"unknown decoder {decode_stub!r}: register_decoder() it first"
        )
    return media.mapInPandas(kernel, FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_idx) to
    decode — the explode happens relationally (codegen) so the expensive
    decode UDF sees an already-flattened, repartitionable work list."""
    vids = media.filter(F.col("kind") == "video")
    return vids.select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("meta.n_frames") - 1, F.lit(every_n))
        ).alias("frame_idx"),
    )
