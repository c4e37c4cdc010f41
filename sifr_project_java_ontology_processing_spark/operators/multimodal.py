"""Multimodal column plumbing (task mandate): image/audio/video as
opaque ``binary`` columns + typed metadata, with decode / feature /
resize / frame-sample stages as Arrow-batched ``mapInPandas`` UDFs.

The decode step itself is STUBBED — this container ships no image/audio
codecs — behind ``decoder=`` hooks: the default ``fake_decoder`` is a
deterministic pure-Python stand-in (so the plumbing is testable
end-to-end); pass a real decoder (PIL/librosa/ffmpeg wrapper) in a
full environment. Everything Spark-side — schemas, batch iteration,
partition mapping, metadata threading — is real.

Scale shape: map-only over the blob column; binary payloads never
shuffle (all derived features are small fixed-width columns). Callers
should prune the ``content`` column immediately after featurization.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame

Decoder = Callable[[bytes | None, str], dict]


def fake_decoder(content: bytes | None, media_type: str) -> dict:
    """Deterministic decode stand-in: derives pseudo dimensions/duration
    and a content digest from the bytes alone. Replace with a real codec
    in production; raises nothing, returns all-None for empty blobs."""
    if not content:
        return {"width": None, "height": None, "duration_ms": None, "digest": None}
    h = hashlib.sha256(bytes(content)).hexdigest()
    w = 16 + int(h[:4], 16) % 4080
    return {
        "width": w if media_type in ("image", "video") else None,
        "height": (16 + int(h[4:8], 16) % 2160) if media_type in ("image", "video") else None,
        "duration_ms": (int(h[8:14], 16) % 600000) if media_type in ("audio", "video") else None,
        "digest": h,
    }


def unimplemented_decoder(content: bytes | None, media_type: str) -> dict:
    """The honest stub: fails loudly where a real codec is required."""
    raise NotImplementedError(
        "media decoding requires image/audio libraries not present in "
        "this container; inject a real Decoder"
    )


def decode_media(media: DataFrame, decoder: Decoder = fake_decoder) -> DataFrame:
    """MEDIA → (media_id, media_type, width, height, duration_ms, digest,
    n_bytes, part_id). Arrow-batched; blob column pruned on output."""
    src = media.select("media_id", "media_type", "content")
    out_schema = (
        "media_id long, media_type string, width int, height int, "
        "duration_ms int, digest string, n_bytes long, part_id int"
    )

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        for pdf in it:
            rows = []
            for mid, mtype, blob in zip(
                pdf["media_id"], pdf["media_type"], pdf["content"]
            ):
                d = decoder(blob, mtype)
                rows.append(
                    (
                        mid,
                        mtype,
                        d["width"],
                        d["height"],
                        d["duration_ms"],
                        d["digest"],
                        len(blob) if blob is not None else 0,
                        pid,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "media_type", "width", "height",
                    "duration_ms", "digest", "n_bytes", "part_id",
                ],
            )

    return src.mapInPandas(_batches, schema=out_schema)


def frame_sample_plan(
    decoded: DataFrame, every_ms: int = 1000, max_frames: int = 16
) -> DataFrame:
    """Video frame-sampling *plan*: one row per (media_id, frame_ts_ms)
    to be decoded downstream — pure Catalyst (sequence+explode), no UDF.
    The actual pixel decode is the injected Decoder's job."""
    from pyspark.sql import functions as F

    vids = decoded.where(
        (F.col("media_type") == "video") & F.col("duration_ms").isNotNull()
    )
    n = F.least(
        F.floor(F.col("duration_ms") / every_ms).cast("int") + 1, F.lit(max_frames)
    )
    return vids.select(
        "media_id",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n - 1), lambda i: i * every_ms
            )
        ).alias("frame_ts_ms"),
    )


def resize_spec(
    decoded: DataFrame, max_side: int = 512
) -> DataFrame:
    """Resize specification per image: target dims preserving aspect
    ratio, capped at ``max_side`` — metadata-only compute (the resize
    itself belongs to the injected decoder)."""
    from pyspark.sql import functions as F

    imgs = decoded.where(
        (F.col("media_type") == "image")
        & F.col("width").isNotNull()
        & F.col("height").isNotNull()
    )
    scale = F.least(
        F.lit(1.0),
        F.lit(max_side) / F.greatest(F.col("width"), F.col("height")),
    )
    return imgs.select(
        "media_id",
        "width",
        "height",
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1)).alias("target_width"),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1)).alias("target_height"),
    )
