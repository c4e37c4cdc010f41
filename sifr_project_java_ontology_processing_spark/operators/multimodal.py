"""Multimodal column plumbing (task mandate): image/audio/video as
opaque ``binary`` columns + typed metadata, with decode / feature /
resize / frame-sample stages as Arrow-batched ``mapInPandas`` UDFs.

Decoders, from most to least capable:
  * ``real_decoder`` — the production path. Images: Pillow when
    importable (any format PIL reads), else a pure-stdlib header
    decode for PNG / GIF / JPEG (IHDR / logical-screen / SOF marker
    walk — real parsing of the real container formats, no codec libs
    needed for dimensions). Audio: WAV via the stdlib ``wave`` module
    (frames / framerate → duration). Video: ISO BMFF (MP4/MOV)
    container metadata via a pure-stdlib box walk (``mp4_info``: mvhd
    timescale/duration, tkhd 16.16 fixed-point dimensions, v0+v1
    layouts) — FRAME decode still requires ffmpeg/PyAV and raises
    ``NotImplementedError`` (this container ships no video codec).
  * ``fake_decoder`` — deterministic sha256-derived pseudo-decode,
    kept as the ORACLE TWIN (its output is replayable in SQL, which a
    real codec's is not) and for plumbing tests on arbitrary bytes.
  * ``unimplemented_decoder`` — fails loudly.

``resize_images`` produces actually-resized image bytes when Pillow is
importable and raises ``ImportError`` otherwise (``resize_spec`` is
the codec-free metadata twin).

Scale shape: map-only over the blob column; binary payloads never
shuffle (all derived features are small fixed-width columns). Callers
should prune the ``content`` column immediately after featurization.
"""

from __future__ import annotations

import hashlib
import struct
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


def _pil_image_dims(data: bytes) -> tuple[int, int] | None:
    """Pillow path (any format PIL reads); None when PIL is absent OR
    cannot read the blob — decode failure must fall through to the
    stdlib header parse and ultimately to real_decoder's documented
    ValueError, never leak a PIL exception type into the task."""
    try:
        import io

        from PIL import Image
    except ImportError:
        return None
    try:
        with Image.open(io.BytesIO(data)) as im:
            return im.size  # (width, height)
    except Exception:
        return None


def image_dims(data: bytes) -> tuple[int, int] | None:
    """Pure-stdlib dimension decode for the three dominant web image
    containers — real format parsing, not a heuristic:
      PNG:  IHDR width/height (big-endian u32 at offset 16);
      GIF:  logical screen descriptor (little-endian u16 at offset 6);
      JPEG: marker walk to the first frame header (SOF0-15 minus
            DHT/JPG/DAC), whose payload is [precision, height, width].
    → (width, height) or None for anything else."""
    if data[:8] == b"\x89PNG\r\n\x1a\n" and len(data) >= 24:
        w, h = struct.unpack(">II", data[16:24])
        return int(w), int(h)
    if data[:6] in (b"GIF87a", b"GIF89a") and len(data) >= 10:
        w, h = struct.unpack("<HH", data[6:10])
        return int(w), int(h)
    if data[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(data):
            if data[i] != 0xFF:
                return None
            # JPEG allows any number of 0xFF fill bytes before a marker
            # (ITU T.81 §B.1.1.2) — skip them, or the marker byte reads
            # as 0xFF and the bytes after it misparse as a length
            while i < len(data) and data[i] == 0xFF:
                i += 1
            if i >= len(data):
                return None
            marker = data[i]
            i += 1
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                continue  # standalone markers, no length payload
            if marker in (0xD9, 0xDA):
                # EOI / SOS with no frame header seen: entropy-coded
                # data follows SOS and length-prefixed walking is
                # meaningless there — stop, don't misparse
                return None
            if i + 2 > len(data):
                return None
            (seglen,) = struct.unpack(">H", data[i : i + 2])
            if seglen < 2:
                return None
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 7 > len(data):
                    return None
                h, w = struct.unpack(">HH", data[i + 3 : i + 7])
                return int(w), int(h)
            i += seglen
    return None


def mp4_info(data: bytes) -> tuple[int | None, int | None, int | None] | None:
    """Pure-stdlib ISO BMFF (MP4/MOV) metadata parse — real container
    walking, the video sibling of the PNG/GIF/JPEG header decodes:

      * box walk (32-bit size, ``size==1`` → 64-bit largesize,
        ``size==0`` → to end-of-enclosing-box);
      * ``moov/mvhd`` → timescale + duration (v0 and v1 layouts);
      * ``moov/trak/tkhd`` → 16.16 fixed-point width/height; the max
        across tracks wins (audio tracks carry 0 × 0).

    → (width, height, duration_ms), any of which may be None when the
    box is absent; None for non-BMFF bytes. FRAME decoding still needs
    a codec lib — this reads only the index metadata, which is what
    curation-time featurization needs (resolution/duration filters)."""
    if len(data) < 12 or data[4:8] not in (
        b"ftyp", b"moov", b"mdat", b"free", b"wide", b"skip", b"pdin", b"styp",
    ):
        return None

    def boxes(start: int, end: int):
        i = start
        while i + 8 <= end:
            size = int.from_bytes(data[i : i + 4], "big")
            typ = data[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > end:
                    return
                size = int.from_bytes(data[i + 8 : i + 16], "big")
                hdr = 16
            elif size == 0:
                size = end - i
            if size < hdr or i + size > end:
                return
            yield typ, i + hdr, i + size
            i += size

    width = height = duration_ms = None
    saw_moov = False
    for typ, s, e in boxes(0, len(data)):
        if typ != b"moov":
            continue
        saw_moov = True
        for t2, s2, e2 in boxes(s, e):
            if t2 == b"mvhd" and e2 - s2 >= 4:
                # each version's branch requires ITS OWN full field
                # span — a truncated v1 payload must fail closed, not
                # fall into the v0 offsets and read timestamp bytes as
                # a plausible-looking timescale/duration
                ver = data[s2]
                ts = dur = None
                if ver == 1:
                    if e2 - s2 >= 32:
                        ts = int.from_bytes(data[s2 + 20 : s2 + 24], "big")
                        dur = int.from_bytes(data[s2 + 24 : s2 + 32], "big")
                elif e2 - s2 >= 20:
                    ts = int.from_bytes(data[s2 + 12 : s2 + 16], "big")
                    dur = int.from_bytes(data[s2 + 16 : s2 + 20], "big")
                if ts:
                    duration_ms = int(dur * 1000 // ts)
            elif t2 == b"trak":
                for t3, s3, e3 in boxes(s2, e2):
                    if t3 != b"tkhd" or e3 - s3 < 4:
                        continue
                    ver = data[s3]
                    off = s3 + (88 if ver == 1 else 76)
                    if off + 8 <= e3:
                        w = int.from_bytes(data[off : off + 4], "big") >> 16
                        h = int.from_bytes(data[off + 4 : off + 8], "big") >> 16
                        if w and h and (width is None or w * h > width * height):
                            width, height = w, h
    if not saw_moov:
        return None
    return width, height, duration_ms


def wav_duration_ms(data: bytes) -> int | None:
    """WAV duration via the stdlib ``wave`` reader (a real RIFF/PCM
    parse); None if the blob is not a readable WAV."""
    import io
    import wave

    try:
        with wave.open(io.BytesIO(data), "rb") as w:
            rate = w.getframerate()
            if rate <= 0:
                return None
            return int(w.getnframes() * 1000 // rate)
    except (wave.Error, EOFError):
        return None


def real_decoder(content: bytes | None, media_type: str) -> dict:
    """Production decode: real container parsing (see module
    docstring). Undecodable non-empty blobs raise — at 100 TB a quiet
    None row is how corrupt shards slip into training data; callers
    wanting keep-going semantics wrap this in their own try."""
    if not content:
        return {"width": None, "height": None, "duration_ms": None, "digest": None}
    data = bytes(content)
    digest = hashlib.sha256(data).hexdigest()
    if media_type == "image":
        dims = _pil_image_dims(data) or image_dims(data)
        if dims is None:
            raise ValueError(
                f"undecodable image blob (sha256 {digest[:12]}…): not a "
                "PNG/GIF/JPEG header and Pillow is unavailable or failed"
            )
        return {
            "width": dims[0], "height": dims[1],
            "duration_ms": None, "digest": digest,
        }
    if media_type == "audio":
        dur = wav_duration_ms(data)
        if dur is None:
            raise ValueError(
                f"undecodable audio blob (sha256 {digest[:12]}…): only "
                "RIFF/WAV is supported without audio codec libraries"
            )
        return {"width": None, "height": None, "duration_ms": dur, "digest": digest}
    if media_type == "video":
        info = mp4_info(data)
        if info is None:
            raise NotImplementedError(
                "non-MP4 video (or frame decode) needs ffmpeg/PyAV, not "
                "present in this container; ISO-BMFF container metadata "
                "IS parsed (mp4_info)"
            )
        w, h, dur = info
        return {"width": w, "height": h, "duration_ms": dur, "digest": digest}
    raise ValueError(f"unknown media_type {media_type!r}")


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


def resize_images(
    media: DataFrame, max_side: int = 512, out_format: str = "PNG"
) -> DataFrame:
    """REAL image resize (aspect-preserving, capped at ``max_side``) →
    (media_id, content, width, height). Requires Pillow on the
    executors — raises ImportError at plan-build time when absent
    (``resize_spec`` is the codec-free metadata twin). Map-only; blobs
    stay within their task."""
    try:
        import PIL  # noqa: F401  (driver-side early failure beats task death)
    except ImportError as e:
        raise ImportError(
            "resize_images needs Pillow; use resize_spec for the "
            "metadata-only plan in codec-free environments"
        ) from e

    src = media.select("media_id", "content")

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import io

        from PIL import Image

        for pdf in it:
            ids, blobs, ws, hs = [], [], [], []
            for mid, blob in zip(pdf["media_id"], pdf["content"]):
                if blob is None:
                    continue
                with Image.open(io.BytesIO(bytes(blob))) as im:
                    w, h = im.size
                    scale = min(1.0, max_side / max(w, h))
                    tw = max(1, round(w * scale))
                    th = max(1, round(h * scale))
                    out = io.BytesIO()
                    im.resize((tw, th)).save(out, format=out_format)
                ids.append(mid)
                blobs.append(out.getvalue())
                ws.append(tw)
                hs.append(th)
            yield pd.DataFrame(
                {"media_id": ids, "content": blobs, "width": ws, "height": hs}
            )

    return src.mapInPandas(
        _batches, schema="media_id long, content binary, width int, height int"
    )
