"""Multimodal column plumbing: opaque binary media + typed metadata.

Images/audio/video ride Spark tables as `binary` columns with a typed
metadata struct alongside. The Spark-side machinery here is real and
tested — schema, batch iteration (mapInPandas over Arrow record batches),
partition-friendly feature extraction — while the actual codec work is
STUBBED: the decode functions raise NotImplementedError unless the
optional libraries (PIL / soundfile) are importable, with a deterministic
header-sniff fallback so pipelines are testable in this container.

Scale notes: feature extraction is mapInPandas (no shuffle, no driver
data); batch size is governed by spark.sql.execution.arrow.
maxRecordsPerBatch — large blobs want a smaller batch cap so Arrow
buffers stay within executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_TYPE = T.StructType([
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("digest", T.StringType()),
])

FEATURE_SCHEMA = T.StructType([
    T.StructField("id", T.StringType()),
    T.StructField("media_type", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("digest", T.StringType()),
    T.StructField("header_hex", T.StringType()),
    T.StructField("width", T.LongType()),
    T.StructField("height", T.LongType()),
    T.StructField("audio_channels", T.LongType()),
    T.StructField("sample_rate", T.LongType()),
    T.StructField("bits_per_sample", T.LongType()),
])

_MAGIC = {
    b"\xff\xd8\xff": "image/jpeg",
    b"\x89PNG": "image/png",
    b"GIF8": "image/gif",
    b"RIFF": "audio/wav",
    b"ID3": "audio/mpeg",
    b"<htm": "text/html",
    b"<!do": "text/html",
}


def sniff_media_type(blob: bytes | None) -> str | None:
    if blob is None:
        return None
    for magic, mtype in _MAGIC.items():
        if blob[:len(magic)].lower() == magic.lower():
            return mtype
    return "application/octet-stream"


# JPEG start-of-frame markers that carry dimensions (public byte layout,
# ITU T.81): C0-C3, C5-C7, C9-CB, CD-CF
_JPEG_SOF = {0xC0, 0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
             0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF}


def parse_image_dimensions(blob: bytes | None) -> tuple[int, int] | None:
    """(width, height) from PNG IHDR / GIF logical-screen descriptor /
    JPEG SOF headers — pure byte arithmetic, no codec library. These are
    public, stable layouts:
    - PNG: 8-byte signature, then the IHDR chunk; width/height are
      big-endian u32 at offsets 16/20.
    - GIF: 'GIF87a'/'GIF89a', then little-endian u16 width/height at 6/8.
    - JPEG: marker segments after SOI; the SOF segment carries height at
      +5 and width at +7 (big-endian u16).
    Returns None for other/truncated blobs (full pixel decode stays
    behind decode_image's optional-PIL stub)."""
    if blob is None:
        return None
    try:
        if blob[:8] == b"\x89PNG\r\n\x1a\n" and blob[12:16] == b"IHDR" \
                and len(blob) >= 24:
            w = int.from_bytes(blob[16:20], "big")
            h = int.from_bytes(blob[20:24], "big")
            return (w, h)
        if blob[:6] in (b"GIF87a", b"GIF89a") and len(blob) >= 10:
            w = int.from_bytes(blob[6:8], "little")
            h = int.from_bytes(blob[8:10], "little")
            return (w, h)
        if blob[:2] == b"\xff\xd8":
            pos = 2
            while pos + 9 < len(blob) and blob[pos] == 0xFF:
                marker = blob[pos + 1]
                if marker in _JPEG_SOF:
                    h = int.from_bytes(blob[pos + 5:pos + 7], "big")
                    w = int.from_bytes(blob[pos + 7:pos + 9], "big")
                    return (w, h)
                if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                    pos += 2  # standalone markers carry no length
                    continue
                pos += 2 + int.from_bytes(blob[pos + 2:pos + 4], "big")
    except (IndexError, ValueError):
        return None
    return None


def parse_wav_info(blob: bytes | None) -> tuple[int, int, int] | None:
    """(n_channels, sample_rate, bits_per_sample) from a RIFF/WAVE
    header — pure byte arithmetic over the public layout (RIFF spec):
    chunks of (4-byte id, little-endian u32 size) from offset 12; the
    'fmt ' chunk carries channels at +2 (u16 LE), sample rate at +4
    (u32 LE), bits per sample at +14 (u16 LE). Returns None for
    non-WAV/truncated blobs (sample decode stays behind decode_audio's
    optional-soundfile stub)."""
    if blob is None or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    try:
        pos = 12
        while pos + 8 <= len(blob):
            cid = blob[pos:pos + 4]
            size = int.from_bytes(blob[pos + 4:pos + 8], "little")
            if cid == b"fmt " and pos + 8 + 16 <= len(blob):
                base = pos + 8
                channels = int.from_bytes(blob[base + 2:base + 4],
                                          "little")
                rate = int.from_bytes(blob[base + 4:base + 8], "little")
                bits = int.from_bytes(blob[base + 14:base + 16],
                                      "little")
                return (channels, rate, bits)
            pos += 8 + size + (size & 1)  # chunks are word-aligned
    except (IndexError, ValueError):
        return None
    return None


def decode_image(blob: bytes) -> Any:
    """Decode an image blob to (width, height, mode). Requires PIL —
    STUB: raises NotImplementedError when the codec lib is absent (it is
    not vendored in this environment)."""
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL; install pillow on executors "
            "(deterministic metadata extraction works without it — see "
            "extract_media_features)") from exc
    img = Image.open(io.BytesIO(blob))
    return img.width, img.height, img.mode


def resize_image(blob: bytes, width: int, height: int) -> bytes:
    """Re-encode an image at (width, height). Requires PIL — STUB,
    same policy as decode_image; the Spark-side plumbing for batch
    resize is extract_media_features-style mapInPandas with this
    function applied per blob inside the batch loop."""
    try:
        import io

        from PIL import Image  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "image resizing requires PIL; install pillow on "
            "executors") from exc
    img = Image.open(io.BytesIO(blob)).resize((width, height))
    buf = io.BytesIO()
    img.save(buf, format=img.format or "PNG")
    return buf.getvalue()


def sample_video_frames(blob: bytes, every_n: int = 30) -> list[bytes]:
    """Every n-th frame of a video blob as encoded images. Requires an
    actual video codec (av / opencv) — STUB: neither is vendored in
    this environment. The Spark-side shape for frame sampling is
    mapInPandas yielding one row per sampled frame
    ((id, frame_idx, frame_blob)), with
    spark.sql.execution.arrow.maxRecordsPerBatch lowered so the
    exploded frame rows stay within Arrow batch budgets."""
    try:
        import av  # type: ignore  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "video frame sampling requires PyAV (or OpenCV); install "
            "one on executors") from exc
    raise NotImplementedError("frame extraction not implemented")


def decode_audio(blob: bytes) -> Any:
    """Decode audio to (sample_rate, n_frames). Requires soundfile —
    STUB, same policy as decode_image."""
    try:
        import io

        import soundfile  # type: ignore
    except ImportError as exc:
        raise NotImplementedError(
            "audio decoding requires soundfile; install it on "
            "executors") from exc
    with soundfile.SoundFile(io.BytesIO(blob)) as f:
        return f.samplerate, f.frames


def with_media_metadata(df: DataFrame, blob_col: str,
                        meta_col: str = "media_meta") -> DataFrame:
    """Typed metadata struct computed JVM-side (no Python): media type is
    left null here (magic sniffing happens in the batch extractor);
    n_bytes/digest are pure expressions."""
    blob = F.col(blob_col)
    return df.withColumn(meta_col, F.struct(
        F.lit(None).cast("string").alias("media_type"),
        F.octet_length(blob).cast("long").alias("n_bytes"),
        F.md5(blob).alias("digest")))


def extract_media_features(df: DataFrame, blob_col: str,
                           id_col: str) -> DataFrame:
    """Arrow-batched feature extraction over binary blobs via mapInPandas:
    (id, media_type, n_bytes, digest, header_hex). The per-batch function
    is where real decoders plug in (decode_image/decode_audio); the
    deterministic digest/header features always compute."""
    id_name, blob_name = id_col, blob_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            blobs = pdf[blob_name]
            dims = [parse_image_dimensions(b) for b in blobs]
            wavs = [parse_wav_info(b) for b in blobs]
            out = pd.DataFrame({
                "id": pdf[id_name].astype(str),
                "media_type": [sniff_media_type(b) for b in blobs],
                "n_bytes": [len(b) if b is not None else 0 for b in blobs],
                "digest": [
                    hashlib.md5(b).hexdigest() if b is not None else None
                    for b in blobs],
                "header_hex": [
                    b[:8].hex() if b is not None else None for b in blobs],
                "width": pd.array(
                    [d[0] if d else None for d in dims], dtype="Int64"),
                "height": pd.array(
                    [d[1] if d else None for d in dims], dtype="Int64"),
                "audio_channels": pd.array(
                    [w[0] if w else None for w in wavs], dtype="Int64"),
                "sample_rate": pd.array(
                    [w[1] if w else None for w in wavs], dtype="Int64"),
                "bits_per_sample": pd.array(
                    [w[2] if w else None for w in wavs], dtype="Int64"),
            })
            yield out

    return (df.select(F.col(id_col), F.col(blob_col))
            .mapInPandas(extract, FEATURE_SCHEMA))
