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


def encode_png_gray(pixels: list[list[int]]) -> bytes:
    """Encode an 8-bit grayscale pixel grid as a real PNG (public spec:
    signature, IHDR, one zlib IDAT of filter-0 scanlines, IEND) — pure
    stdlib (zlib + binascii CRC), used to synthesize deterministic
    test/oracle images."""
    import struct
    import zlib

    h = len(pixels)
    w = len(pixels[0]) if h else 0

    def chunk(tag: bytes, payload: bytes) -> bytes:
        crc = zlib.crc32(tag + payload) & 0xFFFFFFFF
        return (struct.pack(">I", len(payload)) + tag + payload
                + struct.pack(">I", crc))

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 0, 0, 0, 0)  # gray, 8-bit
    raw = b"".join(b"\x00" + bytes(row) for row in pixels)
    return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b""))


# PNG filter types (public spec, RFC 2083 §6): each scanline is
# prefixed by one filter byte; unfiltering reverses it against the
# left/up/up-left neighbors.
def _png_unfilter(raw: bytes, w: int, h: int, bpp: int) -> bytearray:
    stride = w * bpp
    out = bytearray()
    pos = 0
    for y in range(h):
        ft = raw[pos]
        line = bytearray(raw[pos + 1:pos + 1 + stride])
        pos += 1 + stride
        prev = out[-stride:] if y else bytearray(stride)
        for x in range(stride):
            a = line[x - bpp] if x >= bpp else 0       # left
            b = prev[x]                                 # up
            c = prev[x - bpp] if x >= bpp else 0        # up-left
            if ft == 1:
                line[x] = (line[x] + a) & 0xFF
            elif ft == 2:
                line[x] = (line[x] + b) & 0xFF
            elif ft == 3:
                line[x] = (line[x] + (a + b) // 2) & 0xFF
            elif ft == 4:                               # Paeth
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else \
                    (b if pb <= pc else c)
                line[x] = (line[x] + pred) & 0xFF
        out.extend(line)
    return out


def decode_png_gray(blob: bytes | None) -> \
        tuple[int, int, list[list[int]]] | None:
    """REAL pure-stdlib PNG pixel decode to an 8-bit grayscale grid:
    zlib-inflate the IDAT stream, reverse scanline filters 0-4,
    luma-convert RGB/RGBA (integer BT.601 — deterministic). Supports
    8-bit color types 0 (gray), 2 (RGB), 4 (gray+alpha), 6 (RGBA),
    non-interlaced — the layouts a curation pipeline synthesizes or
    commonly meets; None for anything else (those route to the
    PIL-gated path in image_dhash, preserving the stub policy)."""
    import struct
    import zlib

    if blob is None or blob[:8] != b"\x89PNG\r\n\x1a\n":
        return None
    try:
        pos, w = 8, None
        idat = b""
        while pos + 8 <= len(blob):
            (ln,) = struct.unpack(">I", blob[pos:pos + 4])
            tag = blob[pos + 4:pos + 8]
            body = blob[pos + 8:pos + 8 + ln]
            if tag == b"IHDR":
                w, h, depth, ctype, comp, filt, inter = \
                    struct.unpack(">IIBBBBB", body)
                if depth != 8 or comp or filt or inter \
                        or ctype not in (0, 2, 4, 6):
                    return None
            elif tag == b"IDAT":
                idat += body
            elif tag == b"IEND":
                break
            pos += 12 + ln
        if w is None or not idat:
            return None
        bpp = {0: 1, 2: 3, 4: 2, 6: 4}[ctype]
        raw = _png_unfilter(zlib.decompress(idat), w, h, bpp)
        rows = []
        for y in range(h):
            base = y * w * bpp
            if ctype == 0:
                rows.append(list(raw[base:base + w]))
            elif ctype == 4:
                rows.append([raw[base + 2 * x] for x in range(w)])
            else:  # RGB / RGBA: integer BT.601 luma
                rows.append([
                    (299 * raw[base + bpp * x]
                     + 587 * raw[base + bpp * x + 1]
                     + 114 * raw[base + bpp * x + 2]) // 1000
                    for x in range(w)])
        return (w, h, rows)
    except (struct.error, zlib.error, IndexError, KeyError, ValueError):
        return None


def _downsample_gray(rows: list[list[int]], gw: int,
                     gh: int) -> list[list[int]]:
    """Integer block-mean downsample to a gw x gh grid (floor
    boundaries, floor mean — deterministic in any engine). Identity
    when the image already has the target dimensions."""
    h, w = len(rows), len(rows[0])
    if (w, h) == (gw, gh):
        return rows
    out = []
    for gy in range(gh):
        y0, y1 = (h * gy) // gh, max((h * (gy + 1)) // gh, (h * gy) // gh + 1)
        line = []
        for gx in range(gw):
            x0, x1 = (w * gx) // gw, max((w * (gx + 1)) // gw,
                                         (w * gx) // gw + 1)
            tot = sum(rows[y][x] for y in range(y0, y1)
                      for x in range(x0, x1))
            line.append(tot // ((y1 - y0) * (x1 - x0)))
        out.append(line)
    return out


def image_dhash(blob: bytes | None, hash_size: int = 8) -> int | None:
    """Perceptual difference hash (dHash): decode, downsample to
    (hash_size+1) x hash_size, emit one bit per horizontal gradient —
    bit i (i = y*hash_size + x) set iff p[y][x+1] > p[y][x]. Returns a
    SIGNED 64-bit int at hash_size=8 (bit 63 two's-complement, the
    same convention as simhash_table) so it feeds the chunked-bit
    hamming pairing machinery directly.

    PNGs decode via the pure-stdlib path above (REAL pixels, no codec
    lib); other formats require PIL and keep the documented stub
    policy (NotImplementedError when absent). None for undecodable
    blobs."""
    if blob is None:
        return None
    decoded = decode_png_gray(blob)
    if decoded is None:
        if sniff_media_type(blob) in ("image/jpeg", "image/gif"):
            w, h, _mode = decode_image(blob)  # PIL-gated stub policy
            import io

            from PIL import Image  # type: ignore

            img = Image.open(io.BytesIO(blob)).convert("L")
            rows = [[img.getpixel((x, y)) for x in range(img.width)]
                    for y in range(img.height)]
            decoded = (img.width, img.height, rows)
        else:
            return None
    _w, _h, rows = decoded
    grid = _downsample_gray(rows, hash_size + 1, hash_size)
    val = 0
    for y in range(hash_size):
        for x in range(hash_size):
            if grid[y][x + 1] > grid[y][x]:
                val |= 1 << (y * hash_size + x)
    n_bits = hash_size * hash_size
    if n_bits == 64 and val >= 1 << 63:
        val -= 1 << 64  # two's complement into a signed long
    return val


def image_perceptual_hashes(df: DataFrame, blob_col: str,
                            id_col: str = "doc_id",
                            hash_size: int = 8,
                            out_col: str = "dhash") -> DataFrame:
    """(id, dhash) via mapInPandas — Arrow-batched, no shuffle, no
    driver data; undecodable blobs drop out (NULL hash). The decode
    per blob is the sanctioned non-expressible step (same policy as
    the dynamic-JSON validator); everything downstream of the hash is
    pure Catalyst."""
    id_name, blob_name = id_col, blob_col

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf[id_name],
                out_col: pd.array(
                    [image_dhash(b, hash_size) for b in pdf[blob_name]],
                    dtype="Int64"),
            })

    schema = T.StructType([
        T.StructField("id", df.schema[id_col].dataType),
        T.StructField(out_col, T.LongType()),
    ])
    return (df.select(F.col(id_col), F.col(blob_col))
            .mapInPandas(extract, schema)
            .filter(F.col(out_col).isNotNull())
            .withColumnRenamed("id", id_col))


def image_near_duplicates(df: DataFrame, blob_col: str,
                          id_col: str = "doc_id",
                          max_hamming: int = 3,
                          n_chunks: int = 4) -> DataFrame:
    """Perceptual near-duplicate image pairs: dHash fingerprints +
    the SAME pigeonhole chunked-bit pairing as simhash_pairs (Manku
    WWW'07) — buckets on 16-bit fingerprint chunks, never all-pairs,
    exact hamming verification. Returns (id_a, id_b, hamming),
    id_a < id_b. Feed the pairs to dedup_groups /
    near-dedup keep-canonical exactly like text near-dups."""
    from json_schema_spark.textops.dedup import hamming_pairs

    hashes = image_perceptual_hashes(df, blob_col, id_col)
    return hamming_pairs(hashes, fp_col="dhash", id_col=id_col,
                         max_hamming=max_hamming, n_chunks=n_chunks,
                         bits=64)


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
