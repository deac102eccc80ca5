"""Multimodal column plumbing (north_star): image/audio/video payloads
as opaque ``binary`` columns with typed metadata structs.

The container has no image/audio codecs, so the *decode* step is a
clearly-marked seam with three settings per operator:

- ``mode='fake'`` (default): deterministic synthetic features derived
  from the content hash, so the Spark-side plumbing — schema, batching,
  partitioning — is fully real and testable;
- ``codec=<callable>``: a caller-supplied decode function (PIL, ffmpeg,
  soundfile, …) is shipped to the workers via cloudpickle and called
  per payload inside the Arrow batches — the production integration
  point, usable WITHOUT editing this repo;
- ``mode='real'`` with no codec: uses the operator's stdlib-backed
  reference codec where one exists (RIFF/WAV audio via ``wave``;
  uncompressed BMP / binary PPM / PGM images via ``struct`` + numpy),
  else raises NotImplementedError at the exact point a codec would be
  called (honest stub — compressed media needs libraries this
  container lacks).

All heavy per-row work runs through Arrow-batched ``mapInPandas`` —
the right shape for a 100 TB pipeline: one Python worker per partition,
columnar transfer, no per-row pickling.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: canonical multimodal schema fragment: payload + typed metadata
BLOB_META_SCHEMA = (
    "media_type string, byte_size long, content_hash string"
)

IMAGE_FEATURE_SCHEMA = (
    "width int, height int, channels int, mean_luma double"
)


def attach_blob(
    df: DataFrame, src_col: str, media_type: str = "application/octet-stream",
    blob_col: str = "blob",
) -> DataFrame:
    """Pack an existing column into the canonical (blob, meta) layout.
    In production the blob arrives from the source (parquet binary /
    object store); here any column can be cast for testing."""
    blob = F.encode(F.col(src_col).cast("string"), "utf-8")
    return df.withColumn(blob_col, blob).withColumn(
        "blob_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.octet_length(blob).cast("long").alias("byte_size"),
            F.md5(blob).alias("content_hash"),
        ),
    )


def blob_stats(df: DataFrame, blob_col: str = "blob") -> DataFrame:
    """Cheap JVM-side stats on binary payloads — no Python involved."""
    return df.withColumn("byte_size", F.octet_length(F.col(blob_col)).cast("long")) \
             .withColumn("content_hash", F.md5(F.col(blob_col)))


def _resolve_decoder(
    mode: str,
    codec: Optional[Callable],
    fake: Callable,
    what: str,
    real_default: Optional[Callable] = None,
):
    """Pick the per-payload decode callable: explicit codec wins, then
    the deterministic fake; ``mode='real'`` uses the operator's
    stdlib-backed reference codec when one exists (``real_default``,
    e.g. WAV via ``wave``), else raises where the codec would have
    run."""
    if mode not in ("fake", "real"):
        raise ValueError(f"unknown decode mode: {mode}")
    if codec is not None:
        return codec
    if mode == "fake":
        return fake
    if real_default is not None:
        return real_default

    def missing(*_a, **_k):
        raise NotImplementedError(
            f"real {what} requires a media library not in this container; "
            "pass codec=<callable> to plug one in"
        )

    return missing


def wav_codec(payload: bytes) -> dict:
    """Reference REAL audio codec: RIFF/WAV (PCM) via stdlib ``wave`` —
    zero dependencies beyond numpy. Returns the
    :func:`extract_audio_features` contract keys: duration_s,
    sample_rate, rms (normalized to full scale, so a full-scale sine
    reads ≈ 0.7071). Compressed formats (mp3/ogg/flac) still need an
    external codec through the ``codec=`` seam."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        sr = w.getframerate()
        n = w.getnframes()
        sw = w.getsampwidth()
        frames = w.readframes(n)
    duration = n / sr if sr else 0.0
    if sw == 1:
        # 8-bit WAV is unsigned, midpoint 128
        vals = np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
        full = 128.0
    elif sw == 2:
        vals = np.frombuffer(frames, dtype="<i2").astype(np.float64)
        full = float(1 << 15)
    elif sw == 4:
        vals = np.frombuffer(frames, dtype="<i4").astype(np.float64)
        full = float(1 << 31)
    else:
        raise ValueError(f"unsupported WAV sample width: {sw} bytes")
    rms = float(np.sqrt(np.mean(vals * vals)) / full) if vals.size else 0.0
    return {
        "duration_s": round(duration, 3),
        "sample_rate": int(sr),
        "rms": round(rms, 6),
    }


def _parse_pnm(payload: bytes):
    """Parse binary PPM (P6) / PGM (P5) → (H, W, C) uint8 ndarray."""
    import numpy as np

    def tokens(buf):
        i = 2  # past magic
        out = []
        while len(out) < 3:
            while i < len(buf) and buf[i : i + 1].isspace():
                i += 1
            if buf[i : i + 1] == b"#":
                while i < len(buf) and buf[i] != 0x0A:
                    i += 1
                continue
            j = i
            while j < len(buf) and not buf[j : j + 1].isspace():
                j += 1
            out.append(int(buf[i:j]))
            i = j
        return out, i + 1  # single whitespace after maxval

    magic = payload[:2]
    (w, h, maxval), off = tokens(payload)
    ch = 3 if magic == b"P6" else 1
    if maxval > 255:
        raw = np.frombuffer(payload, dtype=">u2", offset=off, count=w * h * ch)
        arr = (raw.astype(np.float64) * 255.0 / maxval).astype(np.uint8)
    else:
        arr = np.frombuffer(payload, dtype=np.uint8, offset=off, count=w * h * ch)
    return arr.reshape(h, w, ch)


def _parse_bmp(payload: bytes):
    """Parse uncompressed (BI_RGB) 8/24/32-bit BMP → (H, W, C) uint8
    ndarray in RGB(A) order, top-down."""
    import struct

    import numpy as np

    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off_bits = struct.unpack_from("<I", payload, 10)[0]
    hdr_size = struct.unpack_from("<I", payload, 14)[0]
    w, h = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    comp = struct.unpack_from("<I", payload, 30)[0]
    if comp != 0:
        raise ValueError(f"unsupported BMP compression: {comp}")
    if bpp not in (8, 24, 32):
        raise ValueError(f"unsupported BMP bit depth: {bpp}")
    top_down = h < 0
    h = abs(h)
    stride = ((w * bpp // 8) + 3) & ~3
    rows = np.frombuffer(
        payload, dtype=np.uint8, offset=off_bits, count=stride * h
    ).reshape(h, stride)
    px = rows[:, : w * (bpp // 8)]
    if not top_down:
        px = px[::-1]
    if bpp == 8:
        # BGRA palette sits between the DIB header and the pixel data
        pal = np.frombuffer(
            payload, dtype=np.uint8, offset=14 + hdr_size,
            count=(off_bits - 14 - hdr_size),
        ).reshape(-1, 4)
        idx = px.reshape(h, w)
        return pal[idx][:, :, [2, 1, 0]]  # BGR(A) → RGB
    c = bpp // 8
    img = px.reshape(h, w, c)
    order = [2, 1, 0] if c == 3 else [2, 1, 0, 3]
    return img[:, :, order]


def bmp_codec(payload: bytes) -> dict:
    """Reference REAL image codec: uncompressed BMP (8/24/32-bit
    BI_RGB) and binary PPM/PGM via stdlib ``struct`` + numpy — zero new
    dependencies. Returns the :func:`decode_image_features` contract
    keys (width, height, channels, mean_luma; luma = Rec.601 over
    [0, 1]). Compressed formats (png/jpeg/webp) still need an external
    codec through the ``codec=`` seam."""
    import numpy as np

    if payload[:2] in (b"P5", b"P6"):
        img = _parse_pnm(payload)
    else:
        img = _parse_bmp(payload)
    h, w, c = img.shape
    f = img.astype(np.float64) / 255.0
    if c == 1:
        luma = f[:, :, 0]
    else:
        luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    return {
        "width": int(w),
        "height": int(h),
        "channels": int(c),
        "mean_luma": round(float(luma.mean()), 6),
    }


def encode_bmp(img) -> bytes:
    """Encode an (H, W, 3) uint8 RGB ndarray as a 24-bit BI_RGB BMP.
    The inverse seam for :func:`bmp_codec` / the resize reference codec
    (and a test fixture generator)."""
    import struct

    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    h, w, _ = img.shape
    stride = ((w * 3) + 3) & ~3
    body = np.zeros((h, stride), dtype=np.uint8)
    body[:, : w * 3] = img[::-1, :, [2, 1, 0]].reshape(h, w * 3)  # RGB→BGR, bottom-up
    off = 14 + 40
    size = off + stride * h
    return (
        struct.pack("<2sIHHI", b"BM", size, 0, 0, off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, stride * h, 2835, 2835, 0, 0)
        + body.tobytes()
    )


def bmp_resize_codec(payload: bytes, target_w: int, target_h: int) -> bytes:
    """Reference REAL resize codec: nearest-neighbor over the same
    formats :func:`bmp_codec` reads, re-encoded as 24-bit BMP. Plugs
    into :func:`resize_images` as its ``mode='real'`` default."""
    import numpy as np

    if payload[:2] in (b"P5", b"P6"):
        img = _parse_pnm(payload)
    else:
        img = _parse_bmp(payload)
    h, w, c = img.shape
    ys = (np.arange(target_h) * h // target_h).clip(0, h - 1)
    xs = (np.arange(target_w) * w // target_w).clip(0, w - 1)
    out = img[np.ix_(ys, xs)]
    if c == 1:
        out = np.repeat(out, 3, axis=2)
    return encode_bmp(out[:, :, :3])


def _fake_decode(payload: bytes) -> dict:
    """Deterministic synthetic 'decode': metadata derived from the
    content hash, so tests are stable and distribution-independent."""
    h = hashlib.md5(payload or b"").digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "channels": 1 + h[2] % 3,
        "mean_luma": round(h[3] / 255.0, 6),
    }


def decode_image_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    mode: str = "fake",
    codec: Optional[Callable] = None,
    batch_hint: int = 1024,
) -> DataFrame:
    """Extract per-image features: (id, width, height, channels,
    mean_luma). ``codec(payload) -> dict`` with those keys plugs a real
    decoder in; ``mode='real'`` without a codec decodes uncompressed
    BMP / binary PPM / PGM through the stdlib :func:`bmp_codec`."""
    decode = _resolve_decoder(
        mode, codec, _fake_decode, "image decode", real_default=bmp_codec
    )
    schema = f"{id_col} long, {IMAGE_FEATURE_SCHEMA}"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decode(b) for b in pdf[blob_col]]
            out = pd.DataFrame(feats)
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    mode: str = "fake",
    codec: Optional[Callable] = None,
) -> DataFrame:
    """Resize: emits (id, resized_blob, width, height).
    ``codec(payload, target_w, target_h) -> bytes`` plugs a real
    resizer in. The fake mode re-hashes the payload with the target box
    (deterministic bytes of plausible size); ``mode='real'`` without a
    codec resizes BMP/PPM/PGM nearest-neighbor through the stdlib
    :func:`bmp_resize_codec`. The Spark-side shape — binary in, binary
    out through Arrow batches — is the contract a codec implementation
    inherits."""
    tw, th = int(target_w), int(target_h)

    def fake(payload, w, h):
        seed = hashlib.md5(
            (payload or b"") + w.to_bytes(4, "big") + h.to_bytes(4, "big")
        ).digest()
        # deterministic pseudo-pixels, ~3 bytes/pixel capped
        return (seed * (1 + (w * h * 3) // len(seed)))[: w * h * 3]

    resize = _resolve_decoder(
        mode, codec, fake, "resize", real_default=bmp_resize_codec
    )
    schema = f"{id_col} long, resized_blob binary, width int, height int"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = [
                (rid, bytearray(resize(payload, tw, th)), tw, th)
                for rid, payload in zip(pdf[id_col], pdf[blob_col])
            ]
            yield pd.DataFrame(
                rows, columns=[id_col, "resized_blob", "width", "height"]
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def extract_audio_features(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    mode: str = "fake",
    codec: Optional[Callable] = None,
) -> DataFrame:
    """Audio features: (id, duration_s, sample_rate, rms).
    ``codec(payload) -> dict`` with those keys plugs a real decoder
    (soundfile/ffmpeg) in; ``mode='real'`` without a codec decodes
    RIFF/WAV through the stdlib :func:`wav_codec`; fake derives stable
    values from the content hash."""

    def fake(payload):
        h = hashlib.md5(payload or b"").digest()
        return {
            "duration_s": round(1.0 + h[5] / 8.0, 3),
            "sample_rate": (8000, 16000, 44100, 48000)[h[6] % 4],
            "rms": round(h[7] / 255.0, 6),
        }

    decode = _resolve_decoder(mode, codec, fake, "audio decode", real_default=wav_codec)
    schema = f"{id_col} long, duration_s double, sample_rate int, rms double"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[blob_col]):
                d = decode(payload)
                rows.append(
                    (rid, d["duration_s"], d["sample_rate"], d["rms"])
                )
            yield pd.DataFrame(
                rows, columns=[id_col, "duration_s", "sample_rate", "rms"]
            )

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def sample_frames(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    every_n: int = 10,
    mode: str = "fake",
    codec: Optional[Callable] = None,
) -> DataFrame:
    """Frame sampling for video payloads: emits (id, frame_idx,
    frame_hash) rows — one row per sampled frame.
    ``codec(payload, every_n) -> list[(frame_idx, frame_hash)]`` plugs
    a real demuxer (ffmpeg) in; the deterministic fake derives a
    synthetic frame count from the payload hash."""

    def fake(payload, step):
        h = hashlib.md5(payload or b"").digest()
        n_frames = 30 + h[4] % 240
        # frame id mixed in as a UTF-8 suffix (not raw bytes) so the
        # derivation is reproducible from SQL on text payloads
        return [
            (
                idx,
                hashlib.md5(
                    (payload or b"") + f"#frame{idx}".encode()
                ).hexdigest(),
            )
            for idx in range(0, n_frames, step)
        ]

    demux = _resolve_decoder(mode, codec, fake, "frame extraction")
    schema = f"{id_col} long, frame_idx int, frame_hash string"
    step = int(every_n)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[blob_col]):
                for idx, fh in demux(payload, step):
                    rows.append((rid, idx, fh))
            yield pd.DataFrame(rows, columns=[id_col, "frame_idx", "frame_hash"])

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


# --- perceptual hashing (image near-dup) ------------------------------------

def _phash_bits(img) -> int:
    """64-bit pHash of an (H, W, C) uint8 image: Rec.601 luma →
    nearest-neighbor 32×32 → orthonormal 2-D DCT-II → top-left 8×8 →
    bit i = coeff_i > median (the public imagehash/pHash.org recipe).
    Returns a SIGNED 64-bit int (Spark LongType-safe two's complement).
    """
    import numpy as np

    f = img.astype(np.float64) / 255.0
    if f.shape[2] == 1:
        luma = f[:, :, 0]
    else:
        luma = 0.299 * f[:, :, 0] + 0.587 * f[:, :, 1] + 0.114 * f[:, :, 2]
    h, w = luma.shape
    ys = (np.arange(32) * h) // 32
    xs = (np.arange(32) * w) // 32
    small = luma[np.ix_(ys, xs)]
    n = 32
    k = np.arange(n)
    basis = np.cos(np.pi * (2.0 * k[None, :] + 1.0) * k[:, None] / (2.0 * n))
    basis *= np.sqrt(2.0 / n)
    basis[0] *= np.sqrt(0.5)
    d = basis @ small @ basis.T
    block = d[:8, :8].ravel()
    med = float(np.median(block))
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << (63 - i)
    return bits - (1 << 64) if bits >= (1 << 63) else bits


def _fake_phash(payload: bytes) -> int:
    """Deterministic plumbing stand-in: 64 bits straight from md5."""
    v = int.from_bytes(hashlib.md5(payload or b"").digest()[:8], "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def phash_images(
    df: DataFrame,
    blob_col: str = "blob",
    id_col: str = "doc_id",
    mode: str = "fake",
    codec: Optional[Callable] = None,
) -> DataFrame:
    """Per-image 64-bit perceptual hash — the image-modality
    fingerprint that survives re-encoding, mild resizing, and noise
    where a byte hash doesn't: the front of image NEAR-dup detection
    (:func:`phash_dup_pairs`), next to the text family's simhash.

    ``codec(payload) -> int`` plugs a full decoder+hash in;
    ``mode='real'`` without a codec decodes uncompressed BMP/PPM/PGM
    through the stdlib parsers and applies the public pHash recipe
    (32×32 luma → DCT → 8×8 median bits). Returns ``(id, phash)``.

    Scale: Arrow ``mapInPandas`` map pass (the codec seam's
    established shape), zero shuffle.
    """

    def real(payload: bytes) -> int:
        img = (_parse_pnm(payload)
               if payload[:2] in (b"P5", b"P6") else _parse_bmp(payload))
        return _phash_bits(img)

    hasher = _resolve_decoder(
        mode, codec, _fake_phash, "phash", real_default=real
    )
    schema = f"{id_col} long, phash long"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = pd.DataFrame({
                id_col: pdf[id_col].values,
                "phash": [hasher(b) for b in pdf[blob_col]],
            })
            yield out

    return df.select(id_col, blob_col).mapInPandas(run, schema=schema)


def phash_dup_pairs(
    hashes: DataFrame,
    id_col: str = "doc_id",
    hash_col: str = "phash",
    max_hamming: int = 4,
) -> DataFrame:
    """All image pairs within ``max_hamming`` pHash bits — near-dup
    images WITHOUT the n² cross: the simhash pigeonhole on the 64-bit
    hash (split into ``max_hamming + 1`` parts; a qualifying pair
    must agree EXACTLY on at least one part), candidates deduped, then
    the exact ``bit_count(xor)`` verify. Returns ``(a_id, b_id,
    hamming)``, a_id < b_id, each pair once.

    Scale: candidates are an equi-join on skinny (part_idx,
    part_value) keys — lossless (no false negatives) and bounded by
    genuine near-dup density plus the random-collision term
    n²/2^(64/(h+1)); all Column arithmetic, zero UDFs past the
    hashing itself.
    """
    h = int(max_hamming)
    if not 0 <= h <= 16:
        raise ValueError(f"max_hamming must be in [0, 16]: {max_hamming}")
    parts = h + 1
    width = 64 // parts

    def _slice(i):
        # the LAST part absorbs the remainder bits (64 - parts*width),
        # so all 64 bits are keyed by exactly one part — with a plain
        # 64//parts width the top remainder bits would be keyed by no
        # part, silently weakening candidate pruning (recall stays
        # lossless either way; this is a pruning-strength fix)
        w_i = (64 - i * width) if i == parts - 1 else width
        shifted = F.shiftrightunsigned(F.col("__h"), i * width)
        if w_i >= 64:
            return shifted
        return shifted.bitwiseAND(F.lit((1 << w_i) - 1).cast("long"))

    base = hashes.select(
        F.col(id_col).alias("__id"), F.col(hash_col).alias("__h"))
    keys = base.select(
        "__id", "__h",
        F.explode(F.array(*[
            F.struct(F.lit(i).alias("p"), _slice(i).alias("v"))
            for i in range(parts)
        ])).alias("__k"),
    ).select("__id", "__h", F.col("__k.p").alias("__p"),
             F.col("__k.v").alias("__v"))
    a = keys.select(F.col("__id").alias("a_id"), F.col("__h").alias("__ha"),
                    "__p", "__v")
    b = keys.select(F.col("__id").alias("b_id"), F.col("__h").alias("__hb"),
                    "__p", "__v")
    cand = (
        a.join(b, ["__p", "__v"])
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", "__ha", "__hb")
        .distinct()
    )
    ham = F.bit_count(F.col("__ha").bitwiseXOR(F.col("__hb")))
    return (
        cand.withColumn("hamming", ham)
        .filter(F.col("hamming") <= h)
        .select("a_id", "b_id", "hamming")
    )
