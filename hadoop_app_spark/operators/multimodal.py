"""Multimodal column plumbing: image/audio/video as opaque binary
columns with typed metadata (north-star surface).

Decode is REAL wherever no external library is needed: PCM WAV audio
(stdlib ``wave`` + numpy), P6 PPM and uncompressed 24-bit BMP images
(pure numpy header parse). Compressed image formats (png/jpeg) and
video decode need PIL/cv2/ffmpeg — absent from this container — so
those paths raise NotImplementedError unless ``fake=True`` supplies a
deterministic fake. Everything Spark-side is real and tested
regardless: schema, Arrow batch shape, mapInPandas plumbing,
partition behavior.

Design for scale: binary payloads ride in parquet as BINARY columns
next to their metadata struct; decode/feature-extract run as
mapInPandas over Arrow record batches (payloads never cross the
Python boundary row-at-a-time); partitioning is by content hash so
one giant asset can't skew a partition beyond maxPartitionBytes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("media_type", T.StringType()),  # image|audio|video
        T.StructField("format", T.StringType()),  # png|jpeg|wav|mp4|...
        T.StructField("n_bytes", T.LongType()),
        T.StructField("content_hash", T.LongType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("media_type", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("feature", T.ArrayType(T.FloatType())),
    ]
)


def attach_media_meta(df: DataFrame, payload_col: str, media_type: str, fmt: str) -> DataFrame:
    """Wrap a binary payload column with its typed metadata struct —
    pure Catalyst expressions (length/hash stay JVM-side)."""
    return df.withColumn(
        "media_meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.length(F.col(payload_col)).cast("long").alias("n_bytes"),
            F.xxhash64(F.col(payload_col)).alias("content_hash"),
        ),
    )


def _decode_ppm(payload: bytes):
    """P6 (binary) PPM: 'P6' <ws> W <ws> H <ws> MAXVAL <single ws> RGB
    bytes. Pure numpy — no imaging library."""
    import numpy as np

    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    # header tokens may be separated by any whitespace/comments
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":  # comment to end of line
            pos = payload.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(payload[start:pos]))
    pos += 1  # single whitespace after MAXVAL
    w, h, maxval = fields
    if maxval > 255:
        raise NotImplementedError("16-bit PPM")
    px = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3, offset=pos)
    return w, h, px.reshape(h, w, 3).astype(np.float64)


def _decode_bmp(payload: bytes):
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER): BGR rows padded to 4
    bytes, stored bottom-up (negative height = top-down)."""
    import struct

    import numpy as np

    if not payload.startswith(b"BM"):
        raise ValueError("not a BMP")
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w, h_signed = struct.unpack_from("<ii", payload, 18)
    bpp = struct.unpack_from("<H", payload, 28)[0]
    compression = struct.unpack_from("<I", payload, 30)[0]
    if bpp != 24 or compression != 0:
        raise NotImplementedError(f"only uncompressed 24-bit BMP (bpp={bpp})")
    h = abs(h_signed)
    stride = (w * 3 + 3) & ~3
    rows = np.frombuffer(payload, dtype=np.uint8, count=stride * h, offset=data_off)
    img = rows.reshape(h, stride)[:, : w * 3].reshape(h, w, 3)[:, :, ::-1]  # BGR -> RGB
    if h_signed > 0:
        img = img[::-1]  # bottom-up storage -> top-down
    return w, h, img.astype(np.float64)


def _decode_image_kernel(payload: bytes, fake: bool) -> tuple[int, int, list[float]]:
    """Image decode. REAL for formats needing no imaging library: P6 PPM
    and uncompressed 24-bit BMP (pure numpy); the feature is [mean_R,
    mean_G, mean_B, mean_luma] / 255. Compressed formats (png/jpeg)
    would need PIL/cv2 — absent from this container — and raise.

    The deterministic fake (``fake=True``) derives a plausible (width,
    height, 4-dim feature) from the bytes so distributed plumbing stays
    testable with arbitrary payloads."""
    if not fake:
        if payload.startswith(b"P6"):
            w, h, img = _decode_ppm(payload)
        elif payload.startswith(b"BM"):
            w, h, img = _decode_bmp(payload)
        else:
            raise NotImplementedError(
                "compressed image decode (png/jpeg) requires PIL/cv2 (not in this container)"
            )
        means = img.reshape(-1, 3).mean(axis=0)
        luma = 0.299 * means[0] + 0.587 * means[1] + 0.114 * means[2]
        feat = [float(means[0] / 255.0), float(means[1] / 255.0), float(means[2] / 255.0), float(luma / 255.0)]
        return w, h, feat
    h = 0
    for b in payload[:64]:
        h = (h * 31 + b) % 1_000_000_007
    width = 64 + (h % 512)
    height = 64 + ((h // 512) % 512)
    feat = [((h >> (8 * i)) & 0xFF) / 255.0 for i in range(4)]
    return width, height, feat


def extract_image_features(
    df: DataFrame, id_col: str, payload_col: str, fake: bool = True, on_error: str = "raise"
) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows
    out. One Python fn call per batch (not per row). ``on_error='skip'``
    drops undecodable payloads instead of failing the pass (same
    corpus-scale escape hatch as the audio/resize kernels)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    w, h, feat = _decode_image_kernel(bytes(payload), fake)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                rows.append((int(asset_id), "image", len(payload), w, h, feat))
            yield pd.DataFrame(rows, columns=[f.name for f in FEATURE_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, FEATURE_SCHEMA)


RESIZED_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("payload", T.BinaryType()),  # P6 PPM re-encode
    ]
)


def _encode_ppm(img) -> bytes:
    h, w, _ = img.shape
    return b"P6\n%d %d\n255\n" % (w, h) + img.astype("uint8").tobytes()


def _resize_kernel(payload: bytes, width: int, height: int) -> bytes:
    """Nearest-neighbor resize for the library-free formats (P6 PPM /
    uncompressed BMP in, P6 PPM out) — pure numpy index selection.
    Bilinear/Lanczos would need PIL/cv2; nearest is the standard cheap
    path for thumbnail/feature pipelines and is exactly reproducible."""
    import numpy as np

    if payload.startswith(b"P6"):
        _, _, img = _decode_ppm(payload)
    elif payload.startswith(b"BM"):
        _, _, img = _decode_bmp(payload)
    else:
        raise NotImplementedError("resize supports P6 PPM / uncompressed BMP only")
    src_h, src_w = img.shape[0], img.shape[1]
    ys = (np.arange(height) * src_h // height).clip(0, src_h - 1)
    xs = (np.arange(width) * src_w // width).clip(0, src_w - 1)
    return _encode_ppm(img[np.ix_(ys, xs)])


def resize_images(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    width: int,
    height: int,
    fake: bool = False,
    on_error: str = "raise",
) -> DataFrame:
    """mapInPandas image resize (the brief's decode/extract/RESIZE/
    frame-sample quartet): Arrow batches in, (asset_id, w, h, resized
    PPM payload) out. ``fake=True`` emits a deterministic solid-color
    image derived from the payload hash so non-decodable corpora still
    exercise the full plumbing; ``on_error='skip'`` drops undecodable
    payloads instead of failing the pass."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if fake:
                        h = 0
                        for b in bytes(payload)[:64]:
                            h = (h * 31 + b) % 1_000_000_007
                        img = np.full((height, width, 3), (h % 256, (h >> 8) % 256, (h >> 16) % 256), dtype=np.uint8)
                        out = _encode_ppm(img)
                    else:
                        out = _resize_kernel(bytes(payload), width, height)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                rows.append((int(asset_id), width, height, bytearray(out)))
            yield pd.DataFrame(rows, columns=[f.name for f in RESIZED_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, RESIZED_SCHEMA)


PHASH_BITS = 56
_PHASH_MOD = 1 << PHASH_BITS


def _image_phash_kernel(payload: bytes, fake: bool) -> int:
    """56-bit average-hash (aHash) perceptual fingerprint.

    REAL for the library-free formats (P6 PPM / uncompressed BMP):
    decode, BT.601 grayscale, nearest-neighbor downsample to an 8x7
    grid (the resize kernel's index-selection trick), threshold each
    cell at the grid mean — bit i set iff cell i >= mean. Small
    shifts/brightness changes flip few bits, so near-identical images
    land within a small Hamming distance: the standard crawl-scale
    image-dedup fingerprint. Compressed formats raise (no PIL/cv2 in
    this container), same boundary as the feature/resize kernels.

    ``fake=True``: 31-poly fold of the first 64 payload bytes mod
    2^56 — deterministic and oracle-reproducible (the image_features
    hex-fold convention), so the distributed banding/verify plumbing
    is value-checked even where decode is stubbed."""
    if not fake:
        import numpy as np

        if payload.startswith(b"P6"):
            w, h, img = _decode_ppm(payload)
        elif payload.startswith(b"BM"):
            w, h, img = _decode_bmp(payload)
        else:
            raise NotImplementedError(
                "compressed image decode (png/jpeg) requires PIL/cv2 (not in this container)"
            )
        luma = img.astype("float64") @ [0.299, 0.587, 0.114]
        ys = (np.arange(7) * h) // 7
        xs = (np.arange(8) * w) // 8
        grid = luma[np.ix_(ys, xs)]
        bits = (grid >= grid.mean()).flatten()
        return int(sum(1 << i for i, b in enumerate(bits) if b))
    acc = 0
    for b in payload[:64]:
        acc = (acc * 31 + b) % _PHASH_MOD
    return acc


def image_phash(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    fake: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """[asset_id, phash]: Arrow-batched perceptual hashing — one
    int64 per image, the corpus-scale reduction that makes image
    dedup a 64-bit problem instead of a pixel problem."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    hv = _image_phash_kernel(bytes(payload), fake)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                rows.append((int(asset_id), hv))
            yield pd.DataFrame(rows, columns=["asset_id", "phash"])

    return df.select(id_col, payload_col).mapInPandas(
        run, "asset_id long, phash long"
    )


def image_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    max_hamming: int = 6,
    fake: bool = True,
) -> DataFrame:
    """[id_a, id_b, hamming]: image pairs whose perceptual hashes are
    within ``max_hamming`` bits — crawl-scale image dedup.

    Candidate generation is the 56-bit Hamming banding the text
    SimHash path uses (operators/dedup): 7 bands of 8 bits; by
    pigeonhole any pair within Hamming distance 6 shares at least one
    untouched band, so recall is GUARANTEED at the default threshold
    (max_hamming > 6 raises — silent recall loss is worse than an
    error). Everything after the hash kernel is pure Catalyst:
    explode 7 (band, key) rows per image, equi-join per band,
    distinct, then the exact bit_count(xor) verify. Scale shape: the
    only corpus-sized exchange is the banded key join; band keys are
    8-bit so the join is hash-partitioned 7 x 256 ways max — skew
    shows up only if thousands of images share a band byte, exactly
    the boilerplate-detection property the text twin documents."""
    if max_hamming > 6:
        raise ValueError(
            "7x8-bit banding guarantees recall only to Hamming 6; "
            "raise bands (smaller band width) instead of silently losing pairs"
        )
    hashes = image_phash(df, id_col, payload_col, fake=fake)
    bands = hashes.select(
        "asset_id",
        "phash",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("band"),
    ).select(
        "asset_id",
        "phash",
        "band",
        F.expr("shiftright(phash, 8 * band) & 255").alias("key"),
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("id_a"),
            F.col("b.asset_id").alias("id_b"),
            F.col("a.phash").alias("ph_a"),
            F.col("b.phash").alias("ph_b"),
        )
        .distinct()
    )
    ham = F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b")))
    return (
        pairs.select("id_a", "id_b", ham.cast("int").alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


PHASH_WIDE_BANDS = 16
PHASH_WIDE_KEY_BITS = 16
_WIDE_KEY_MOD = 1 << PHASH_WIDE_KEY_BITS


def _image_phash256_kernel(payload: bytes, fake: bool) -> list:
    """256-bit average-hash as 16 x 16-bit band keys — the SCALE form
    of the 56-bit kernel above.

    Why wider: banding recall needs bands x key-bits = hash bits, and
    at 7 x 8-bit bands the join has at most 1,792 distinct keys —
    expected bucket population N/256 per band, so candidate pairs grow
    ~N^2/256 per band: quadratic-class at crawl-scale image counts.
    16 bands x 16-bit keys give 65,536-key buckets (bucket population
    N/65,536) AND a pigeonhole recall guarantee out to Hamming
    distance 15 instead of 6.

    REAL for P6 PPM / uncompressed BMP: BT.601 grayscale, 16x16
    nearest-neighbor grid, threshold at the grid mean; grid bit j
    (row-major) lands in key j//16 at bit position j%16. Compressed
    formats raise, same boundary as the 56-bit kernel.

    ``fake=True``: 16 independent 31-poly folds of the first 64
    payload bytes, seeded by the band index, each mod 2^16 — tiny
    integers, so the DuckDB oracle reproduces every key with plain
    BIGINT arithmetic (no overflow)."""
    if not fake:
        import numpy as np

        if payload.startswith(b"P6"):
            w, h, img = _decode_ppm(payload)
        elif payload.startswith(b"BM"):
            w, h, img = _decode_bmp(payload)
        else:
            raise NotImplementedError(
                "compressed image decode (png/jpeg) requires PIL/cv2 (not in this container)"
            )
        luma = img.astype("float64") @ [0.299, 0.587, 0.114]
        ys = (np.arange(16) * h) // 16
        xs = (np.arange(16) * w) // 16
        grid = luma[np.ix_(ys, xs)]
        bits = (grid >= grid.mean()).flatten()
        keys = []
        for band in range(16):
            k = 0
            for b in range(16):
                if bits[band * 16 + b]:
                    k |= 1 << b
            keys.append(k)
        return keys
    out = []
    for seed in range(16):
        acc = seed
        for b in payload[:64]:
            acc = (acc * 31 + b) % _WIDE_KEY_MOD
        out.append(acc)
    return out


def image_phash256(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    fake: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """[asset_id, keys]: Arrow-batched 256-bit perceptual hashing;
    ``keys`` is the 16-element array of 16-bit band keys the wide
    near-dup join bands on."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    keys = _image_phash256_kernel(bytes(payload), fake)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                rows.append((int(asset_id), keys))
            yield pd.DataFrame(rows, columns=["asset_id", "keys"])

    return df.select(id_col, payload_col).mapInPandas(
        run, "asset_id long, keys array<int>"
    )


def image_near_dup_pairs_wide(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    max_hamming: int = 15,
    fake: bool = True,
) -> DataFrame:
    """[id_a, id_b, hamming]: the crawl-scale image near-dup — 256-bit
    aHash, 16 bands x 16-bit keys, exact Hamming verify.

    Same plumbing as :func:`image_near_dup_pairs` but with 65,536
    distinct keys per band instead of 256 (expected bucket population
    N/65,536 — the candidate join stays linear ~256x further up the
    corpus-size curve) and pigeonhole-guaranteed recall out to
    Hamming distance 15 of 256 instead of 6 of 56. Everything past
    the hash kernel is pure Catalyst: posexplode the key array,
    per-band equi-join, distinct, then an exact summed
    bit_count(xor) over the zipped key arrays. The 56-bit form stays
    as the compat/oracle arm for existing callers."""
    if max_hamming > PHASH_WIDE_BANDS - 1:
        raise ValueError(
            "16x16-bit banding guarantees recall only to Hamming 15; "
            "raise bands (smaller band width) instead of silently losing pairs"
        )
    hashes = image_phash256(df, id_col, payload_col, fake=fake)
    bands = hashes.select(
        "asset_id", "keys", F.posexplode("keys").alias("band", "key")
    )
    a, b = bands.alias("a"), bands.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.key") == F.col("b.key"))
            & (F.col("a.asset_id") < F.col("b.asset_id")),
        )
        .select(
            F.col("a.asset_id").alias("id_a"),
            F.col("b.asset_id").alias("id_b"),
            F.col("a.keys").alias("ka"),
            F.col("b.keys").alias("kb"),
        )
        .distinct()
    )
    ham = F.aggregate(
        F.zip_with("ka", "kb", lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    )
    return pairs.select("id_a", "id_b", ham.cast("int").alias("hamming")).where(
        F.col("hamming") <= max_hamming
    )


AUDIO_FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("chunk_index", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def audio_chunk_plan(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    sample_width: int = 2,
    samples_per_chunk: int = 320,
) -> DataFrame:
    """Audio chunking plan: one row per fixed-size hop window (the shape a
    resampler/featurizer consumes). Pure Catalyst — payload length drives
    sample count (PCM ``sample_width`` bytes/sample), ``sequence``+``explode``
    fan out the chunks; the byte decode itself stays in the kernel below.

    A payload always yields >=1 chunk row (empty audio still has an entry,
    with n_in_chunk=0) so downstream joins see every asset.
    """
    n_samples = F.expr(f"length({payload_col}) div {sample_width}")
    n_chunks = F.greatest(
        F.ceil(n_samples / F.lit(float(samples_per_chunk))).cast("long"), F.lit(1).cast("long")
    )
    out = df.select(
        F.col(id_col).alias("asset_id"),
        F.explode(F.sequence(F.lit(0).cast("long"), n_chunks - 1)).alias("chunk_index"),
        n_samples.alias("_n_samples"),
    )
    start = F.col("chunk_index") * samples_per_chunk
    return out.select(
        "asset_id",
        F.col("chunk_index").cast("int").alias("chunk_index"),
        start.cast("long").alias("start_sample"),
        F.least(F.lit(samples_per_chunk).cast("long"), F.col("_n_samples") - start).alias(
            "n_in_chunk"
        ),
    )


def _audio_rms_kernel(payload: bytes, sample_width: int, samples_per_chunk: int):
    """Deterministic fake decode for the oracle-gated queries: treats the
    raw bytes as little-endian PCM and computes per-chunk RMS with numpy
    — same batch shape as the real WAV kernel below."""
    import numpy as np

    dtypes = {1: "<i1", 2: "<i2", 4: "<i4"}
    if sample_width not in dtypes:
        raise NotImplementedError(f"unsupported PCM sample width {sample_width}")
    usable = len(payload) - (len(payload) % sample_width)
    samples = np.frombuffer(payload[:usable], dtype=dtypes[sample_width]).astype(np.float64)
    if samples.size == 0:
        return [(0, 0, 0.0)]
    chunks = []
    for i, off in enumerate(range(0, samples.size, samples_per_chunk)):
        c = samples[off : off + samples_per_chunk]
        chunks.append((i, int(c.size), float(np.sqrt(np.mean(c * c)))))
    return chunks


def _audio_wav_kernel(payload: bytes, samples_per_chunk: int):
    """REAL decode: PCM WAV (RIFF) via stdlib ``wave`` + numpy — no
    external audio library needed. Multi-channel audio is mixed to mono
    by channel mean; 8-bit (unsigned), 16-bit, and 32-bit PCM widths are
    supported (24-bit WAV is rejected — ``wave`` hands back packed bytes
    numpy has no native dtype for). Compressed formats (mp3/ogg/flac)
    would need soundfile/librosa and raise here."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        n_channels = w.getnchannels()
        width = w.getsampwidth()
        frames = w.readframes(w.getnframes())
    if width == 1:
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.float64) - 128.0
    elif width == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.float64)
    elif width == 4:
        samples = np.frombuffer(frames, dtype="<i4").astype(np.float64)
    else:
        raise NotImplementedError(f"unsupported PCM sample width {width} (24-bit WAV)")
    if n_channels > 1:
        samples = samples.reshape(-1, n_channels).mean(axis=1)
    if samples.size == 0:
        return [(0, 0, 0.0)]
    chunks = []
    for i, off in enumerate(range(0, samples.size, samples_per_chunk)):
        c = samples[off : off + samples_per_chunk]
        chunks.append((i, int(c.size), float(np.sqrt(np.mean(c * c)))))
    return chunks


def extract_audio_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    sample_width: int = 2,
    samples_per_chunk: int = 320,
    fake: bool = True,
    on_error: str = "raise",
) -> DataFrame:
    """mapInPandas per-chunk audio feature extraction (RMS per hop
    window): Arrow batches in, chunk-feature rows out. Mirrors
    extract_image_features.

    ``fake=True`` (default, used by the oracle-gated queries) interprets
    raw bytes as PCM; ``fake=False`` decodes real PCM WAV containers via
    the stdlib ``wave`` kernel. ``on_error='skip'`` drops undecodable
    payloads instead of failing the job — at corpus scale a handful of
    truncated files must not kill a 1000-executor pass (pair with an
    upstream ``observe`` counter when auditing drop rates)."""
    if on_error not in ("raise", "skip"):
        raise ValueError(f"on_error must be 'raise' or 'skip', got {on_error!r}")

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for asset_id, payload in zip(pdf[id_col], pdf[payload_col]):
                try:
                    if fake:
                        decoded = _audio_rms_kernel(bytes(payload), sample_width, samples_per_chunk)
                    else:
                        decoded = _audio_wav_kernel(bytes(payload), samples_per_chunk)
                except Exception:
                    if on_error == "raise":
                        raise
                    continue
                for idx, n, rms in decoded:
                    rows.append((int(asset_id), idx, n, rms))
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURE_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(run, AUDIO_FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, payload_col: str, every_n: int = 30) -> DataFrame:
    """Video frame-sampling STUB: emits the (asset, frame_index) plan
    rows a real decoder would fill — fan-out is real Spark (explode),
    only the pixel decode is faked (frame payload = null)."""
    n_frames = (F.length(F.col(payload_col)) % 300 + 1).cast("int")  # fake duration from size
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select(
        F.col(id_col).alias("asset_id"),
        F.explode(idx).alias("frame_index"),
        F.lit(None).cast("binary").alias("frame_payload"),
    )
