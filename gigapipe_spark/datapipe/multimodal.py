"""Multimodal column handling: opaque binary payloads + typed metadata,
with decode / feature-extract stages as Arrow-batched Pandas stages.

The container has no image/audio libraries, so the decode step is a
clearly-marked STUB (deterministic byte-level features). The Spark-side
plumbing — schema, batch shape, mapInPandas signature, partition
behavior — is real and tested; swapping in a real decoder is a local
change inside `_decode_batch`.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

PAYLOAD_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField(
            "meta",
            T.StructType(
                [
                    T.StructField("mime", T.StringType(), True),
                    T.StructField("size_bytes", T.LongType(), True),
                    T.StructField("source", T.StringType(), True),
                ]
            ),
            True,
        ),
    ]
)

FEATURE_SCHEMA = (
    "doc_id long, size_bytes long, n_chunks int, feature array<double>"
)

_CHUNK = 64


def attach_payload(docs: DataFrame) -> DataFrame:
    """documents → multimodal rows: text bytes as the opaque payload
    (stand-in for image/audio blobs) + typed metadata struct."""
    return docs.select(
        F.col("doc_id"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            F.lit("application/octet-stream").alias("mime"),
            F.length(F.encode("text", "utf-8")).cast("long").alias("size_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def decode_real(payload: bytes) -> dict:
    """Real decoder for the formats decodable WITHOUT external media
    libraries: binary PPM (P6, RGB), PGM (P5, grayscale) and
    uncompressed 24-bit BMP — full header parse, pixel array reshaped
    to (height, width, channels).

    JPEG/PNG/video still need PIL/av, which this container does not
    ship — those payloads raise NotImplementedError and the pipeline
    falls back to the byte-level stub features."""
    import numpy as np

    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    if payload[:2] not in (b"P6", b"P5"):
        raise NotImplementedError(
            "only PPM(P6)/PGM(P5)/BMP decode without media libraries; "
            "other formats fall back to byte-level stub features"
        )
    channels = 3 if payload[:2] == b"P6" else 1
    # header: magic, width, height, maxval as whitespace-separated
    # tokens, '#'-comments allowed between tokens
    pos = 2
    tokens: list[int] = []
    while len(tokens) < 3:
        while pos < len(payload) and payload[pos : pos + 1].isspace():
            pos += 1
        if payload[pos : pos + 1] == b"#":
            while pos < len(payload) and payload[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(payload) and not payload[pos : pos + 1].isspace():
            pos += 1
        tokens.append(int(payload[start:pos]))
    pos += 1  # single whitespace after maxval, then raw pixels
    width, height, maxval = tokens
    if maxval > 255:
        raise NotImplementedError("16-bit PPM not supported")
    n = width * height * channels
    pixels = np.frombuffer(payload, dtype=np.uint8, count=n, offset=pos)
    return {
        "width": width,
        "height": height,
        "channels": channels,
        "pixels": pixels.reshape(height, width, channels),
    }


def _decode_bmp(payload: bytes) -> dict:
    """Uncompressed 24-bit BMP (BITMAPINFOHEADER, BI_RGB): rows padded
    to 4 bytes, stored bottom-up (negative height = top-down) in BGR
    order; decoded to top-down RGB like every other decoder here."""
    import struct as _struct

    import numpy as np

    if len(payload) < 54:
        raise ValueError("truncated BMP header")
    data_offset = _struct.unpack_from("<I", payload, 10)[0]
    width, height = _struct.unpack_from("<ii", payload, 18)
    planes, bits = _struct.unpack_from("<HH", payload, 26)
    compression = _struct.unpack_from("<I", payload, 30)[0]
    if bits != 24 or compression != 0:
        raise NotImplementedError(
            f"only 24-bit uncompressed BMP supported (bits={bits}, "
            f"compression={compression})"
        )
    top_down = height < 0
    height = abs(height)
    row_size = (width * 3 + 3) & ~3  # 4-byte row padding
    rows = np.frombuffer(
        payload, dtype=np.uint8, count=row_size * height, offset=data_offset
    ).reshape(height, row_size)[:, : width * 3]
    px = rows.reshape(height, width, 3)
    if not top_down:
        px = px[::-1]
    return {
        "width": width,
        "height": height,
        "channels": 3,
        "pixels": px[:, :, ::-1],  # BGR → RGB
    }


def decode_wav(payload: bytes) -> dict:
    """Real WAV (RIFF PCM) decode via the stdlib `wave` module: header
    fields + the raw sample array (uint8 for 8-bit, int16 for 16-bit).
    Audio IS decodable without external libs — this is not a stub."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(payload), "rb") as w:
        channels = w.getnchannels()
        rate = w.getframerate()
        width = w.getsampwidth()
        n = w.getnframes()
        raw = w.readframes(n)
    dtype = {1: np.uint8, 2: np.dtype("<i2")}.get(width)
    if dtype is None:
        raise NotImplementedError(f"sample width {width} not supported")
    samples = np.frombuffer(raw, dtype=dtype)
    return {
        "channels": channels,
        "sample_rate": rate,
        "sample_width": width,
        "n_frames": n,
        "samples": samples,
    }


AUDIO_SCHEMA = (
    "doc_id long, n_frames long, sample_rate long, channels long,"
    " duration_ms double, mean_amp double, rms double"
)


def _audio_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Audio feature stage: per payload (n_frames, rate, channels,
    duration, mean amplitude, RMS around the 8-bit midpoint / 16-bit
    zero). Arrow-batched like the image decode stage."""
    import numpy as np

    for pdf in batches:
        rows = []
        for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
            raw = bytes(payload) if payload is not None else b""
            try:
                wav = decode_wav(raw)
            except Exception:
                rows.append((doc_id, 0, 0, 0, 0.0, 0.0, 0.0))
                continue
            s = wav["samples"].astype("float64")
            mid = 128.0 if wav["sample_width"] == 1 else 0.0
            rows.append(
                (
                    doc_id,
                    wav["n_frames"],
                    wav["sample_rate"],
                    wav["channels"],
                    wav["n_frames"] * 1000.0 / max(wav["sample_rate"], 1),
                    float(s.mean()) if len(s) else 0.0,
                    float(np.sqrt(((s - mid) ** 2).mean())) if len(s) else 0.0,
                )
            )
        yield pd.DataFrame(
            rows,
            columns=[
                "doc_id", "n_frames", "sample_rate", "channels",
                "duration_ms", "mean_amp", "rms",
            ],
        )


def audio_features(multimodal: DataFrame) -> DataFrame:
    """payload → audio features via mapInPandas (same seam as
    extract_features; the decoder is the stdlib `wave` module — real,
    not stubbed)."""
    return multimodal.select("doc_id", "payload").mapInPandas(
        _audio_batch, schema=AUDIO_SCHEMA
    )


WAV_FRAMES, WAV_RATE = 256, 8000


def attach_wav_payload(docs: DataFrame) -> DataFrame:
    """documents → REAL audio payloads: each text's first 256 bytes
    (zero-padded) become the samples of an 8-bit mono 8 kHz PCM WAV.
    The 44-byte RIFF header is constant for the fixed frame count, so
    the whole payload is built JVM-side and the decode stage parses a
    genuine WAV end-to-end (oracle-checkable)."""
    import struct as _struct

    n = WAV_FRAMES
    header = (
        b"RIFF"
        + _struct.pack("<I", 36 + n)
        + b"WAVEfmt "
        + _struct.pack("<IHHIIHH", 16, 1, 1, WAV_RATE, WAV_RATE, 1, 8)
        + b"data"
        + _struct.pack("<I", n)
    )
    samples = F.rpad(
        F.substring(F.encode("text", "utf-8"), 1, n), n, F.lit(bytes([0]))
    )
    payload = F.concat(F.lit(header), samples)
    return docs.select(
        F.col("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("audio/wav").alias("mime"),
            F.length(payload).cast("long").alias("size_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


BMP_W, BMP_H = 16, 4


def attach_bmp_payload(docs: DataFrame) -> DataFrame:
    """documents → REAL 24-bit BMP payloads (16×4, row size 48 is
    already 4-aligned): the text's first 192 bytes are the pixel array.
    Constant 54-byte header, bottom-up BGR per the format."""
    import struct as _struct

    row = BMP_W * 3
    data = row * BMP_H
    header = (
        b"BM"
        + _struct.pack("<IHHI", 54 + data, 0, 0, 54)
        + _struct.pack("<IiiHHIIiiII", 40, BMP_W, BMP_H, 1, 24, 0, data, 2835, 2835, 0, 0)
    )
    pixels = F.rpad(
        F.substring(F.encode("text", "utf-8"), 1, data), data, F.lit(bytes([0]))
    )
    payload = F.concat(F.lit(header), pixels)
    return docs.select(
        F.col("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/bmp").alias("mime"),
            F.length(payload).cast("long").alias("size_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def _decode_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Decode stage: REAL decode for PPM/PGM payloads (decode_real),
    byte-level stub features for everything else.

    Real-decoded feature = [width, height, channels, mean(ch0),
    mean(ch1), mean(ch2)] (grayscale repeats its single channel) —
    deterministic and SQL-expressible, so the driver can oracle-check
    the real path. Stub feature = 16-bin byte histogram.

    Arrow-batched: each pdf is a columnar batch; per-row Python cost is
    one numpy pass over the payload bytes.
    """
    import numpy as np

    for pdf in batches:
        feats = []
        sizes = []
        chunks = []
        for payload in pdf["payload"]:
            raw = payload if payload is not None else b""
            sizes.append(len(raw))
            chunks.append(int(np.ceil(len(raw) / _CHUNK)))
            try:
                img = decode_real(bytes(raw))
                px = img["pixels"].astype("float64")
                means = px.reshape(-1, img["channels"]).mean(axis=0)
                if img["channels"] == 1:
                    means = np.repeat(means, 3)
                feats.append(
                    [
                        float(img["width"]),
                        float(img["height"]),
                        float(img["channels"]),
                        *means.tolist(),
                    ]
                )
                continue
            except (NotImplementedError, ValueError):
                pass
            b = np.frombuffer(raw, dtype=np.uint8)
            hist = np.bincount(b >> 4, minlength=16).astype("float64")
            total = max(hist.sum(), 1.0)
            feats.append((hist / total).tolist())
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "size_bytes": sizes,
                "n_chunks": chunks,
                "feature": feats,
            }
        )


PPM_W, PPM_H = 16, 4  # fixture image dims: 16×4 RGB = 192 pixel bytes


def attach_ppm_payload(docs: DataFrame) -> DataFrame:
    """documents → REAL image payloads: each text's first 192 bytes
    (zero-padded) become the pixel data of a 16×4 binary PPM (P6) —
    a deterministic real format the decode stage parses for real,
    making the decode path oracle-checkable end-to-end."""
    n = PPM_W * PPM_H * 3
    pixels = F.rpad(F.substring(F.encode("text", "utf-8"), 1, n), n, F.lit(bytes([0])))
    payload = F.concat(
        F.encode(F.lit(f"P6\n{PPM_W} {PPM_H}\n255\n"), "utf-8"), pixels
    )
    return docs.select(
        F.col("doc_id"),
        payload.alias("payload"),
        F.struct(
            F.lit("image/x-portable-pixmap").alias("mime"),
            F.length(payload).cast("long").alias("size_bytes"),
            F.col("source").alias("source"),
        ).alias("meta"),
    )


def extract_features(multimodal: DataFrame) -> DataFrame:
    """payload → feature vectors via mapInPandas (the real-decoder seam).

    Repartition note: feature extraction is CPU-bound per row; at scale
    the input should be repartitioned to ~cores×4 before this stage so
    Arrow batches stay balanced."""
    return multimodal.select("doc_id", "payload").mapInPandas(
        _decode_batch, schema=FEATURE_SCHEMA
    )


RESIZE_SCHEMA = "doc_id long, resized binary, orig_bytes long"


def _resize_batch_fn(target: int):
    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            out, sizes = [], []
            for payload in pdf["payload"]:
                b = np.frombuffer(
                    payload if payload is not None else b"", dtype=np.uint8
                )
                sizes.append(len(b))
                if len(b) == 0:
                    out.append(bytes(target))
                    continue
                # stride resample to exactly `target` samples — the
                # 1-D analogue of nearest-neighbor image resize
                idx = np.linspace(0, len(b) - 1, target).astype(np.int64)
                out.append(b[idx].tobytes())
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "resized": out, "orig_bytes": sizes}
            )

    return _resize


def resize_payload(multimodal: DataFrame, target_bytes: int = 256) -> DataFrame:
    """payload → fixed-size representation via deterministic stride
    resampling (nearest-neighbor): the resize/thumbnail stage of an
    image/video pipeline, with the same mapInPandas seam as
    extract_features — swap the stride picker for PIL.Image.resize when
    a real decoder is available."""
    return multimodal.select("doc_id", "payload").mapInPandas(
        _resize_batch_fn(target_bytes), schema=RESIZE_SCHEMA
    )


def frame_sample(multimodal: DataFrame, every_n: int = 4) -> DataFrame:
    """Deterministic frame/chunk sampling: split each payload into fixed
    chunks and keep every n-th — pure built-ins (posexplode over byte
    slices), the pattern a video frame-sampler follows."""
    chunks = F.transform(
        F.sequence(
            F.lit(0),
            F.greatest(
                (F.length("payload") - 1) / F.lit(_CHUNK), F.lit(0)
            ).cast("int"),
        ),
        lambda i: F.struct(
            i.alias("chunk_no"),
            F.substring(F.col("payload"), i * _CHUNK + 1, _CHUNK).alias("chunk"),
        ),
    )
    return (
        multimodal.select("doc_id", F.explode(chunks).alias("c"))
        .select("doc_id", F.col("c.chunk_no").alias("chunk_no"), F.col("c.chunk").alias("chunk"))
        .filter(F.pmod(F.col("chunk_no"), F.lit(every_n)) == 0)
    )


# --------------------------------------------------------- perceptual hash


def _phash_one(payload: bytes) -> int | None:
    """64-bit DCT perceptual hash of one decodable image payload.

    The classic pHash recipe: grayscale → fixed 32×32 resample →
    2-D DCT-II → keep the 8×8 low-frequency block (minus the DC term)
    → threshold each coefficient at the block median → 64 bits. Near-
    duplicate images (re-encodes, small edits, brightness shifts) land
    within a small Hamming distance; unrelated images are ~32 bits
    apart. None for payloads `decode_real` can't decode — at scale
    those rows are logged and skipped, never silently hashed."""
    import numpy as np

    img = decode_real(payload)  # raises for undecodable formats
    px = img["pixels"].astype("float64").reshape(
        img["height"], img["width"], img["channels"]
    )
    gray = px.mean(axis=2)
    # deterministic nearest-neighbor resample to 32×32 (a real deploy
    # swaps in PIL/antialiased area resize at this exact seam)
    h, w = gray.shape
    ys = (np.arange(32) * h // 32).clip(0, h - 1)
    xs = (np.arange(32) * w // 32).clip(0, w - 1)
    g = gray[np.ix_(ys, xs)]
    n = 32
    k = np.arange(n).reshape(-1, 1)
    m = np.arange(n).reshape(1, -1)
    d = np.sqrt(2.0 / n) * np.cos(np.pi * (m + 0.5) * k / n)
    d[0, :] = np.sqrt(1.0 / n)
    coef = d @ g @ d.T
    block = coef[:8, :8].flatten()[1:]  # drop DC: it's just mean brightness
    bits = block > np.median(block)
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    if val >= 1 << 63:  # two's-complement into int64
        val -= 1 << 64
    return val


def phash64(multimodal: DataFrame) -> DataFrame:
    """(doc_id, phash) for every decodable payload.

    Arrow-batched mapInPandas like the other decode stages — the numpy
    DCT runs per row inside a columnar batch, and undecodable payloads
    are dropped with per-payload error isolation (same policy as
    `_decode_batch`'s real-decode path)."""

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    h = _phash_one(bytes(payload))
                except (NotImplementedError, ValueError):
                    continue
                ids.append(doc_id)
                hashes.append(h)
            yield pd.DataFrame({"doc_id": ids, "phash": pd.array(hashes, dtype="int64")})

    return multimodal.select("doc_id", "payload").mapInPandas(
        _batch, schema="doc_id long, phash long"
    )


def phash_pairs(
    multimodal: DataFrame,
    max_hamming: int = 10,
    max_bucket: int | None = 512,
) -> DataFrame:
    """Perceptual near-duplicate image pairs: pHash signatures banded
    into `max_hamming + 1` chunks (the pigeonhole guarantee — a pair
    within the distance bound shares at least one exact chunk), then
    verified by true Hamming distance. The banding/bucket-cap/verify
    machinery is shared with SimHash text dedup (datapipe/dedup.py) —
    the 100 TB shape is identical: signatures shuffle, pixels don't.

    Returns (doc_a, doc_b, hamming)."""
    from gigapipe_spark.datapipe.dedup import hamming_pairs

    sig = phash64(multimodal).select(
        F.col("doc_id").alias("id"), F.col("phash").alias("sig")
    ).persist()
    return hamming_pairs(sig, max_hamming, max_bucket)


# ---------------------------------------------------- audio fingerprint


def _afp_one(payload: bytes) -> int | None:
    """64-bit spectral fingerprint of one WAV payload — a single-block
    Haitsma-Kalker (Philips robust hash, ISMIR 2002) signature: frame
    the signal, per frame take FFT band energies on a coarse log-ish
    grid, then bit(f, b) = sign of the band-energy DIFFERENCE delta
    between consecutive frames — robust to gain changes (energy
    differences, not levels) and small edits. 17 frames × 5 bands →
    16×4 = 64 difference bits."""
    import numpy as np

    wav = decode_wav(payload)
    s = wav["samples"].astype("float64")
    if s.size == 0:
        return None
    mid = 128.0 if wav["sample_width"] == 1 else 0.0
    s = s - mid
    n_frames, n_bands = 17, 5
    # frame the signal (truncate the tail remainder, pad tiny inputs)
    flen = max(s.size // n_frames, 1)
    need = flen * n_frames
    if s.size < need:
        s = np.pad(s, (0, need - s.size))
    frames = s[:need].reshape(n_frames, flen)
    spec = np.abs(np.fft.rfft(frames, axis=1))[:, 1:]  # drop DC
    if spec.shape[1] < n_bands:
        spec = np.pad(spec, ((0, 0), (0, n_bands - spec.shape[1])))
    # coarse band grid over the magnitude spectrum
    edges = np.linspace(0, spec.shape[1], n_bands + 1).astype(int)
    e = np.stack(
        [spec[:, a:b].sum(axis=1) for a, b in zip(edges, edges[1:])], axis=1
    )
    # bit(f, b): E(f,b)−E(f,b+1) − (E(f−1,b)−E(f−1,b+1)) > 0
    d = e[:, :-1] - e[:, 1:]
    bits = (d[1:] - d[:-1]) > 0
    val = 0
    for i, b in enumerate(bits.flatten()):
        if b:
            val |= 1 << i
    if val >= 1 << 63:
        val -= 1 << 64
    return val


def afp64(multimodal: DataFrame) -> DataFrame:
    """(doc_id, afp) audio fingerprints — same Arrow-batched seam and
    per-payload error isolation as phash64."""

    def _batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hashes = [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                if payload is None:
                    continue
                try:
                    h = _afp_one(bytes(payload))
                except Exception:
                    continue
                if h is None:
                    continue
                ids.append(doc_id)
                hashes.append(h)
            yield pd.DataFrame(
                {"doc_id": ids, "afp": pd.array(hashes, dtype="int64")}
            )

    return multimodal.select("doc_id", "payload").mapInPandas(
        _batch, schema="doc_id long, afp long"
    )


def afp_pairs(
    multimodal: DataFrame,
    max_hamming: int = 10,
    max_bucket: int | None = 512,
) -> DataFrame:
    """Audio near-duplicate pairs over the spectral fingerprints —
    third consumer of the shared pigeonhole banding core
    (dedup.hamming_pairs). Returns (doc_a, doc_b, hamming)."""
    from gigapipe_spark.datapipe.dedup import hamming_pairs

    sig = afp64(multimodal).select(
        F.col("doc_id").alias("id"), F.col("afp").alias("sig")
    ).persist()
    return hamming_pairs(sig, max_hamming, max_bucket)
