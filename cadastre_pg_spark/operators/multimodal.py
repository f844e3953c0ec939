"""Multimodal column plumbing: image/audio/video as opaque BINARY
columns + typed metadata, with decode/feature/resize/frame-sample
stages as Arrow-batched mapInPandas operators.

The Spark-side plumbing (schemas, partitioning, UDF signatures, batch
shapes) is real and tested; the actual codec calls are STUBBED — the
image/audio libraries are not in this container. Each stub either
raises NotImplementedError (strict mode) or produces a deterministic
fake derived from the payload bytes (test mode), clearly marked.
"""

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id long, kind string, payload binary, mime string, "
    "width int, height int, duration_ms long"
)

IMAGE_FEATURE_DIM = 16


def attach_media_metadata(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Cheap JVM-side metadata: payload size + sha (no decode)."""
    return df.withColumn("n_bytes", F.length(payload_col).cast("long")).withColumn(
        "payload_sha", F.sha2(F.col(payload_col), 256)
    )


def _fake_decode(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic fake 'decode': bytes -> feature vector via sha256
    expansion of the payload's lowercase hex (the hex detour keeps the
    derivation reproducible in plain SQL — DuckDB cannot sha256 a BLOB,
    so the DRIVER ORACLE for media_features replays exactly this).
    STAND-IN for a real codec (pillow/ffmpeg absent)."""
    h = hashlib.sha256(payload.hex().encode()).digest()
    raw = (h * ((dim * 4) // len(h) + 1))[: dim * 4]
    return (
        np.frombuffer(raw, dtype=np.uint32).astype(np.float64) / 2**32
    )[:dim]


def image_features(
    media: DataFrame,
    strict: bool = False,
    dim: int = IMAGE_FEATURE_DIM,
    decode_fn=None,
) -> DataFrame:
    """(media_id, payload) -> (media_id, features array<double>).

    Batch shape: one Arrow batch in, vectorized over rows.

    decode_fn is the CODEC INJECTION POINT: a callable
    (payload: bytes, dim: int) -> length-dim float sequence, shipped to
    executors inside the mapInPandas closure — a pillow/opencv-equipped
    cluster drops its real decoder into the tested batch shape without
    editing the operator. With decode_fn=None the stub applies: the
    deterministic fake, or NotImplementedError in strict mode."""

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if decode_fn is None and strict:
                raise NotImplementedError(
                    "image decode requires pillow/opencv — not in this env; "
                    "inject one via decode_fn"
                )
            fn = decode_fn if decode_fn is not None else _fake_decode
            feats = [
                np.asarray(fn(bytes(p), dim), dtype=np.float64)
                for p in pdf["payload"].values
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "features": feats,
                }
            )

    return media.select("media_id", "payload").mapInPandas(
        gen, schema="media_id long, features array<double>"
    )


def frame_sample(
    media: DataFrame, every_ms: int = 1000, strict: bool = False, decode_fn=None
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame
    timestamp (duration metadata drives the explode, JVM-side); frame
    extraction itself is the stubbed decode, or the injected
    decode_fn(payload: bytes, frame_ms: int) -> float sequence (the
    ffmpeg drop-in point, mirroring image_features.decode_fn)."""
    ts = F.explode(
        F.sequence(
            F.lit(0),
            F.greatest(F.col("duration_ms") - 1, F.lit(0)),
            F.lit(every_ms),
        )
    ).alias("frame_ms")
    frames = media.filter(F.col("kind") == "video").select(
        "media_id", "payload", ts
    )

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if decode_fn is None and strict:
                raise NotImplementedError(
                    "video decode not available; inject one via decode_fn"
                )
            fn = decode_fn if decode_fn is not None else (
                lambda p, t: _fake_decode(p + int(t).to_bytes(8, "little"), 8)
            )
            feats = [
                np.asarray(fn(bytes(p), int(t)), dtype=np.float64)
                for p, t in zip(pdf["payload"].values, pdf["frame_ms"].values)
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "frame_ms": pdf["frame_ms"].to_numpy(np.int64),
                    "features": feats,
                }
            )

    return frames.mapInPandas(
        gen, schema="media_id long, frame_ms long, features array<double>"
    )


def generate_media(spark, n: int, partitions: int = 8) -> DataFrame:
    """Deterministic synthetic media table for the plumbing tests."""

    def gen(batches):
        kinds = ["image", "audio", "video"]
        for pdf in batches:
            rows = []
            for i in pdf["id"].values:
                i = int(i)
                kind = kinds[i % 3]
                payload = hashlib.sha256(f"media:{i}".encode()).digest() * (
                    4 + i % 5
                )
                rows.append(
                    {
                        "media_id": i,
                        "kind": kind,
                        "payload": payload,
                        "mime": {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                        "width": 64 + (i % 8) * 16 if kind != "audio" else None,
                        "height": 64 + (i % 5) * 16 if kind != "audio" else None,
                        "duration_ms": 3000 + (i % 7) * 500 if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

    return spark.range(0, n, 1, partitions).mapInPandas(gen, schema=MEDIA_SCHEMA)


def _fake_decode_wide(payload: bytes, dim: int) -> np.ndarray:
    """Chunked fake decode for dim > 8: chunk c is
    sha256(hex(payload) + ':' + str(c)), each chunk yielding 8
    uint32-LE features / 2^32 — unlike _fake_decode, features do NOT
    repeat with period 8, so hash-style downstream ops (aHash) see a
    full-entropy vector. SQL-replayable chunk by chunk."""
    hexs = payload.hex()
    out: list = []
    c = 0
    while len(out) * 4 < dim * 4:
        h = hashlib.sha256(f"{hexs}:{c}".encode()).digest()
        out.extend(np.frombuffer(h, dtype=np.uint32).astype(np.float64) / 2**32)
        c += 1
    return np.asarray(out[:dim])


AHASH_BITS = 60  # 4 bands x 15 bits; bit 59 keeps the hash in BIGINT


def ahash_pairs(
    features: DataFrame,
    bits: int = AHASH_BITS,
    bands: int = 4,
    max_hamming: int = 3,
    id_col: str = "media_id",
    feat_col: str = "features",
) -> DataFrame:
    """Perceptual-hash near-duplicate pairs over decoded image feature
    vectors: aHash bit j = feat[j] >= mean(feats); candidates share at
    least one of `bands` hash bands; exact Hamming verify. With
    max_hamming <= bands - 1 the banding is COMPLETE by pigeonhole —
    the result is exactly all pairs within the Hamming radius, not an
    approximation. Output (media_a, media_b, hamming), media_a <
    media_b.

    Exactness: the mean uses the sequential 0.0-seeded Catalyst fold
    (elements are non-negative, so it replays bitwise as DuckDB
    list_reduce per the sequential-fold parity rule); bit selection
    and band extraction are integer ops. Scale shape: per-row
    arithmetic, a `bands`-way explode of the HASH table (not the
    features), a narrow-key equi-join on (band, value), bit_count
    verify — the image twin of the text simhash join. Interpreted
    Catalyst folds bound the hash stage ~10k rows/s; at real scale
    compute the hash inside the decode batch with the same sequential
    accumulation order.
    """
    assert bits % bands == 0 and bits <= 62
    assert max_hamming <= bands - 1, "banding completeness needs h <= bands-1"
    bw = bits // bands
    s = F.aggregate(F.col(feat_col), F.lit(0.0), lambda a, x: a + x)
    t = features.select(id_col, feat_col).withColumn("m", s / F.lit(float(bits)))
    # shiftleft needs a literal bit count, the index here is a Column:
    # pow(2, i) is exact for i <= 62 (powers of two are representable)
    bit = lambda x, i: (
        F.when(x >= F.col("m"), F.pow(F.lit(2.0), i).cast("long"))
        .otherwise(F.lit(0).cast("long"))
    )
    h = t.select(
        F.col(id_col).alias("mid"),
        F.aggregate(
            F.transform(F.col(feat_col), bit),
            F.lit(0).cast("long"),
            lambda a, x: a + x,
        ).alias("h"),
    )
    bexp = h.select(
        "mid",
        "h",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("bi"),
                        (
                            F.shiftright(F.col("h"), b * bw)
                            .bitwiseAND(F.lit((1 << bw) - 1))
                        ).alias("bv"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("s"),
    ).select("mid", "h", F.col("s.bi").alias("bi"), F.col("s.bv").alias("bv"))
    left = bexp.select(
        F.col("bi").alias("l_bi"),
        F.col("bv").alias("l_bv"),
        F.col("mid").alias("media_a"),
        F.col("h").alias("h_a"),
    )
    right = bexp.select(
        F.col("bi").alias("r_bi"),
        F.col("bv").alias("r_bv"),
        F.col("mid").alias("media_b"),
        F.col("h").alias("h_b"),
    )
    return (
        left.join(
            right,
            (F.col("l_bi") == F.col("r_bi"))
            & (F.col("l_bv") == F.col("r_bv"))
            & (F.col("media_a") < F.col("media_b")),
        )
        .select(
            "media_a",
            "media_b",
            F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))).alias("hamming"),
        )
        .where(F.col("hamming") <= max_hamming)
        .distinct()
    )


def _fake_pixels(payload: bytes, w: int, h: int) -> np.ndarray:
    """Deterministic fake pixel grid (h, w) in [0, 1): sha256 chain
    over the payload hex, one uint8 per pixel. STAND-IN for a real
    decoder (pillow/opencv absent)."""
    need = w * h
    out = bytearray()
    seed = payload.hex().encode()
    i = 0
    while len(out) < need:
        out += hashlib.sha256(seed + str(i).encode()).digest()
        i += 1
    return (
        np.frombuffer(bytes(out[:need]), dtype=np.uint8)
        .astype(np.float64)
        .reshape(h, w)
        / 256.0
    )


def resize_images(
    media: DataFrame,
    out_w: int = 16,
    out_h: int = 16,
    strict: bool = False,
    decode_fn=None,
) -> DataFrame:
    """Image RESIZE plumbing: (media_id, payload, width, height) ->
    (media_id, out_w, out_h, pixels array<double>) — nearest-neighbor
    downsample to a fixed thumbnail grid, the normalization step ahead
    of any visual feature extractor (aHash/pHash here consume exactly
    this grid shape). Row-vectorized inside one mapInPandas batch;
    `decode_fn(payload: bytes, w: int, h: int) -> 2D float array` is
    the codec injection point (a pillow-equipped cluster drops its
    real decoder into the tested batch shape); with decode_fn=None the
    deterministic fake-pixel stub applies, or NotImplementedError in
    strict mode.

    Nearest-neighbor index math is integer-exact ((y_out * h) // out_h)
    so the output is reproducible across any partitioning. Scale
    shape: pure map stage, no shuffle; payload bytes never leave the
    scan->Python hop, and the output row is out_w*out_h doubles
    regardless of source resolution."""

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if decode_fn is None and strict:
                raise NotImplementedError(
                    "image decode requires pillow/opencv — not in this "
                    "env; inject one via decode_fn"
                )
            fn = decode_fn if decode_fn is not None else _fake_pixels
            grids = []
            for p, w, h in zip(
                pdf["payload"].values, pdf["width"].values, pdf["height"].values
            ):
                w, h = int(w), int(h)
                img = np.asarray(fn(bytes(p), w, h), dtype=np.float64)
                ys = (np.arange(out_h) * h) // out_h
                xs = (np.arange(out_w) * w) // out_w
                grids.append(img[np.ix_(ys, xs)].ravel())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].to_numpy(np.int64),
                    "out_w": np.full(len(pdf), out_w, dtype=np.int64),
                    "out_h": np.full(len(pdf), out_h, dtype=np.int64),
                    "pixels": grids,
                }
            )

    imgs = media.filter(
        F.col("kind") == "image"
    ).select("media_id", "payload", "width", "height")
    return imgs.mapInPandas(
        gen, schema="media_id long, out_w long, out_h long, pixels array<double>"
    )


def _fake_samples(payload: bytes, n: int) -> np.ndarray:
    """Deterministic fake PCM waveform in [-1, 1): sha256 chain over
    the payload hex, one signed byte per sample. STAND-IN for a real
    audio codec (ffmpeg/librosa absent)."""
    out = bytearray()
    seed = payload.hex().encode()
    i = 0
    while len(out) < n:
        out += hashlib.sha256(seed + b"a" + str(i).encode()).digest()
        i += 1
    raw = np.frombuffer(bytes(out[:n]), dtype=np.uint8).astype(np.float64)
    return (raw - 128.0) / 128.0


def audio_features(
    media: DataFrame,
    sample_rate: int = 8000,
    frame: int = 256,
    strict: bool = False,
    decode_fn=None,
) -> DataFrame:
    """Audio FEATURE-EXTRACT plumbing — the third modality of the
    multimodal family (image_features / resize_images / frame_sample
    cover stills and video): (media_id, payload, duration_ms) ->
    (media_id, n_samples, n_frames, rms, zcr, peak), frame-windowed
    RMS energy, zero-crossing rate and absolute peak over the decoded
    waveform. `decode_fn(payload: bytes, n_samples: int) -> 1D float
    array` is the codec injection point (an ffmpeg-equipped cluster
    drops its real decoder into the tested batch shape); with
    decode_fn=None the deterministic fake-PCM stub applies, or
    NotImplementedError in strict mode.

    Row-vectorized NumPy inside one mapInPandas batch (trailing
    partial frame dropped, frame math integer-exact, so results are
    partitioning-invariant). Scale shape: pure map stage, no shuffle;
    payload bytes never leave the scan->Python hop and each row
    collapses to five scalars."""

    def gen(batches):
        for pdf in batches:
            if pdf.empty:
                continue
            if decode_fn is None and strict:
                raise NotImplementedError(
                    "audio decode requires ffmpeg/librosa — not in this "
                    "env; inject one via decode_fn"
                )
            fn = decode_fn if decode_fn is not None else _fake_samples
            rows = []
            for mid, p, dur in zip(
                pdf["media_id"].values,
                pdf["payload"].values,
                pdf["duration_ms"].values,
            ):
                n = (int(dur) * sample_rate) // 1000
                w = np.asarray(fn(bytes(p), n), dtype=np.float64)[:n]
                nf = len(w) // frame
                if nf == 0:
                    rows.append((int(mid), len(w), 0, None, None, None))
                    continue
                fr = w[: nf * frame].reshape(nf, frame)
                rms = float(np.sqrt((fr * fr).mean(axis=1)).mean())
                zc = (np.signbit(fr[:, 1:]) != np.signbit(fr[:, :-1])).mean()
                rows.append(
                    (
                        int(mid),
                        len(w),
                        nf,
                        round(rms, 6),
                        round(float(zc), 6),
                        round(float(np.abs(fr).max()), 6),
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "media_id", "n_samples", "n_frames", "rms", "zcr", "peak",
                ],
            )

    auds = media.filter(F.col("kind") == "audio").select(
        "media_id", "payload", "duration_ms"
    )
    return auds.mapInPandas(
        gen,
        schema=(
            "media_id long, n_samples long, n_frames long,"
            " rms double, zcr double, peak double"
        ),
    )
