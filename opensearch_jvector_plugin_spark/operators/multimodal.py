"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, processed through Arrow-batched mapInPandas.

Round 6: the decode step is REAL for three public uncompressed formats —
PPM/BMP images, PCM WAV audio, YUV4MPEG2 video — via the pure-numpy/stdlib
codecs in operators/media_codecs.py (this container has no PIL/ffmpeg;
those libraries remain an optional fallback for compressed formats, probed
at call time inside the kernel). Feature extraction is likewise real:
luma/gradient/quadrant statistics and a DCT perceptual hash for images,
RMS/ZCR/spectral-centroid for audio, sampled luma thumbnails for video.

Design for 100 TB: payloads never pass through a shuffle — every operator
here is a narrow mapInPandas over the scan, so Tungsten reads parquet row
groups, Arrow ships them to Python in bounded batches, and only small
derived columns (features, metadata, thumbnails) flow downstream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .media_codecs import (
    Y4MVideo,
    audio_feature_vector,
    box_resize,
    decode_bmp,
    decode_ppm,
    encode_ppm,
    encode_wav,
    encode_y4m,
    image_feature_vector,
    phash64,
    to_grayscale,
)

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.IntegerType(), True),
    ]
)

# Magic prefixes of the REAL formats the synthesizer emits and the numpy
# codecs decode (plus the compressed formats PIL would handle).
_MAGIC = {
    "image": b"P6",
    "audio": b"RIFF",
    "video": b"YUV4MPEG2",
}
_KINDS = ["image", "audio", "video"]


def _pil_image():
    """Optional-dependency probe, evaluated at CALL time (inside the
    kernel, so each executor probes its own environment): returns the PIL
    Image module when Pillow is installed, else None. The numpy codecs
    handle PPM/BMP without it; PIL extends decode to PNG/JPEG/etc."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


REAL_DECODERS_AVAILABLE = True  # PPM/BMP/WAV/Y4M decode with numpy alone


def _decode_rgb(payload: bytes):
    """(h, w, 3) uint8 via the numpy codecs, PIL as the compressed-format
    fallback; raises NotImplementedError for formats neither handles."""
    b = bytes(payload)
    if b.startswith(b"P6"):
        return decode_ppm(b)
    if b.startswith(b"BM"):
        return decode_bmp(b)
    pil = _pil_image()
    if pil is not None:
        import io

        return np.asarray(pil.open(io.BytesIO(b)).convert("RGB"))
    raise NotImplementedError(
        "real image decode for this format requires PIL/libvips - not "
        "available; PPM and BMP decode natively"
    )


def synthesize_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic REAL assets: every payload is a decodable media file —
    image = binary PPM (gradient + id-keyed sinusoid), audio = 16-bit PCM
    WAV (id-keyed sine mix at 8 kHz), video = YUV4MPEG2 (id-keyed moving
    gradient, 10 fps). Pure functions of (seed, asset_id), so re-evaluation
    anywhere in the cluster reproduces identical bytes."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                i = int(i)
                kind = _KINDS[i % 3]
                phase = (seed * 31 + i * 7) % 97
                if kind == "image":
                    w = 24 + (i % 5) * 8
                    h = 16 + ((i * 3) % 5) * 8
                    yy, xx = np.mgrid[0:h, 0:w]
                    base = (
                        (xx * 255.0 / max(w - 1, 1))
                        + 40.0 * np.sin((yy + phase) / 3.0)
                    )
                    img = np.stack(
                        [
                            np.clip(base, 0, 255),
                            np.clip(255 - base, 0, 255),
                            np.clip((yy * 255.0 / max(h - 1, 1)), 0, 255),
                        ],
                        axis=2,
                    ).astype(np.uint8)
                    rows.append((i, kind, encode_ppm(img), w, h, None))
                elif kind == "audio":
                    rate = 8000
                    dur_s = 0.25 + (i % 4) * 0.25
                    t = np.arange(int(rate * dur_s)) / rate
                    f0 = 220.0 * (1 + (i % 6))
                    sig = 0.5 * np.sin(2 * np.pi * f0 * t) + 0.2 * np.sin(
                        2 * np.pi * (f0 * 2 + phase) * t
                    )
                    rows.append(
                        (i, kind, encode_wav(sig, rate), None, None,
                         int(dur_s * 1000))
                    )
                else:
                    w, h, fps = 32, 24, 10
                    nf = 2 + i % 5
                    yy, xx = np.mgrid[0:h, 0:w]
                    frames = np.stack(
                        [
                            np.clip(
                                (xx + yy + phase + 13 * f) % 256, 0, 255
                            ).astype(np.uint8)
                            for f in range(nf)
                        ]
                    )
                    rows.append(
                        (i, kind, encode_y4m(frames, fps=fps), w, h,
                         int(nf * 1000 / fps))
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "asset_id", "kind", "payload", "width", "height",
                    "duration_ms",
                ],
            )

    return spark.range(0, n, 1).mapInPandas(gen, ASSET_SCHEMA)


def extract_metadata(assets: DataFrame) -> DataFrame:
    """Magic-byte sniffing + size stats — pure plumbing, no decode."""

    def sniff(batches):
        for pdf in batches:
            payloads = pdf["payload"]
            detected = []
            for p in payloads:
                b = bytes(p[:16])
                k = "unknown"
                for kind, magic in _MAGIC.items():
                    if b.startswith(magic):
                        k = kind
                        break
                detected.append(k)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "kind_declared": pdf["kind"],
                    "kind_detected": detected,
                    "n_bytes": payloads.map(len),
                }
            )

    return assets.mapInPandas(
        sniff,
        "asset_id LONG, kind_declared STRING, kind_detected STRING, n_bytes LONG",
    )


def decode_image(assets: DataFrame, fake: bool = False) -> DataFrame:
    """Decode image payloads to 4x4 grayscale thumbnails (one bounded row
    per asset regardless of source resolution).

    ``fake=False`` (default) REALLY decodes: PPM/BMP natively in numpy
    (media_codecs), anything else through the Pillow probe; grayscale is
    BT.601 luma, the resize an exact area box filter. Payload formats
    neither path handles raise NotImplementedError with the hint.
    ``fake=True`` keeps the legacy deterministic stub (payload-hash
    pixels) for plumbing tests that need no decodable payload."""

    def dec(batches):
        for pdf in batches:
            if fake:
                pix = [
                    np.frombuffer(
                        hashlib.md5(bytes(p)).digest(), dtype=np.uint8
                    )[:16].astype(np.int32).tolist()
                    for p in pdf["payload"]
                ]
            else:
                pix = []
                for p in pdf["payload"]:
                    g = to_grayscale(_decode_rgb(p))
                    pix.append(
                        [int(x) for x in
                         np.round(box_resize(g, 4, 4)).astype(np.int64).ravel()]
                    )
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "pixels": pix,
                 "pix_w": 4, "pix_h": 4}
            )

    return assets.where(F.col("kind") == "image").mapInPandas(
        dec, "asset_id LONG, pixels ARRAY<INT>, pix_w INT, pix_h INT"
    )


def image_features(assets: DataFrame) -> DataFrame:
    """REAL image features: decode (numpy codecs / PIL fallback) ->
    8 luma/gradient/quadrant statistics (media_codecs.image_feature_vector),
    round-6 for cross-run determinism."""

    def feat(batches):
        for pdf in batches:
            out = [
                [float(round(x, 6))
                 for x in image_feature_vector(_decode_rgb(p))]
                for p in pdf["payload"]
            ]
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": out})

    return assets.where(F.col("kind") == "image").mapInPandas(
        feat, "asset_id LONG, features ARRAY<DOUBLE>"
    )


def image_phash(assets: DataFrame) -> DataFrame:
    """REAL 64-bit DCT perceptual hash per image (the public pHash recipe
    in media_codecs.phash64) — pairs with hamming_col for near-duplicate
    image detection, the image analog of dedup_simhash_pairs."""

    def ph(batches):
        for pdf in batches:
            vals = [
                np.uint64(phash64(_decode_rgb(p))).astype(np.int64)
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"],
                 "phash": np.asarray(vals, dtype=np.int64)}
            )

    return assets.where(F.col("kind") == "image").mapInPandas(
        ph, "asset_id LONG, phash LONG"
    )


def audio_features(assets: DataFrame) -> DataFrame:
    """REAL audio features from PCM WAV decode (stdlib wave + numpy FFT):
    duration, RMS energy, zero-crossing rate, spectral centroid Hz, peak."""

    def feat(batches):
        for pdf in batches:
            rows = [audio_feature_vector(bytes(p)) for p in pdf["payload"]]
            arr = np.asarray(rows, dtype=np.float64).reshape(-1, 5)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "duration_s": np.round(arr[:, 0], 6),
                    "rms": np.round(arr[:, 1], 6),
                    "zcr": np.round(arr[:, 2], 6),
                    "centroid_hz": np.round(arr[:, 3], 6),
                    "peak": np.round(arr[:, 4], 6),
                }
            )

    return assets.where(F.col("kind") == "audio").mapInPandas(
        feat,
        "asset_id LONG, duration_s DOUBLE, rms DOUBLE, zcr DOUBLE, "
        "centroid_hz DOUBLE, peak DOUBLE",
    )


def frame_sample(assets: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """REAL video frame sampling: parse the Y4M stream, take the frame at
    each every_ms offset (frame_idx = floor(offset * fps / 1000)), and emit
    its 4x4 luma thumbnail — a UDTF-shaped (1 -> N rows) media operator
    whose output rows carry actual decoded frame content."""

    def frames(batches):
        for pdf in batches:
            ids, idxs, offs, thumbs = [], [], [], []
            for aid, p in zip(pdf["asset_id"], pdf["payload"]):
                vid = Y4MVideo(bytes(p))
                n_samples = max(1, vid.duration_ms // every_ms)
                for j in range(n_samples):
                    off = j * every_ms
                    fidx = min(
                        int(off * vid.fps_num / (1000 * vid.fps_den)),
                        vid.n_frames - 1,
                    )
                    thumb = np.round(
                        box_resize(
                            vid.luma_plane(fidx).astype(np.float64), 4, 4
                        )
                    ).astype(np.int64)
                    ids.append(int(aid))
                    idxs.append(fidx)
                    offs.append(off)
                    thumbs.append([int(x) for x in thumb.ravel()])
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "offset_ms": offs,
                 "thumb": thumbs}
            )

    return assets.where(F.col("kind") == "video").mapInPandas(
        frames,
        "asset_id LONG, frame_idx INT, offset_ms INT, thumb ARRAY<INT>",
    )
