"""Multimodal columns: image/audio/video as opaque binary payloads with
typed metadata, processed through Arrow-batched mapInPandas.

The Spark-side plumbing (schema, partitioning, UDF signatures, batch
shapes) is real and tested; the actual media DECODE is stubbed behind
``NotImplementedError`` or a clearly-marked deterministic fake, because no
image/audio libraries exist in this container. Swapping the fake for
PIL/ffmpeg is a local change inside one mapInPandas kernel — the
distributed plan is unchanged.

Design for 100 TB: payloads never pass through a shuffle — every operator
here is a narrow mapInPandas over the scan, so Tungsten reads parquet row
groups, Arrow ships them to Python in bounded batches, and only small
derived columns (features, metadata) flow downstream.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

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

_MAGIC = {
    "image": b"\x89PNG\r\n\x1a\n",
    "audio": b"RIFF\x00\x00\x00\x00WAVE",
    "video": b"\x00\x00\x00\x18ftypmp42",
}
_KINDS = ["image", "audio", "video"]

def _pil_image():
    """Optional-dependency probe, evaluated at CALL time (inside the
    kernel, so each executor probes its own environment): returns the PIL
    Image module when Pillow is installed, else None. The container this
    repo is developed in has no imaging libraries — tests exercising the
    real decode skip with that reason — but an installed Pillow is picked
    up with zero code changes."""
    try:
        from PIL import Image  # noqa: PLC0415

        return Image
    except ImportError:
        return None


REAL_DECODERS_AVAILABLE = _pil_image() is not None


def synthesize_assets(spark: SparkSession, n: int, seed: int = 42) -> DataFrame:
    """Deterministic fake assets: payload = magic header + md5 keystream."""

    def gen(batches):
        for pdf in batches:
            ids = pdf["id"].to_numpy()
            rows = []
            for i in ids:
                kind = _KINDS[int(i) % 3]
                body = b"".join(
                    hashlib.md5(f"{seed}:{i}:{j}".encode()).digest()
                    for j in range(1 + int(i) % 7)
                )
                rows.append(
                    {
                        "asset_id": int(i),
                        "kind": kind,
                        "payload": _MAGIC[kind] + body,
                        "width": 64 + int(i) % 256 if kind == "image" else None,
                        "height": 64 + (int(i) * 3) % 256 if kind == "image" else None,
                        "duration_ms": 1000 + int(i) % 60000
                        if kind != "image" else None,
                    }
                )
            yield pd.DataFrame(rows)

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
                    if b.startswith(magic[:8]):
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
    """Decode image payloads to 4x4 grayscale pixel arrays.

    ``fake=False`` attempts a REAL decode via Pillow, probed at call time
    inside the kernel (`_pil_image`): each payload is opened, converted to
    grayscale, and resized to 4x4 (one bounded row per asset regardless of
    source resolution — the thumbnail-features shape). Without Pillow the
    kernel raises NotImplementedError with the install hint (honest stub —
    no imaging libraries exist in this dev container). ``fake=True``
    produces a deterministic 4x4 'image' derived from the payload hash —
    schema and batch shape identical to the PIL-backed path, so the whole
    distributed plan is testable without the dependency."""

    def dec(batches):
        pil = None if fake else _pil_image()
        for pdf in batches:
            if not fake and pil is None:
                raise NotImplementedError(
                    "real image decode requires PIL/libvips - not available; "
                    "pass fake=True for the deterministic stub"
                )
            if fake:
                pix = [
                    np.frombuffer(
                        hashlib.md5(bytes(p)).digest(), dtype=np.uint8
                    )[:16].astype(np.int32).tolist()
                    for p in pdf["payload"]
                ]
            else:
                import io

                pix = []
                for p in pdf["payload"]:
                    im = pil.open(io.BytesIO(bytes(p)))
                    im = im.convert("L").resize((4, 4))
                    pix.append([int(x) for x in im.getdata()])
            yield pd.DataFrame(
                {"asset_id": pdf["asset_id"], "pixels": pix,
                 "pix_w": 4, "pix_h": 4}
            )

    return assets.where(F.col("kind") == "image").mapInPandas(
        dec, "asset_id LONG, pixels ARRAY<INT>, pix_w INT, pix_h INT"
    )


def image_features(assets: DataFrame, dim: int = 8) -> DataFrame:
    """Feature extraction: payload -> float vector (deterministic fake
    embedding; a real model swap changes only this kernel)."""

    def feat(batches):
        for pdf in batches:
            out = []
            for p in pdf["payload"]:
                h = hashlib.sha256(bytes(p)).digest()
                v = np.frombuffer(h[: dim * 4], dtype="<u4").astype(np.float64)
                v = (v / 2**32) * 2.0 - 1.0
                out.append([float(round(x, 6)) for x in v])
            yield pd.DataFrame({"asset_id": pdf["asset_id"], "features": out})

    return assets.mapInPandas(feat, "asset_id LONG, features ARRAY<DOUBLE>")


def frame_sample(assets: DataFrame, every_ms: int = 10_000) -> DataFrame:
    """Video frame sampling: one output row per sampled frame index —
    the real plumbing for a UDTF-shaped (1 -> N rows) media operator."""

    def frames(batches):
        for pdf in batches:
            ids, idxs, offs = [], [], []
            for aid, dur in zip(pdf["asset_id"], pdf["duration_ms"]):
                n = max(1, int(dur) // every_ms)
                for j in range(n):
                    ids.append(int(aid))
                    idxs.append(j)
                    offs.append(j * every_ms)
            yield pd.DataFrame(
                {"asset_id": ids, "frame_idx": idxs, "offset_ms": offs}
            )

    return assets.where(F.col("kind") == "video").mapInPandas(
        frames, "asset_id LONG, frame_idx INT, offset_ms INT"
    )
