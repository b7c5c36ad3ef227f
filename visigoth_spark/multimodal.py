"""Multimodal (image/audio/video-as-binary) column plumbing.

Beyond the reference's text-only scope: a large-scale training-data pipeline
carries opaque ``binary`` payload columns with typed metadata next to text.
This module implements the Spark-side plumbing — schemas, partition-safe
mapInPandas signatures, Arrow batch shapes, 1->N frame explosion — with a
DETERMINISTIC STUB decoder (md5-derived), because the sandbox has no
image/audio codecs. The real decoders plug into ``decode_payload`` (clearly
marked NotImplementedError); everything around them is real and tested.

Design rules (100 TB discipline):
- payload bytes NEVER cross a shuffle: metadata/features are derived in the
  map task that read the bytes, payloads are dropped before any wide op;
- features are fixed-width ``array<float>`` columns -> directly usable by
  pipeline.cosine_topk / ivf_topk for similarity search;
- all per-row work is vectorized over Arrow batches (mapInPandas), no
  per-row Python UDF dispatch.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

META_SCHEMA = "width int, height int, channels int, brightness double"
FEAT_DIM = 16


def _try_import_pil():
    try:
        from PIL import Image  # noqa: F401  (optional cluster dependency)

        return Image
    except Exception:
        return None


_PIL = _try_import_pil()


def decode_payload(payload: bytes, kind: str = "image"):
    """REAL decoder slot — self-activating where the cluster image ships
    codecs. With Pillow importable, ``kind="image"`` decodes the payload
    and returns the same tuple shape as :func:`stub_meta`
    ``(width, height, channels, brightness)``, so the plumbing above is
    decoder-agnostic (swap ``stub_meta`` for this in ``image_meta``'s
    generator on such a cluster). Without codecs (this sandbox: no
    PIL/ffmpeg/soundfile) it raises — the deterministic stubs below keep
    the plumbing end-to-end testable."""
    if kind == "image" and _PIL is not None:
        import io

        img = _PIL.open(io.BytesIO(payload))
        img.load()
        channels = len(img.getbands())
        # brightness in [0, 1]: mean of the luminance-converted image
        gray = img.convert("L")
        hist = gray.histogram()
        total = sum(hist) or 1
        mean = sum(i * c for i, c in enumerate(hist)) / total
        return img.width, img.height, channels, round(mean / 255.0, 6)
    raise NotImplementedError(
        "real decode for this kind requires codec libraries not present "
        "in this environment (PIL for images; ffmpeg/soundfile for av); "
        "use the *_stub functions (deterministic fake) until they are "
        "installed"
    )


def _md5_u32(h: str, lo: int, hi: int) -> int:
    return int(h[lo:hi], 16)


def stub_meta(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic fake image metadata from the payload's md5 — the same
    numbers the pure-SQL oracle derives, so plumbing is end-to-end
    checkable without codecs."""
    h = hashlib.md5(payload).hexdigest()
    return (
        16 + _md5_u32(h, 0, 4) % 1024,
        16 + _md5_u32(h, 4, 8) % 1024,
        1 + _md5_u32(h, 8, 9) % 4,
        round(_md5_u32(h, 9, 13) / 65535.0, 6),
    )


def stub_features(payload: bytes, dim: int = FEAT_DIM) -> np.ndarray:
    """Deterministic fake feature vector (md5 chain), unit-normalized."""
    out = np.empty(dim, dtype=np.float64)
    h = hashlib.md5(payload).hexdigest()
    for i in range(dim):
        h = hashlib.md5((h + str(i)).encode()).hexdigest()
        out[i] = int(h[:8], 16) / 0xFFFFFFFF - 0.5
    n = np.linalg.norm(out)
    return out / (n if n else 1.0)


def image_meta(df: DataFrame, bin_col: str = "payload",
               id_col: str = "doc_id") -> DataFrame:
    """Typed metadata for a binary image column. Vectorized mapInPandas;
    only (id, meta) leave the task — the payload is dropped map-side."""

    import visigoth_spark

    visigoth_spark.ensure_shipped(df.sparkSession)

    def gen(it):
        for pdf in it:
            metas = [stub_meta(b if b is not None else b"")
                     for b in pdf[bin_col]]
            w, h, c, br = (list(x) for x in zip(*metas)) if metas else ([],) * 4
            yield pd.DataFrame({
                id_col: pdf[id_col],
                "width": pd.Series(w, dtype="int32"),
                "height": pd.Series(h, dtype="int32"),
                "channels": pd.Series(c, dtype="int32"),
                "brightness": pd.Series(br, dtype="float64"),
            })

    return df.select(id_col, bin_col).mapInPandas(
        gen, f"{id_col} long, {META_SCHEMA}"
    )


def image_features(df: DataFrame, bin_col: str = "payload",
                   id_col: str = "doc_id", dim: int = FEAT_DIM) -> DataFrame:
    """(id, features: array<double>) — the embedding column feeding
    similarity search (pipeline.cosine_topk / ivf_topk)."""

    import visigoth_spark

    visigoth_spark.ensure_shipped(df.sparkSession)

    def gen(it):
        for pdf in it:
            feats = [stub_features(b if b is not None else b"", dim).tolist()
                     for b in pdf[bin_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, bin_col).mapInPandas(
        gen, f"{id_col} long, features array<double>"
    )


def frame_sample(df: DataFrame, bin_col: str = "payload",
                 id_col: str = "doc_id", every_n: int = 4,
                 max_frames: int = 8) -> DataFrame:
    """Video-style 1->N explosion: sample every ``every_n``-th frame of the
    payload (stub: frame count = payload length determined; frame id +
    per-frame md5 fingerprint). Shows the mapInPandas shape where one input
    row yields many output rows WITHOUT a join or explode-after-udf."""

    import visigoth_spark

    visigoth_spark.ensure_shipped(df.sparkSession)

    def gen(it):
        for pdf in it:
            ids, fids, fps = [], [], []
            for i, b in zip(pdf[id_col], pdf[bin_col]):
                b = b if b is not None else b""
                n_frames = 1 + len(b) % 64
                for f in range(0, n_frames, every_n)[:max_frames]:
                    ids.append(i)
                    fids.append(f)
                    fps.append(hashlib.md5(b + f.to_bytes(4, "little"))
                               .hexdigest())
            yield pd.DataFrame({
                id_col: pd.Series(ids, dtype="int64"),
                "frame_id": pd.Series(fids, dtype="int32"),
                "frame_fp": pd.Series(fps, dtype="string"),
            })

    return df.select(id_col, bin_col).mapInPandas(
        gen, f"{id_col} long, frame_id int, frame_fp string"
    )


def resize_meta(meta: DataFrame, target: int = 256) -> DataFrame:
    """Aspect-preserving resize planning — pure Catalyst (no UDF): the
    arithmetic lives JVM-side in whole-stage codegen."""
    scale = F.least(
        F.lit(float(target)) / F.col("width"),
        F.lit(float(target)) / F.col("height"),
    )
    return meta.select(
        "*",
        F.greatest(F.round(F.col("width") * scale).cast("int"), F.lit(1))
        .alias("out_width"),
        F.greatest(F.round(F.col("height") * scale).cast("int"), F.lit(1))
        .alias("out_height"),
    )
