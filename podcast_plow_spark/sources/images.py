"""Synthetic image store + codec + invariant kernels.

The frontier's payload table follows BASELINE.json ``input_hint``
exactly::

    image_id: string, bytes: binary, w: int32, h: int32,
    fmt: string, caption: string, phash: int64

The container has no image libraries (no PIL), so the codec is a
deterministic stand-in with the properties the invariant needs:

- ``raw``  : lossless — bytes are the uint8 RGB array.
- ``qjpg`` : lossy — uniform quantization (q=4, mid-tread). Max error
  2/channel → PSNR ≈ 46 dB > the 40 dB invariant floor, so the lossy
  path genuinely exercises the PSNR check rather than trivially
  passing via equality.

Pixels for ``image_id = img-<n>`` are regenerated from a seeded PCG64
stream keyed by n — the "reference pixels" in the invariant are
recomputed, never stored, so the check is end-to-end.

All Spark-side work is vectorized: ``mapInPandas`` over Arrow batches;
the ``bytes`` column is only ever read inside the invariant/decode
stages (column pruning keeps it out of every other scan).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "IMAGE_SCHEMA",
    "generate_image_table",
    "decode_image",
    "psnr",
    "phash64",
    "check_invariants",
]

IMAGE_SCHEMA = StructType(
    [
        StructField("image_id", StringType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
        StructField("caption", StringType()),
        StructField("phash", LongType()),
    ]
)

# Optional real-codec backend: when Pillow is installed the engine
# transparently gains png/jpeg support (encode_image / decode_image /
# check_invariants); without it those formats raise the honest
# NotImplementedError below and the deterministic stand-ins are the
# only codecs — the Spark plumbing is identical either way.
try:  # pragma: no cover - exercised only where Pillow exists
    import io as _io

    from PIL import Image as _PILImage

    _HAS_PIL = True
except ImportError:  # pragma: no cover
    _io = None
    _PILImage = None
    _HAS_PIL = False

_REAL_FMTS = ("png", "jpeg")

_QUANT = 4
_CAPTION_WORDS = (
    "sunset", "harbor", "forest", "skyline", "river", "meadow", "market",
    "bridge", "lantern", "glacier", "orchard", "canyon", "plaza", "dune",
)


def _pixels_for(n: int, w: int, h: int) -> np.ndarray:
    rng = np.random.Generator(np.random.PCG64(1_000_003 * n + 7))
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


def _caption_for(n: int) -> str:
    words = [_CAPTION_WORDS[(n // (len(_CAPTION_WORDS) ** i)) % len(_CAPTION_WORDS)] for i in range(3)]
    return f"a photo of a {words[0]} near the {words[1]} at {words[2]} (#{n})"


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "raw":
        return pixels.tobytes()
    if fmt == "qjpg":
        q = (pixels.astype(np.int32) // _QUANT * _QUANT + _QUANT // 2).clip(0, 255).astype(np.uint8)
        return q.tobytes()
    if fmt in _REAL_FMTS:
        if not _HAS_PIL:
            raise NotImplementedError(
                f"fmt {fmt!r}: install Pillow for real codecs; this "
                "container has none, so only the deterministic "
                "stand-ins (raw/qjpg) are available."
            )
        buf = _io.BytesIO()
        _PILImage.fromarray(pixels, "RGB").save(
            buf, format="PNG" if fmt == "png" else "JPEG", quality=95
        )
        return buf.getvalue()
    raise ValueError(f"unknown fmt {fmt!r}")


def decode_image(data: bytes, fmt: str, w: int, h: int) -> np.ndarray:
    """Decode to an (h, w, 3) uint8 array. The stand-in formats store
    the (possibly quantized) pixel array directly; png/jpeg decode via
    Pillow when installed."""
    if fmt in ("raw", "qjpg"):
        return np.frombuffer(data, dtype=np.uint8).reshape(h, w, 3)
    if fmt in _REAL_FMTS and _HAS_PIL:
        img = _PILImage.open(_io.BytesIO(data)).convert("RGB")
        return np.asarray(img, dtype=np.uint8)
    raise NotImplementedError(
        f"fmt {fmt!r}: real codecs (jpeg/png/webp) need an image "
        "library not present in this container; the Spark plumbing "
        "(schema, batching, invariant) is identical."
    )


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return 10.0 * np.log10(255.0**2 / mse)


def phash64(pixels: np.ndarray) -> int:
    """64-bit average hash: luma → 8×8 block means → bit = mean > global mean."""
    luma = pixels.astype(np.float64).mean(axis=2)
    h, w = luma.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.array([[luma[ys[i] : ys[i + 1], xs[j] : xs[j + 1]].mean() for j in range(8)] for i in range(8)])
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for i, b in enumerate(bits[:63]):  # 63 bits keeps it positive in int64
        if b:
            val |= 1 << i
    return val


def pixels_batch(ns: "list[int] | np.ndarray", w: int, h: int) -> np.ndarray:
    """Stacked reference pixels for a batch of image numbers."""
    return np.stack([_pixels_for(int(n), w, h) for n in ns])


def psnr_batch(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Vectorized PSNR over a (B, h, w, 3) batch → (B,)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2, axis=(1, 2, 3))
    out = np.full(mse.shape, 1e6)
    nz = mse > 0
    out[nz] = 10.0 * np.log10(255.0**2 / mse[nz])
    return out


def phash64_batch(pixels: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit average hash over a (B, h, w, 3) batch → (B,)
    int64. Equals :func:`phash64` when h and w are multiples of 8
    (verified in tests); general sizes fall back to the scalar kernel."""
    b, h, w, _ = pixels.shape
    if h % 8 or w % 8:
        return np.array([phash64(pixels[i]) for i in range(b)], dtype=np.int64)
    luma = pixels.astype(np.float64).mean(axis=3)
    blocks = luma.reshape(b, 8, h // 8, 8, w // 8).mean(axis=(2, 4))
    bits = blocks.reshape(b, 64) > blocks.reshape(b, 64).mean(axis=1, keepdims=True)
    weights = (1 << np.arange(63, dtype=np.int64))
    return (bits[:, :63] * weights).sum(axis=1).astype(np.int64)


def generate_image_table(
    spark: SparkSession, n_images: int, out_path: str, w: int = 32, h: int = 24, partitions: int = 8
) -> None:
    """Write the image+caption parquet table (input_hint schema).
    Generation is distributed: each partition renders its own id range."""
    idx = spark.range(0, n_images, 1, partitions)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for n in pdf["id"]:
                n = int(n)
                px = _pixels_for(n, w, h)
                fmt = "raw" if n % 2 == 0 else "qjpg"
                rows.append(
                    {
                        "image_id": f"img-{n:08d}",
                        "bytes": encode_image(px, fmt),
                        "w": w,
                        "h": h,
                        "fmt": fmt,
                        "caption": _caption_for(n),
                        "phash": phash64(px),
                    }
                )
            yield pd.DataFrame(rows)

    df = idx.mapInPandas(render, schema=IMAGE_SCHEMA)
    df.write.mode("overwrite").parquet(out_path)


def check_invariants(images: DataFrame, min_psnr_db: float = 40.0) -> DataFrame:
    """Per-row invariant job (BASELINE.json input_hint): decoded-pixel
    PSNR ≥ 40 dB for lossy (exact for raw) + caption equality vs the
    recomputed reference row. Returns (image_id, psnr_db, caption_ok,
    phash_ok, passed). Never collects ``bytes`` to the driver.

    Vectorized on the batch kernels (:func:`psnr_batch` /
    :func:`phash64_batch`): rows are validated structurally first
    (known fmt, parseable id, exact payload length), then each
    same-(w, h) group is stacked and scored with whole-batch numpy —
    no per-row Python in the hot path. Corrupt rows (truncated blob,
    unknown codec, mangled id) simply fail their row: one bad blob
    must never kill a 10^10-row invariant job."""

    def verify(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            m = len(pdf)
            if m == 0:
                continue
            w_arr = pdf["w"].to_numpy(dtype=np.int64)
            h_arr = pdf["h"].to_numpy(dtype=np.int64)
            ns = np.full(m, -1, dtype=np.int64)
            for i, s in enumerate(pdf["image_id"]):
                tail = (s or "").rsplit("-", 1)[-1]
                if tail.isdigit():
                    ns[i] = int(tail)
            blen = np.fromiter(
                (len(b) if b is not None else -1 for b in pdf["bytes"]), dtype=np.int64, count=m
            )
            fmts = pdf["fmt"].to_numpy(dtype=object)
            standin = pdf["fmt"].isin(("raw", "qjpg")).to_numpy()
            real = pdf["fmt"].isin(_REAL_FMTS).to_numpy() & _HAS_PIL
            # exact-length check applies to the fixed-size stand-ins
            # only; compressed formats just need a non-empty blob
            valid = (ns >= 0) & (
                (standin & (blen == w_arr * h_arr * 3)) | (real & (blen > 0))
            )
            psnr_db = np.full(m, -1.0)
            cap_ok = np.zeros(m, dtype=bool)
            ph_ok = np.zeros(m, dtype=bool)
            phashes = pdf["phash"].to_numpy(dtype=np.int64)
            captions = pdf["caption"].to_numpy(dtype=object)
            byts = pdf["bytes"].to_numpy(dtype=object)
            for w, h in {(int(a), int(b)) for a, b in zip(w_arr[valid], h_arr[valid])}:
                idxs = np.nonzero(valid & (w_arr == w) & (h_arr == h))[0]
                ref = pixels_batch(ns[idxs], w, h)
                def dec_one(i: int) -> np.ndarray:
                    if standin[i]:
                        return np.frombuffer(byts[i], dtype=np.uint8).reshape(h, w, 3)
                    try:  # corrupt compressed blob fails its row only
                        px = decode_image(byts[i], fmts[i], w, h)
                        return px if px.shape == (h, w, 3) else np.zeros((h, w, 3), np.uint8)
                    except Exception:  # noqa: BLE001
                        return np.zeros((h, w, 3), np.uint8)

                dec = np.stack([dec_one(i) for i in idxs])
                psnr_db[idxs] = np.minimum(psnr_batch(ref, dec), 1e6)
                ph_ok[idxs] = phashes[idxs] == phash64_batch(ref)
                cap_ok[idxs] = [captions[i] == _caption_for(int(ns[i])) for i in idxs]
            yield pd.DataFrame(
                {
                    "image_id": pdf["image_id"],
                    "psnr_db": psnr_db,
                    "caption_ok": cap_ok,
                    "phash_ok": ph_ok,
                    "passed": (psnr_db >= min_psnr_db) & cap_ok & ph_ok & valid,
                }
            )

    return images.mapInPandas(
        verify, schema="image_id string, psnr_db double, caption_ok boolean, phash_ok boolean, passed boolean"
    )
