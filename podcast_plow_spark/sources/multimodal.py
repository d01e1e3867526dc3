"""Multimodal pipeline operators over binary payload columns.

The brief's training-data pipeline needs, beyond decode/invariant
(``sources/images.py``): **resize**, **feature-extract**, and video
**frame-sample** — each as a vectorized ``mapInPandas`` stage over the
``input_hint`` image schema (or the analogous video schema below).
The reference has no media ops at all (it stores episode audio URLs as
opaque strings, reference server/models.py Episode.audio_url); these
ops exist for the 100 TB-scale training-pipeline tier of the brief.

Scale discipline (same rules as ``check_invariants``):

- The ``bytes`` column is only read inside the stage itself — every
  upstream/downstream scan prunes it (wide binary columns dominate
  I/O at 10^10 rows; parquet column pruning is the difference between
  reading 3 TB and 300 GB).
- No per-row Python in the hot path: rows are grouped by (w, h[, fmt])
  inside each Arrow batch and processed as stacked (B, h, w, 3) numpy
  arrays. Per-row work happens only where payload sizes genuinely
  differ (variable-length compressed blobs).
- One corrupt blob must never kill the job: malformed rows are
  dropped from the output (loudly countable as input minus output),
  never raised.
- Real codecs (png/jpeg, video containers) need libraries this
  container lacks — those paths raise ``NotImplementedError`` behind
  the same optional-Pillow gate as ``images.py``; the deterministic
  stand-in codecs exercise the identical Spark plumbing.
- For large frames, bound Arrow batch memory with
  ``spark.sql.execution.arrow.maxRecordsPerBatch`` (a (B, 1080, 1920,
  3) float64 stack at the default 10k rows/batch would be ~500 GB;
  at 10^10 rows you size batches so B·h·w·3·8 fits the executor).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import (
    BinaryType,
    DoubleType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

from podcast_plow_spark.sources.images import (
    IMAGE_SCHEMA,
    _REAL_FMTS,
    _pixels_for,
    decode_image,
    encode_image,
    phash64_batch,
)

__all__ = [
    "VIDEO_SCHEMA",
    "FRAME_SCHEMA",
    "resize_images",
    "extract_image_features",
    "generate_video_table",
    "sample_frames",
]

VIDEO_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frames", BinaryType()),  # concatenated per-frame encodings
        StructField("n_frames", IntegerType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fps", DoubleType()),
        StructField("fmt", StringType()),
    ]
)

FRAME_SCHEMA = StructType(
    [
        StructField("video_id", StringType()),
        StructField("frame_idx", IntegerType()),
        StructField("ts_sec", DoubleType()),
        StructField("bytes", BinaryType()),
        StructField("w", IntegerType()),
        StructField("h", IntegerType()),
        StructField("fmt", StringType()),
    ]
)


def _decode_batch(pdf: pd.DataFrame, w: int, h: int, idxs: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Decode rows ``idxs`` of one same-(w, h) group → (kept_idxs,
    (B, h, w, 3) uint8 stack). Stand-in formats decode as one
    ``frombuffer`` per row (no copy); malformed rows are dropped."""
    byts = pdf["bytes"].to_numpy(dtype=object)
    fmts = pdf["fmt"].to_numpy(dtype=object)
    kept, planes = [], []
    for i in idxs:
        b, fmt = byts[i], fmts[i]
        if b is None:
            continue
        try:
            if fmt in ("raw", "qjpg"):
                if len(b) != w * h * 3:
                    continue
                px = np.frombuffer(b, dtype=np.uint8).reshape(h, w, 3)
            else:
                px = decode_image(b, fmt, w, h)
                if px.shape != (h, w, 3):
                    continue
        except NotImplementedError:
            if fmt in _REAL_FMTS:
                raise  # missing codec backend is a config error, not a bad row
            continue  # unknown fmt is just a bad row
        except Exception:  # noqa: BLE001 - corrupt blob fails its row only
            continue
        kept.append(i)
        planes.append(px)
    if not kept:
        return np.array([], dtype=np.int64), np.zeros((0, h, w, 3), np.uint8)
    return np.asarray(kept, dtype=np.int64), np.stack(planes)


def _resize_batch(stack: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Deterministic batched resize of a (B, h, w, 3) uint8 stack.

    Integer-factor downscale → exact area (box-filter) mean via a
    reshape, the right anti-aliasing primitive for thumbnailing a
    training corpus; anything else → nearest-neighbor index mapping.
    Both are pure-numpy whole-batch ops (no per-row loop) and
    independent of batch/partition boundaries.
    """
    b, h, w, _ = stack.shape
    if h == out_h and w == out_w:
        return stack
    if h % out_h == 0 and w % out_w == 0:
        fy, fx = h // out_h, w // out_w
        return (
            stack.reshape(b, out_h, fy, out_w, fx, 3)
            .mean(axis=(2, 4))
            .round()
            .clip(0, 255)
            .astype(np.uint8)
        )
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return stack[:, ys][:, :, xs]


def resize_images(images: DataFrame, out_w: int, out_h: int) -> DataFrame:
    """Resize every image to (out_w, out_h), preserving the
    ``input_hint`` schema: bytes are re-encoded in the row's own
    format and ``phash`` is recomputed on the resized pixels (the
    near-dup operators downstream must hash what the row now holds).

    decode → resize → re-encode runs per same-(w, h, fmt) group as
    whole-batch numpy; malformed rows are dropped (count in vs out to
    audit). Purely narrow — no shuffle: at 10^10 rows the job is one
    scan + one write, and parquet pruning keeps every other column
    read minimal.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            w_arr = pdf["w"].to_numpy(dtype=np.int64)
            h_arr = pdf["h"].to_numpy(dtype=np.int64)
            fmts = pdf["fmt"].to_numpy(dtype=object)
            out_rows: list[dict] = []
            for w, h, fmt in {
                (int(a), int(b), f) for a, b, f in zip(w_arr, h_arr, fmts) if f is not None
            }:
                grp = np.nonzero((w_arr == w) & (h_arr == h) & (fmts == fmt))[0]
                kept, stack = _decode_batch(pdf, w, h, grp)
                if not len(kept):
                    continue
                resized = _resize_batch(stack, out_w, out_h)
                hashes = phash64_batch(resized)
                for j, i in enumerate(kept):
                    out_rows.append(
                        {
                            "image_id": pdf["image_id"].iloc[i],
                            "bytes": encode_image(resized[j], fmt),
                            "w": out_w,
                            "h": out_h,
                            "fmt": fmt,
                            "caption": pdf["caption"].iloc[i],
                            "phash": int(hashes[j]),
                        }
                    )
            if out_rows:
                yield pd.DataFrame(out_rows)

    return images.mapInPandas(work, schema=IMAGE_SCHEMA)


def extract_image_features(images: DataFrame, n_bins: int = 10) -> DataFrame:
    """Feature-extract: each image → a fixed-length ``array<double>``
    embedding (per-channel mean/std scaled to [0, 1] + an L1-normalized
    luma histogram of ``n_bins``), i.e. a 6 + n_bins dim vector.

    The output (vec_id-compatible ``image_id``, ``embedding``) plugs
    straight into the similarity/dedup family
    (``operators/similarity.embedding_near_dup_pairs`` /
    ``*_topk_pairs``) — decode-to-near-dup is a two-stage pipeline
    with no shuffle in this stage. Histogram is computed for the whole
    (B, h, w) luma stack with one ``bincount`` (no per-row numpy
    dispatch); malformed rows are dropped.
    """

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            w_arr = pdf["w"].to_numpy(dtype=np.int64)
            h_arr = pdf["h"].to_numpy(dtype=np.int64)
            ids: list = []
            vecs: list = []
            for w, h in {(int(a), int(b)) for a, b in zip(w_arr, h_arr)}:
                grp = np.nonzero((w_arr == w) & (h_arr == h))[0]
                kept, stack = _decode_batch(pdf, w, h, grp)
                if not len(kept):
                    continue
                fl = stack.astype(np.float64)
                mean = fl.mean(axis=(1, 2)) / 255.0  # (B, 3)
                std = fl.std(axis=(1, 2)) / 255.0  # (B, 3)
                luma = fl.mean(axis=3)  # (B, h, w)
                bins = np.minimum((luma * n_bins / 256.0).astype(np.int64), n_bins - 1)
                offset = np.arange(len(kept), dtype=np.int64)[:, None, None] * n_bins
                hist = np.bincount(
                    (bins + offset).ravel(), minlength=len(kept) * n_bins
                ).reshape(len(kept), n_bins) / float(h * w)
                feat = np.concatenate([mean, std, hist], axis=1)
                ids.extend(pdf["image_id"].iloc[i] for i in kept)
                vecs.extend(feat[j].tolist() for j in range(len(kept)))
            if ids:
                yield pd.DataFrame({"image_id": ids, "embedding": vecs})

    return images.mapInPandas(work, schema="image_id string, embedding array<double>")


def _frame_pixels(vid: int, frame: int, w: int, h: int) -> np.ndarray:
    base = _pixels_for(vid, w, h).astype(np.int32)
    return ((base + 3 * frame) % 256).astype(np.uint8)  # deterministic motion


def generate_video_table(
    spark: SparkSession,
    n_videos: int,
    out_path: str,
    n_frames: int = 24,
    w: int = 16,
    h: int = 16,
    fps: float = 12.0,
    partitions: int = 4,
) -> None:
    """Synthetic video table (VIDEO_SCHEMA): ``frames`` is the
    concatenation of per-frame ``raw`` encodings — the stand-in for a
    fixed-GOP container. Distributed like ``generate_image_table``."""
    idx = spark.range(0, n_videos, 1, partitions)

    def render(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for n in pdf["id"]:
                n = int(n)
                payload = b"".join(
                    encode_image(_frame_pixels(n, f, w, h), "raw") for f in range(n_frames)
                )
                rows.append(
                    {
                        "video_id": f"vid-{n:06d}",
                        "frames": payload,
                        "n_frames": n_frames,
                        "w": w,
                        "h": h,
                        "fps": fps,
                        "fmt": "raw",
                    }
                )
            yield pd.DataFrame(rows)

    idx.mapInPandas(render, schema=VIDEO_SCHEMA).write.mode("overwrite").parquet(out_path)


def sample_frames(
    videos: DataFrame, every_n: int = 1, max_frames: int | None = None
) -> DataFrame:
    """Frame-sample: explode each video row into one FRAME_SCHEMA row
    per kept frame (indices 0, every_n, 2·every_n, …, optionally
    capped at ``max_frames`` per video), with ``ts_sec = idx / fps``.

    For the fixed-frame-size stand-in codec the kept frames are
    sliced straight out of the ``frames`` blob — NO decode happens
    (the whole point of sampling before decoding: at 10^10 frames you
    drop (every_n-1)/every_n of the decode work and of the shuffled
    bytes). Real containers (mp4 etc.) would decode-on-demand here
    and raise until a video backend exists. Row explosion is narrow
    (no shuffle); each output row is an independent image payload
    ready for ``resize_images`` / ``extract_image_features``.
    """
    if every_n < 1:
        raise ValueError("every_n must be >= 1")

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                if r.fmt != "raw":
                    raise NotImplementedError(
                        f"fmt {r.fmt!r}: real video containers need a decode "
                        "backend not present in this container."
                    )
                fsize = int(r.w) * int(r.h) * 3
                blob = r.frames
                if blob is None or len(blob) != fsize * int(r.n_frames):
                    continue  # corrupt container fails its row only
                idxs = range(0, int(r.n_frames), every_n)
                if max_frames is not None:
                    idxs = list(idxs)[:max_frames]
                for f in idxs:
                    rows.append(
                        {
                            "video_id": r.video_id,
                            "frame_idx": f,
                            "ts_sec": f / float(r.fps),
                            "bytes": blob[f * fsize : (f + 1) * fsize],
                            "w": int(r.w),
                            "h": int(r.h),
                            "fmt": "raw",
                        }
                    )
            if rows:
                yield pd.DataFrame(rows)

    return videos.mapInPandas(work, schema=FRAME_SCHEMA)
