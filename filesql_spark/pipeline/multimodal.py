"""Multimodal columns: opaque binary payloads + typed metadata, processed
through Arrow-batched Pandas UDFs (``mapInPandas``).

Two decode paths behind ``REAL_DECODE``:

- ``_real_decode``: genuine image-header metadata extraction (PNG/GIF/BMP
  dims + channels via stdlib struct; PIL fallback for other containers)
  — exercised in tests over a stdlib-built PNG through the full
  mapInPandas plan.
- ``_fake_decode`` (default for the registry/bench queries, whose
  payloads are synthesized text bytes): deterministic md5-derived dims,
  which keeps the operator SQL-expressible for the DuckDB oracle.

Everything Spark-side — binary column schema, Arrow batch iteration,
output schema contract, partition-parallel shape — is identical between
the two; the plan doesn't move when the decode function swaps.

The fake decode derives (width, height, channels) from md5 of the payload
bytes, which makes it SQL-expressible — the DuckDB oracle reproduces the
Pandas-UDF output exactly, proving the Arrow plumbing end-to-end.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# False: registry/bench payloads are synthesized text bytes (oracle-able
# md5 fake). True: parse real image headers (see _real_decode) — what a
# deployment over actual image bytes sets.
REAL_DECODE = False

DECODE_SCHEMA = (
    "doc_id long, n_bytes long, mime string, width int, height int, channels int"
)


def _real_decode(payload: bytes) -> tuple[int, int, int]:
    """Real image metadata decode: (width, height, channels).

    PNG/GIF/BMP dimensions come from pure-stdlib header parsing (what a
    metadata-extraction pass at 100 TB actually does — no pixel decode
    needed for dims); any other container falls through to PIL when it is
    installed, else raises. Exercised end-to-end by
    tests/test_pipeline.py::test_real_decode_png_headers with a
    stdlib-built PNG, and by the PIL-gated twin when PIL exists."""
    import struct

    if payload[:8] == b"\x89PNG\r\n\x1a\n":
        w, h = struct.unpack(">II", payload[16:24])
        color_type = payload[25]
        channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(color_type, 3)
        return w, h, channels
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        w, h = struct.unpack("<HH", payload[6:10])
        return w, h, 3
    if payload[:2] == b"BM" and len(payload) >= 30:
        w, h = struct.unpack("<ii", payload[18:26])
        bpp = struct.unpack("<H", payload[28:30])[0]
        return w, abs(h), max(1, bpp // 8)
    try:  # pragma: no cover — PIL not installed in the test container
        import io

        from PIL import Image
    except ImportError as e:
        raise NotImplementedError(
            f"unrecognized image container {payload[:8]!r} and PIL is not "
            "available for full decode"
        ) from e
    img = Image.open(io.BytesIO(payload))  # pragma: no cover
    return img.width, img.height, len(img.getbands())  # pragma: no cover


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """Deterministic stand-in: dimensions from the payload's md5."""
    h = hashlib.md5(payload).hexdigest()
    width = 1 + int(h[0:4], 16) % 1920
    height = 1 + int(h[4:8], 16) % 1080
    channels = 1 + int(h[8:10], 16) % 4
    return width, height, channels


def attach_binary_payload(df: DataFrame, text_col: str = "text") -> DataFrame:
    """documents → multimodal shape: binary payload + typed metadata.

    (In a real pipeline the payload is the image/audio bytes read from the
    lake; here we synthesize it from the text so the driver tables suffice.)
    """
    return df.select(
        "doc_id",
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.lit("image/fake").alias("mime"),
    )


def decode_images(df: DataFrame, real: bool | None = None) -> DataFrame:
    """mapInPandas decode: binary batches in, feature rows out.

    Arrow moves each partition's rows as columnar batches; the Python
    worker touches bytes only — no JVM round-trips per row. At 100 TB this
    is the standard shape for CPU-bound media decode (scale out = more
    partitions).

    ``real`` overrides the module default REAL_DECODE; the decode function
    is chosen driver-side at plan-build time so the closure ships the
    right path to every worker.
    """
    decode = _real_decode if (REAL_DECODE if real is None else real) else _fake_decode

    def decode_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [decode(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "mime": pdf["mime"],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "channels": [d[2] for d in dims],
                }
            )

    return df.mapInPandas(decode_batches, schema=DECODE_SCHEMA)


def resize_plan(df: DataFrame, max_side: int = 512) -> DataFrame:
    """Resize planning over decoded metadata — pure column math (JVM-side):
    the scale factor and output dims a resize UDF would apply."""
    scale = F.when(
        F.greatest(F.col("width"), F.col("height")) > max_side,
        max_side / F.greatest(F.col("width"), F.col("height")).cast("double"),
    ).otherwise(F.lit(1.0))
    return df.select(
        "doc_id",
        "width",
        "height",
        scale.alias("scale"),
        F.floor(F.col("width") * scale).cast("int").alias("out_width"),
        F.floor(F.col("height") * scale).cast("int").alias("out_height"),
    )


def frame_sample_plan(df: DataFrame, fps: int = 1, max_frames: int = 8) -> DataFrame:
    """Video-style frame sampling plan: which frame indexes a sampler would
    decode, as an array column (duration faked from payload size)."""
    duration_s = (F.col("n_bytes") % 30 + 1).cast("int")
    n = F.least(duration_s * fps, F.lit(max_frames))
    return df.select(
        "doc_id",
        duration_s.alias("duration_s"),
        F.sequence(F.lit(0), n - 1).alias("frame_idx"),
    )


FEATURE_SCHEMA = (
    "doc_id long, "
    + ", ".join(f"f{i} int" for i in range(8))
    + ", brightness double"
)


def extract_features(df: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over binary payloads: an 8-dim
    integer feature vector + a derived brightness scalar per payload.

    Real pipelines put the CNN/CLIP forward pass here; the container has
    no model runtime, so the features are a deterministic md5-derived fake
    (one byte per dimension) — which makes the whole Arrow path
    SQL-expressible and oracle-checked end-to-end, exactly like
    decode_images. Brightness = mean of the 8 features via one exact
    integer sum and a single IEEE division.
    """

    def feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {f"f{i}": [] for i in range(8)}
            bright = []
            for p in pdf["payload"]:
                h = hashlib.md5(p).hexdigest()
                feats = [int(h[i * 2 : i * 2 + 2], 16) for i in range(8)]
                for i, v in enumerate(feats):
                    rows[f"f{i}"].append(v)
                bright.append(sum(feats) / 8.0)
            out = {"doc_id": pdf["doc_id"], **rows, "brightness": bright}
            yield pd.DataFrame(out)

    return df.mapInPandas(feature_batches, schema=FEATURE_SCHEMA)
