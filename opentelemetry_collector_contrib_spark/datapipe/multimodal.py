"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed by Arrow-batched ``mapInPandas``.

Decode backends, in preference order:
- Pillow when installed (broad format coverage, C resampling);
- the stdlib-only PPM/BMP codec (``imagecodec.py`` — struct header
  parse + numpy nearest-neighbor resample), so the REAL decode/resize
  branch executes even in codec-less containers; unsniffable formats
  are flagged ``ok=False`` and kept, never crashed on;
- ``fake=True`` keeps the deterministic fake decode (dimensions +
  checksum derived from the bytes) for oracle-checked plumbing tests.

Scale notes: binary payloads ride the same parquet scan; mapInPandas
keeps one Arrow batch in memory per task (bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` — lower it for
multi-MB blobs); feature extraction emits small typed columns so the
downstream pipeline never reshuffles blobs.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = ("media_id string, kind string, payload binary, "
                "mime string, n_bytes int")

FEATURES_SCHEMA = ("media_id string, kind string, n_bytes int, "
                   "checksum string, width int, height int, ok boolean")


def synth_media(spark, n: int = 64) -> DataFrame:
    """Deterministic fake media table (payload = seeded bytes)."""
    rows = []
    for i in range(n):
        payload = hashlib.sha256(f"media-{i}".encode()).digest() * (i % 7 + 1)
        kind = ["image", "audio", "video"][i % 3]
        rows.append((f"m-{i:05d}", kind, bytearray(payload),
                     f"{kind}/fake", len(payload)))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)


def _checksum(payload: bytes) -> str:
    """md5 of the lowercase hex string of the bytes — chosen (over md5 of
    the raw bytes) so the DuckDB oracle can reproduce it exactly:
    ``md5(lower(hex(payload)))`` (DuckDB has no md5(BLOB))."""
    return hashlib.md5(bytes(payload).hex().encode()).hexdigest()


def _fake_decode(checksum: str) -> tuple[int, int]:
    """Deterministic stand-in for a real decoder: derive dimensions from
    the payload checksum digest bytes."""
    d0, d1 = int(checksum[0:2], 16), int(checksum[2:4], 16)
    return 16 + d0 % 240, 16 + d1 % 240


def _pil():
    """Import Pillow if available, else None — the preferred real-decode
    backend (OPTIONAL dependency; without it the stdlib PPM/BMP codec
    takes over)."""
    try:
        from PIL import Image
        return Image
    except ImportError:
        return None


def decode_image_batch(pdf: pd.DataFrame, fake: bool) -> pd.DataFrame:
    if not fake:
        Image = _pil()
        if Image is not None:
            import io

            def dims(payload):
                try:
                    with Image.open(io.BytesIO(bytes(payload))) as im:
                        return im.width, im.height, True
                except Exception:
                    return 0, 0, False   # undecodable blob: flagged, kept
        else:
            # no Pillow: the stdlib PPM/BMP codec keeps the REAL decode
            # branch executable (bytes -> header parse -> dimensions);
            # formats it can't sniff are flagged, kept
            from .imagecodec import ImageCodecError
            from .imagecodec import decode as codec_decode

            def dims(payload):
                try:
                    rgb = codec_decode(bytes(payload))
                    return rgb.shape[1], rgb.shape[0], True
                except ImageCodecError:
                    return 0, 0, False

        decoded = pdf["payload"].map(dims)
        return pd.DataFrame({
            "media_id": pdf["media_id"],
            "kind": pdf["kind"],
            "n_bytes": pdf["payload"].map(len).astype("int32"),
            "checksum": pdf["payload"].map(_checksum),
            "width": decoded.map(lambda t: t[0]).astype("int32"),
            "height": decoded.map(lambda t: t[1]).astype("int32"),
            "ok": decoded.map(lambda t: t[2]).astype(bool),
        })
    checksums = pdf["payload"].map(_checksum)
    dims = checksums.map(_fake_decode)
    return pd.DataFrame({
        "media_id": pdf["media_id"],
        "kind": pdf["kind"],
        "n_bytes": pdf["payload"].map(len).astype("int32"),
        "checksum": checksums,
        "width": dims.map(lambda t: t[0]).astype("int32"),
        "height": dims.map(lambda t: t[1]).astype("int32"),
        "ok": True,
    })


def extract_features(df: DataFrame, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over binary payloads."""
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield decode_image_batch(pdf, fake)
    return df.mapInPandas(run, FEATURES_SCHEMA)


RESIZED_SCHEMA = ("media_id string, kind string, payload binary, "
                  "width int, height int, target_w int, target_h int, "
                  "scale double, ok boolean")


def resize_images(df: DataFrame, target_w: int = 224,
                  target_h: int = 224, fake: bool = True) -> DataFrame:
    """mapInPandas resize: decode -> aspect-preserving downscale ->
    re-encode (PNG under Pillow, PPM under the stdlib codec).  The FAKE
    path exercises the plumbing — blob in, blob out, metadata columns,
    Arrow batch shape — by computing the scale factor from the
    fake-decoded dimensions and passing the payload through.

    Scale notes: the output carries the payload column, so cap
    ``arrow.maxRecordsPerBatch`` for multi-MB blobs and never groupBy
    the resized frame directly — extract features first.
    """
    def _real_resize(pdf: pd.DataFrame) -> pd.DataFrame:
        Image = _pil()
        if Image is not None:
            import io

            def one(payload):
                with Image.open(io.BytesIO(bytes(payload))) as im:
                    w, h = im.width, im.height
                    s = min(target_w / w, target_h / h, 1.0)
                    tw, th = max(1, int(w * s)), max(1, int(h * s))
                    buf = io.BytesIO()
                    im.resize((tw, th)).save(buf, format="PNG")
                    return buf.getvalue(), w, h, tw, th, s
        else:
            # no Pillow: stdlib PPM/BMP decode -> vectorized
            # nearest-neighbor resample -> PPM re-encode
            from .imagecodec import decode as codec_decode
            from .imagecodec import encode_ppm, resize_nearest

            def one(payload):
                rgb = codec_decode(bytes(payload))
                h, w = rgb.shape[:2]
                s = min(target_w / w, target_h / h, 1.0)
                tw, th = max(1, int(w * s)), max(1, int(h * s))
                return (encode_ppm(resize_nearest(rgb, tw, th)),
                        w, h, tw, th, s)

        out = {"media_id": [], "kind": [], "payload": [], "width": [],
               "height": [], "target_w": [], "target_h": [], "scale": [],
               "ok": []}
        for mid, kind, payload in zip(pdf["media_id"], pdf["kind"],
                                      pdf["payload"]):
            try:
                blob, w, h, tw, th, s = one(payload)
                out["payload"].append(blob)
                out["width"].append(w); out["height"].append(h)
                out["target_w"].append(tw); out["target_h"].append(th)
                out["scale"].append(s); out["ok"].append(True)
            except Exception:
                out["payload"].append(bytes(payload))
                out["width"].append(0); out["height"].append(0)
                out["target_w"].append(0); out["target_h"].append(0)
                out["scale"].append(0.0); out["ok"].append(False)
            out["media_id"].append(mid); out["kind"].append(kind)
        pdf2 = pd.DataFrame(out)
        for c, t in (("width", "int32"), ("height", "int32"),
                     ("target_w", "int32"), ("target_h", "int32")):
            pdf2[c] = pdf2[c].astype(t)
        return pdf2

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                yield _real_resize(pdf)
                continue
            checksums = pdf["payload"].map(_checksum)
            dims = checksums.map(_fake_decode)
            w = dims.map(lambda t: t[0]).astype("int32")
            h = dims.map(lambda t: t[1]).astype("int32")
            # aspect-preserving: one uniform factor, never upscale
            scale = pd.concat([target_w / w, target_h / h],
                              axis=1).min(axis=1).clip(upper=1.0)
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "payload": pdf["payload"],
                "width": w,
                "height": h,
                "target_w": (w * scale).astype("int32"),
                "target_h": (h * scale).astype("int32"),
                "scale": scale.astype("float64"),
                "ok": True,
            })
    return df.mapInPandas(run, RESIZED_SCHEMA)


def frame_sample(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Deterministic frame-sampling stand-in: keep every Nth media row
    per kind by stable hash (the video-frame-sample plumbing: the real
    implementation samples frames inside the decode UDF)."""
    return df.filter(F.pmod(F.xxhash64("media_id"), F.lit(every_n)) == 0)
