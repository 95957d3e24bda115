"""Multimodal (image/audio/video) column processing (SURVEY.md §7 M5 /
training-data-pipeline extensions).

Media travel as opaque ``binary`` columns with typed metadata — the
only sane representation at 100 TB (no row-level Python objects, Arrow
moves bytes zero-copy into the decode UDFs). All heavy stages are
``mapInPandas`` over binary batches so decode/resize/sample run
vectorized per partition with no shuffle.

DECODE IS STUBBED: this container has no PIL/ffmpeg, so the decoders
parse a deterministic fake format (``FAKE<kind>:`` header). The Spark
plumbing — schemas, batch iteration, per-row error capture, explode
shapes — is real and tested; swapping ``_decode_fake`` for
PIL/libav calls is a function-body change only.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FAKE_IMAGE_MAGIC = b"FAKEIMG:"
FAKE_VIDEO_MAGIC = b"FAKEVID:"
FAKE_AUDIO_MAGIC = b"FAKEAUD:"

MEDIA_SCHEMA = (
    "media_id long, media_type string, payload binary, source_url string"
)
DECODED_SCHEMA = (
    "media_id long, media_type string, width int, height int, n_frames int, "
    "sample_rate int, n_samples int, format string, decode_error string"
)
_DECODED_COLS = [
    "media_id", "media_type", "width", "height", "n_frames",
    "sample_rate", "n_samples", "format", "decode_error",
]


def fake_image(width: int, height: int, seed: str) -> bytes:
    """Deterministic stand-in for encoded image bytes."""
    body = hashlib.sha256(seed.encode()).digest()
    return FAKE_IMAGE_MAGIC + f"{width}x{height}:".encode() + body


def fake_video(width: int, height: int, n_frames: int, seed: str) -> bytes:
    body = hashlib.sha256(seed.encode()).digest()
    return FAKE_VIDEO_MAGIC + f"{width}x{height}x{n_frames}:".encode() + body


def fake_audio(sample_rate: int, n_samples: int, seed: str) -> bytes:
    body = hashlib.sha256(seed.encode()).digest()
    return FAKE_AUDIO_MAGIC + f"{sample_rate}x{n_samples}:".encode() + body


def _decode_fake(payload: bytes) -> dict:
    """Stub decoder. Real deployments replace this body with
    PIL.Image.open / av.open / soundfile.read; everything around it
    stays."""
    if payload.startswith(FAKE_IMAGE_MAGIC):
        head = payload[len(FAKE_IMAGE_MAGIC):].split(b":", 1)[0].decode()
        w, h = (int(x) for x in head.split("x"))
        return {"width": w, "height": h, "n_frames": 1, "format": "fakeimg"}
    if payload.startswith(FAKE_VIDEO_MAGIC):
        head = payload[len(FAKE_VIDEO_MAGIC):].split(b":", 1)[0].decode()
        w, h, n = (int(x) for x in head.split("x"))
        return {"width": w, "height": h, "n_frames": n, "format": "fakevid"}
    if payload.startswith(FAKE_AUDIO_MAGIC):
        head = payload[len(FAKE_AUDIO_MAGIC):].split(b":", 1)[0].decode()
        sr, n = (int(x) for x in head.split("x"))
        return {"sample_rate": sr, "n_samples": n, "format": "fakeaud"}
    # Real-image path, import-gated like the PDF handler's fitz branch
    # (sources/file_handlers.py): PIL isn't in this image, but on a real
    # cluster this decodes actual image bytes; video/audio stay
    # NotImplementedError until libav/soundfile are present.
    try:
        import io

        from PIL import Image  # not in this image; real deployments have it
    except ImportError:
        raise NotImplementedError(
            "real media decode requires PIL/libav/soundfile, not present "
            "in this image"
        ) from None
    with Image.open(io.BytesIO(payload)) as img:
        return {"width": img.width, "height": img.height, "n_frames": 1,
                "format": (img.format or "unknown").lower()}


def decode_metadata(media: DataFrame) -> DataFrame:
    """Decode stage: binary payload → typed metadata, per-row errors
    captured into decode_error (dead-letter discipline, never a task
    failure)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                base = {"media_id": r.media_id, "media_type": r.media_type,
                        "width": None, "height": None, "n_frames": None,
                        "sample_rate": None, "n_samples": None,
                        "format": None, "decode_error": None}
                try:
                    base.update(_decode_fake(bytes(r.payload)))
                except Exception as exc:
                    base["decode_error"] = f"{type(exc).__name__}: {exc}"
                out.append(base)
            yield pd.DataFrame(out, columns=_DECODED_COLS)

    return media.mapInPandas(run, schema=DECODED_SCHEMA)


def media_features(media: DataFrame, dims: int = 64) -> DataFrame:
    """Feature-extract stage: payload → embedding (stub: SHA-256
    counter floats, normalized — same recipe as the vision embedder)."""
    from crawler_spark.functions.embedding import StubEmbedder

    emb = StubEmbedder(dims)

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "media_id": pdf["media_id"],
                "embedding": [
                    emb.embed_vision(hashlib.sha256(bytes(p)).hexdigest())
                    for p in pdf["payload"]
                ],
            })

    return media.mapInPandas(run, schema="media_id long, embedding array<double>")


def resize_images(media: DataFrame, width: int, height: int) -> DataFrame:
    """Resize stage (stub: rewrites the fake header; real impl calls
    PIL thumbnail and re-encodes). Binary in → binary out, streaming
    through Arrow batches."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                p = bytes(r.payload)
                if p.startswith(FAKE_IMAGE_MAGIC):
                    body = p.split(b":", 2)[2]
                    p = FAKE_IMAGE_MAGIC + f"{width}x{height}:".encode() + body
                out.append({"media_id": r.media_id, "media_type": r.media_type,
                            "payload": p, "source_url": r.source_url})
            yield pd.DataFrame(out, columns=["media_id", "media_type", "payload",
                                             "source_url"])

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def resample_audio(media: DataFrame, target_rate: int) -> DataFrame:
    """Resample stage for audio rows (stub: rewrites the fake header
    with the target rate and the proportionally scaled sample count;
    real impl calls soxr/librosa). Non-audio payloads pass through
    untouched — the same binary-in/binary-out Arrow shape as
    resize_images."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                p = bytes(r.payload)
                if p.startswith(FAKE_AUDIO_MAGIC):
                    head, body = p[len(FAKE_AUDIO_MAGIC):].split(b":", 1)
                    sr, n = (int(x) for x in head.decode().split("x"))
                    n_new = max(1, round(n * target_rate / sr)) if sr else 0
                    p = FAKE_AUDIO_MAGIC + f"{target_rate}x{n_new}:".encode() + body
                out.append({"media_id": r.media_id, "media_type": r.media_type,
                            "payload": p, "source_url": r.source_url})
            yield pd.DataFrame(out, columns=["media_id", "media_type", "payload",
                                             "source_url"])

    return media.mapInPandas(run, schema=MEDIA_SCHEMA)


def sample_frames(media: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame-sampling stage for video rows: one output row per sampled
    frame (frame payloads stubbed as fake images derived from the video
    payload + frame index)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for r in pdf.itertuples(index=False):
                p = bytes(r.payload)
                try:
                    meta = _decode_fake(p)
                except Exception:
                    continue
                if meta["format"] != "fakevid":
                    continue
                for fi in range(0, meta["n_frames"], every_n):
                    out.append({
                        "media_id": r.media_id,
                        "frame_index": fi,
                        "frame": fake_image(meta["width"], meta["height"],
                                            f"{hashlib.sha256(p).hexdigest()}|{fi}"),
                    })
            yield pd.DataFrame(out, columns=["media_id", "frame_index", "frame"])

    return media.mapInPandas(run, schema="media_id long, frame_index int, frame binary")


def synthesize_media_from_documents(docs: DataFrame) -> DataFrame:
    """Deterministic media table derived from the documents table (the
    testdata has no binary columns): doc_id % 4 picks
    image/video/audio/junk so decode, frame sampling, resampling, and
    the error branch all get exercised."""
    img = F.udf(lambda d, t: fake_image(64 + d % 256, 64 + d % 128, t), "binary")
    vid = F.udf(lambda d, t: fake_video(32 + d % 64, 32 + d % 64, 30 + d % 60, t), "binary")
    aud = F.udf(lambda d, t: fake_audio(8000 * (1 + d % 6), 16000 + d % 48000, t), "binary")
    payload = (
        F.when(F.col("doc_id") % 4 == 0, img(F.col("doc_id"), F.col("text")))
        .when(F.col("doc_id") % 4 == 1, vid(F.col("doc_id"), F.col("text")))
        .when(F.col("doc_id") % 4 == 2, aud(F.col("doc_id"), F.col("text")))
        .otherwise(F.encode(F.substring("text", 1, 16), "utf-8"))
    )
    mtype = (
        F.when(F.col("doc_id") % 4 == 0, F.lit("image"))
        .when(F.col("doc_id") % 4 == 1, F.lit("video"))
        .when(F.col("doc_id") % 4 == 2, F.lit("audio"))
        .otherwise(F.lit("unknown"))
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        mtype.alias("media_type"),
        payload.alias("payload"),
        F.concat(F.lit("https://"), F.col("source"), F.lit("/m/"), F.col("doc_id"))
        .alias("source_url"),
    )


def phash_images(media: DataFrame, id_col: str = "media_id") -> DataFrame:
    """Perceptual-hash stage for image near-dup (the LAION-scale image
    dedup recipe): payload → 64-bit content hash, mapInPandas over
    binary batches, no shuffle. Real pHash is grayscale → 32×32 DCT →
    top-left 8×8 coefficients thresholded at their median (similar
    images → small hamming distance); the stub derives the 64 bits
    from the decoded fake body, which keeps the property the pair
    machinery needs — identical content → identical hash, crafted
    near-identical bodies → small hamming — without PIL in the image.

    Returns (id, simhash) shaped for
    ``operators/dedup.py hamming_pairs_from_signatures``, the SAME
    banded candidate + bit_count verification machinery text SimHash
    uses: one 100 TB pair pipeline, two modalities. Non-image or
    undecodable payloads are dropped (dedup over images only)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, hs = [], []
            for mid, payload in zip(pdf[id_col], pdf["payload"]):
                p = bytes(payload)
                if not p.startswith(FAKE_IMAGE_MAGIC):
                    continue
                parts = p.split(b":", 2)
                if len(parts) < 3 or len(parts[2]) < 8:
                    continue
                ids.append(mid)
                hs.append(int.from_bytes(parts[2][:8], "big", signed=True))
            yield pd.DataFrame({"id": ids, "simhash": hs})

    return media.mapInPandas(run, schema="id long, simhash long")
