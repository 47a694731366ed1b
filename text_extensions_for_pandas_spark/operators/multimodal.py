"""Multimodal (image/audio/video) columns for training-data pipelines.

Beyond-reference surface (BASELINE.json north star).  Media assets are
opaque ``binary`` columns plus a typed metadata struct — the same
out-of-band-shape idea as the reference's Arrow tensor metadata
(``array/arrow_conversion.py:304-425``), generalized to media:

    assets(asset_id long, kind string, content binary,
           meta struct<width:int, height:int, channels:int,
                       sample_rate:int, n_frames:int, format:string>)

All operators are iterator-style ``mapInPandas`` stages: one Python call
per Arrow batch, bytes never pass through a Python row loop.  Image decode
(``_decode_image_bytes``) has three tiers:

* uncompressed PPM (P6) and 24/32-bpp BI_RGB BMP decode **for real** with
  pure numpy — no codec needed, feature values verified against a
  driver-side recompute in tests;
* Pillow handles compressed formats when importable (codecs absent in
  this container);
* anything else falls back to a clearly-marked DETERMINISTIC FAKE
  (pixels from ``md5(content)``), so Spark-side plumbing (schema, batch
  shape, partitioning, downstream numpy math) stays exercised and
  reproducible.  Audio decode remains the deterministic fake.

Scale notes: decode is CPU-heavy and embarrassingly parallel — the only
knobs that matter are input split size (``spark.sql.files.maxPartitionBytes``
for binary-file sources) and Arrow batch size (``spark.sql.execution.arrow.
maxRecordsPerBatch``) to bound executor memory at (batch rows × decoded
size).  ``repartition_for_decode`` salts by asset id so a few huge videos
don't serialize one task.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ASSET_META_DDL = (
    "width int, height int, channels int, sample_rate int, "
    "n_frames int, format string"
)
ASSETS_DDL = f"asset_id long, kind string, content binary, meta struct<{ASSET_META_DDL}>"

DECODED_IMAGE_DDL = (
    "asset_id long, height int, width int, channels int, pixels binary"
)
IMAGE_FEATURES_DDL = (
    "asset_id long, mean_r double, mean_g double, mean_b double, "
    "std_gray double, phash string"
)
AUDIO_FEATURES_DDL = (
    "asset_id long, n_samples int, sample_rate int, rms double, "
    "zero_crossings int"
)
FRAME_DDL = "asset_id long, frame_idx int, height int, width int, pixels binary"


def _fake_pixels(content: bytes, height: int, width: int, channels: int) -> np.ndarray:
    """DETERMINISTIC FAKE image decode — synthesizes an (h, w, c) uint8 array
    from md5(content).  Replace with Pillow decode where codecs exist."""
    seed = int.from_bytes(hashlib.md5(content or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(height, width, channels), dtype=np.uint8)


def _decode_ppm(content: bytes) -> np.ndarray:
    """Real decode of binary PPM (P6): pure numpy, no codec needed.
    Header: ``P6 <width> <height> <maxval>`` (whitespace/comment separated)
    followed by h*w*3 raw RGB bytes."""
    fields: list[int] = []
    pos = 2  # past "P6"
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":  # comment to end of line
            pos = content.index(b"\n", pos) + 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # single whitespace after maxval
    w, h, maxval = fields
    if maxval != 255:
        raise ValueError(f"unsupported PPM maxval {maxval}")
    px = np.frombuffer(content, dtype=np.uint8, count=h * w * 3, offset=pos)
    return px.reshape(h, w, 3)


def _decode_bmp(content: bytes) -> np.ndarray:
    """Real decode of uncompressed 24/32-bpp BI_RGB BMP: pure numpy.
    Rows are bottom-up, BGR(A) order, padded to 4-byte multiples."""
    if content[:2] != b"BM":
        raise ValueError("not a BMP")
    data_offset = int.from_bytes(content[10:14], "little")
    w = int.from_bytes(content[18:22], "little", signed=True)
    h = int.from_bytes(content[22:26], "little", signed=True)
    bpp = int.from_bytes(content[28:30], "little")
    compression = int.from_bytes(content[30:34], "little")
    if compression != 0 or bpp not in (24, 32):
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    top_down = h < 0
    h = abs(h)
    nch = bpp // 8
    stride = (w * nch + 3) & ~3
    rows = np.frombuffer(
        content, dtype=np.uint8, count=stride * h, offset=data_offset
    ).reshape(h, stride)[:, : w * nch].reshape(h, w, nch)
    if not top_down:
        rows = rows[::-1]
    # BGR(A) -> RGB
    return np.ascontiguousarray(rows[:, :, 2::-1])


def _decode_image_bytes(content: bytes, meta) -> np.ndarray:
    """Decode one image to an (h, w, c) uint8 array.

    Real paths, in order: Pillow when importable (compressed formats);
    built-in pure-numpy decoders for uncompressed PPM (P6) and BMP —
    formats simple enough to decode without codecs, so feature values are
    oracle-checkable in this container.  Anything else falls back to the
    clearly-marked deterministic fake (see module docstring)."""
    if content:
        try:
            if content[:2] == b"P6":
                return _decode_ppm(content)
            if content[:2] == b"BM":
                return _decode_bmp(content)
        except Exception:
            pass  # magic bytes lied (e.g. text starting "BM") — fall through
    try:
        import io

        from PIL import Image  # codecs absent in this container

        return np.asarray(Image.open(io.BytesIO(content)).convert("RGB"))
    except ImportError:
        h = int(meta["height"]) if meta is not None and meta["height"] else 16
        w = int(meta["width"]) if meta is not None and meta["width"] else 16
        c = int(meta["channels"]) if meta is not None and meta["channels"] else 3
        return _fake_pixels(content, h, w, c)


def _decode_wav(content: bytes) -> tuple[np.ndarray, int]:
    """REAL decode of RIFF/WAVE PCM (8- or 16-bit) with stdlib ``wave`` +
    numpy — uncompressed like PPM/BMP, so no codec needed.  Multi-channel
    clips are mixed down to mono (mean)."""
    import io
    import wave

    with wave.open(io.BytesIO(content), "rb") as w:
        sr = w.getframerate()
        ch = w.getnchannels()
        sw = w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float32) / 32768.0
    elif sw == 1:  # 8-bit WAV is unsigned
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32) - 128.0) / 128.0
    else:
        raise ValueError(f"unsupported PCM sample width {sw}")
    if ch > 1:
        arr = arr.reshape(-1, ch).mean(axis=1)
    return arr, sr


def _decode_audio_bytes(content: bytes, meta) -> tuple[np.ndarray, int]:
    """Decode one audio clip to (float32 samples in [-1, 1], sample_rate).

    Real path: RIFF/WAVE PCM via :func:`_decode_wav` (pure numpy/stdlib).
    Compressed formats (no codec in this container) fall back to the
    clearly-marked DETERMINISTIC FAKE (md5-seeded noise)."""
    if content and content[:4] == b"RIFF" and content[8:12] == b"WAVE":
        try:
            return _decode_wav(content)
        except Exception:
            pass  # malformed header — fall through to the fake
    sr = int(meta["sample_rate"]) if meta is not None and meta["sample_rate"] else 8000
    n = max(1, len(content or b""))
    seed = int.from_bytes(hashlib.md5(content or b"").digest()[:8], "big")
    rng = np.random.default_rng(seed)
    return rng.uniform(-1, 1, size=n).astype(np.float32), sr


def repartition_for_decode(assets: DataFrame, partitions: int | None = None) -> DataFrame:
    """Spread assets evenly before a decode stage (hash of asset_id, not
    file order — media files arrive heavily size-skewed)."""
    n = partitions or int(
        assets.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return assets.repartition(n, F.xxhash64("asset_id"))


def decode_images(assets: DataFrame) -> DataFrame:
    """binary → decoded pixel rows ``(asset_id, height, width, channels,
    pixels)``; ``pixels`` is the raw C-order uint8 buffer (h·w·c bytes) —
    kept as ``binary`` so a 100 TB decode's output stays columnar and
    compact instead of exploding into ``array<int>`` boxing."""

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for content, meta, aid in zip(
                pdf["content"], pdf["meta"], pdf["asset_id"]
            ):
                px = _decode_image_bytes(content, meta)
                rows.append(
                    (int(aid), px.shape[0], px.shape[1], px.shape[2], px.tobytes())
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "height", "width", "channels", "pixels"]
            )

    return assets.filter(F.col("kind") == "image").mapInPandas(
        _decode, schema=DECODED_IMAGE_DDL
    )


def resize_images(decoded: DataFrame, out_h: int, out_w: int) -> DataFrame:
    """Nearest-neighbor resize on decoded pixel buffers (real numpy math —
    index-gather per batch)."""

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for aid, h, w, c, buf in zip(
                pdf["asset_id"], pdf["height"], pdf["width"], pdf["channels"],
                pdf["pixels"],
            ):
                px = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c)
                yi = (np.arange(out_h) * h // out_h)
                xi = (np.arange(out_w) * w // out_w)
                rs = px[yi][:, xi]
                out.append((int(aid), out_h, out_w, int(c), rs.tobytes()))
            yield pd.DataFrame(
                out, columns=["asset_id", "height", "width", "channels", "pixels"]
            )

    return decoded.mapInPandas(_resize, schema=DECODED_IMAGE_DDL)


def image_features(decoded: DataFrame) -> DataFrame:
    """Per-image features: channel means, gray stddev, and an 8x8
    average-hash perceptual fingerprint (hex string) — the dedup key for
    near-duplicate *images*."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, h, w, c, buf in zip(
                pdf["asset_id"], pdf["height"], pdf["width"], pdf["channels"],
                pdf["pixels"],
            ):
                px = np.frombuffer(buf, dtype=np.uint8).reshape(h, w, c).astype(np.float64)
                means = px.mean(axis=(0, 1))
                gray = px.mean(axis=2)
                # 8x8 average hash: downsample, threshold at mean
                yi = (np.arange(8) * h // 8)
                xi = (np.arange(8) * w // 8)
                small = gray[yi][:, xi]
                bits = (small > small.mean()).flatten()
                phash = int("".join("1" if b else "0" for b in bits), 2)
                rows.append(
                    (
                        int(aid),
                        float(means[0]),
                        float(means[1] if c > 1 else means[0]),
                        float(means[2] if c > 2 else means[0]),
                        float(gray.std()),
                        f"{phash:016x}",
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "mean_r", "mean_g", "mean_b", "std_gray", "phash"],
            )

    return decoded.mapInPandas(_feat, schema=IMAGE_FEATURES_DDL)


def audio_features(assets: DataFrame) -> DataFrame:
    """Per-clip audio features over decoded samples: RMS energy and
    zero-crossing count."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                samples, sr = _decode_audio_bytes(content, meta)
                rms = float(np.sqrt(np.mean(samples**2))) if len(samples) else 0.0
                zc = int(np.count_nonzero(np.diff(np.signbit(samples))))
                rows.append((int(aid), len(samples), sr, rms, zc))
            yield pd.DataFrame(
                rows,
                columns=["asset_id", "n_samples", "sample_rate", "rms", "zero_crossings"],
            )

    return assets.filter(F.col("kind") == "audio").mapInPandas(
        _feat, schema=AUDIO_FEATURES_DDL
    )


def sample_video_frames(assets: DataFrame, every_n: int = 10) -> DataFrame:
    """Frame sampling for video assets: emit every ``every_n``-th frame as a
    decoded image row.  Frame decode is the stubbed image decode salted with
    the frame index (a real build would seek the container format)."""

    def _frames(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for aid, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                n_frames = int(meta["n_frames"]) if meta is not None and meta["n_frames"] else 0
                for fi in range(0, n_frames, every_n):
                    px = _decode_image_bytes(
                        (content or b"") + fi.to_bytes(4, "big"), meta
                    )
                    rows.append(
                        (int(aid), fi, px.shape[0], px.shape[1], px.tobytes())
                    )
            yield pd.DataFrame(
                rows, columns=["asset_id", "frame_idx", "height", "width", "pixels"]
            )

    return assets.filter(F.col("kind") == "video").mapInPandas(
        _frames, schema=FRAME_DDL
    )


def phash_near_dups(features: DataFrame, max_hamming: int = 8) -> DataFrame:
    """Near-duplicate image pairs by perceptual-hash Hamming distance.

    LSH-style blocking: split the 64-bit phash into 4 × 16-bit bands and
    equijoin on (band, value), so only bucket collisions become candidates
    and the exact Hamming check never sees all pairs.  Recall is guaranteed
    for distance < 4 (pigeonhole: 4 differing bands needs ≥ 4 differing
    bits) and probabilistic above — the standard multi-band LSH trade; add
    bands (8 × 8-bit) to push the guarantee higher at more shuffle cost.
    """
    from text_extensions_for_pandas_spark.operators.dedup import (
        hamming_distance_hex,
    )

    bands = features.select(
        F.col("asset_id"),
        F.col("phash"),
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(i).alias("band"),
                    F.substring("phash", i * 4 + 1, 4).alias("val"),
                )
                for i in range(4)
            ])
        ).alias("b"),
    ).select("asset_id", "phash", F.col("b.band").alias("band"), F.col("b.val").alias("val"))
    other = bands.select(
        F.col("asset_id").alias("asset_b"),
        F.col("phash").alias("phash_b"),
        F.col("band").alias("band_b"),
        F.col("val").alias("val_b"),
    )
    cands = (
        bands.join(
            other,
            (F.col("band") == F.col("band_b"))
            & (F.col("val") == F.col("val_b"))
            & (F.col("asset_id") < F.col("asset_b")),
        )
        .select("asset_id", "asset_b", "phash", "phash_b")
        .distinct()
    )
    return cands.select(
        F.col("asset_id").alias("asset_a"),
        F.col("asset_b"),
        hamming_distance_hex(F.col("phash"), F.col("phash_b")).alias("hamming"),
    ).filter(F.col("hamming") <= max_hamming)


# ---------------------------------------------------------------------------
# Image embeddings: the bridge from decoded pixels to the ANN/SemDeDup tiers
# ---------------------------------------------------------------------------

IMAGE_EMBEDDING_DDL = "asset_id long, embedding array<double>"

# fallback projection matrices, cached per (grid, dim) per process
_EMBED_PROJ_CACHE: dict = {}


def _fallback_embed_py(
    px: "np.ndarray", dim: int, grid: int
) -> "np.ndarray":
    """Deterministic stand-in image encoder (driver-side reference; the
    mapInPandas island calls this): block-mean the grayscale image to a
    ``grid × grid`` raster, mean-center, project with a FIXED seeded
    Gaussian matrix, L2-normalize.  Smooth by construction — small pixel
    perturbations move the embedding slightly, so near-duplicate images
    land at cosine ≈ 1 (the property SemDeDup/ANN consume) while
    unrelated images (mean-centered, so the shared positive-brightness
    component is removed) land near 0.  NOT a semantic encoder: it sees
    pixels, not concepts — swap in a real vision model via
    :func:`embed_images`' ``model`` hook for production."""
    key = (grid, dim)
    proj = _EMBED_PROJ_CACHE.get(key)
    if proj is None:
        proj = np.random.default_rng(0x5EED).standard_normal(
            (grid * grid, dim)
        )
        _EMBED_PROJ_CACHE[key] = proj
    gray = px.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, grid + 1).astype(int)
    xs = np.linspace(0, w, grid + 1).astype(int)
    cells = np.empty(grid * grid, dtype=np.float64)
    k = 0
    for a in range(grid):
        y0, y1 = ys[a], max(ys[a + 1], ys[a] + 1)
        for b in range(grid):
            x0, x1 = xs[b], max(xs[b + 1], xs[b] + 1)
            cells[k] = gray[y0:y1, x0:x1].mean()
            k += 1
    cells -= cells.mean()
    emb = cells @ proj
    norm = np.linalg.norm(emb)
    if norm > 0:
        emb = emb / norm
    else:
        # perfectly flat image: a fixed deterministic unit vector
        emb = np.zeros(dim)
        emb[0] = 1.0
    return emb


def _load_image_encoder(model: str):
    """Import-try a real vision encoder (the ``nlp_bridges`` pattern:
    heavy deps are optional, the Spark plumbing is not).  Returns a
    ``pixels(h,w,c uint8) -> 1-D float vector`` callable, or None when
    the stack isn't importable — callers fall back to
    :func:`_fallback_embed_py`."""
    try:  # pragma: no cover - the vision stack isn't in this container
        import torch  # noqa: F401
        from transformers import AutoImageProcessor, AutoModel

        proc = AutoImageProcessor.from_pretrained(model)
        enc = AutoModel.from_pretrained(model)
        enc.eval()

        def encode(px):
            with torch.no_grad():
                inputs = proc(images=px, return_tensors="pt")
                out = enc(**inputs)
                vec = out.last_hidden_state.mean(dim=1)[0]
                return vec.numpy().astype(np.float64)

        return encode
    except Exception:
        return None


def embed_images(
    decoded: DataFrame,
    dim: int = 64,
    grid: int = 8,
    model: str | None = None,
) -> DataFrame:
    """Decoded pixel rows → ``(asset_id, embedding array<double>)`` — the
    bridge that feeds images into the EXISTING text-side ANN/dedup tiers
    (:func:`~.similarity.ivf_topk`, :func:`~.similarity.semantic_dedup`,
    :func:`~.similarity.write_ivfpq_index`): semantic image near-dup
    detection instead of the syntactic phash tier.

    ``model`` names a HuggingFace vision encoder, import-tried PER
    EXECUTOR (the ``nlp_bridges`` pattern); when absent — as in this
    container — every row falls back to the deterministic block-mean
    projection (:func:`_fallback_embed_py`), so the Spark-side plumbing
    (schema, batch shape, L2 normalization, downstream IVF bucketing) is
    real and tested even without the model weights.  Embeddings are
    L2-normalized either way, so cosine == dot for the downstream tiers.

    Scale shape: one iterator ``mapInPandas`` island, model loaded once
    per executor (not per batch), output is ``corpus × dim`` doubles —
    the same shape the embeddings table already has.
    """

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoder = _load_image_encoder(model) if model else None
        for pdf in batches:
            rows = []
            for aid, h, w, c, buf in zip(
                pdf["asset_id"], pdf["height"], pdf["width"],
                pdf["channels"], pdf["pixels"],
            ):
                px = np.frombuffer(buf, dtype=np.uint8).reshape(
                    int(h), int(w), int(c)
                )
                if encoder is not None:
                    vec = np.asarray(encoder(px), dtype=np.float64)
                    norm = np.linalg.norm(vec)
                    if norm > 0:
                        vec = vec / norm
                else:
                    vec = _fallback_embed_py(px, dim, grid)
                rows.append((int(aid), vec.tolist()))
            yield pd.DataFrame(rows, columns=["asset_id", "embedding"])

    return decoded.mapInPandas(_embed, schema=IMAGE_EMBEDDING_DDL)


def embed_image_assets(
    assets: DataFrame,
    dim: int = 64,
    grid: int = 8,
    model: str | None = None,
) -> DataFrame:
    """Fused decode + embed in ONE ``mapInPandas`` island:
    ``assets`` (binary content + meta) → ``(asset_id, embedding)``
    directly, never materializing decoded pixel buffers in the plan.

    :func:`decode_images` → :func:`embed_images` is the right shape
    when several consumers share the decode (features + phash +
    embeddings off one decoded frame); when embeddings are the ONLY
    consumer — the semantic-dedup ingest path — the two-stage plan
    ships every decoded buffer (h·w·c bytes/row, 10-50× the compressed
    input) through Arrow between the stages.  The fused island decodes
    and immediately reduces each image to its ``dim``-float embedding,
    so the stage's output is corpus × dim doubles and peak memory is
    one Arrow batch of decoded frames.  Same encoder contract as
    :func:`embed_images` (``model`` import-tried per executor,
    deterministic fallback otherwise); results are bit-identical to the
    two-stage path by construction (same decode, same encoder)."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoder = _load_image_encoder(model) if model else None
        for pdf in batches:
            rows = []
            for aid, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                px = _decode_image_bytes(content, meta)
                if encoder is not None:
                    vec = np.asarray(encoder(px), dtype=np.float64)
                    norm = np.linalg.norm(vec)
                    if norm > 0:
                        vec = vec / norm
                else:
                    vec = _fallback_embed_py(px, dim, grid)
                rows.append((int(aid), vec.tolist()))
            yield pd.DataFrame(rows, columns=["asset_id", "embedding"])

    return assets.filter(F.col("kind") == "image").mapInPandas(
        _embed, schema=IMAGE_EMBEDDING_DDL
    )


def _fallback_embed_audio_py(
    samples: "np.ndarray", dim: int, frames: int
) -> "np.ndarray":
    """Deterministic stand-in audio encoder (the island maps this):
    frame the waveform into ``frames`` equal windows, per-window RMS +
    zero-crossing rate (2·frames features), mean-center each feature
    family, project with the same fixed seeded Gaussian family as the
    image fallback, L2-normalize.  Smooth: small amplitude/sample
    perturbations move the embedding slightly, so near-duplicate clips
    land at cosine ≈ 1 while different signals separate.  NOT a
    semantic encoder — swap in a real model via
    :func:`embed_audio_assets`' ``model`` hook."""
    key = ("audio", frames, dim)
    proj = _EMBED_PROJ_CACHE.get(key)
    if proj is None:
        proj = np.random.default_rng(0xA0D10).standard_normal(
            (2 * frames, dim)
        )
        _EMBED_PROJ_CACHE[key] = proj
    x = samples.astype(np.float64)
    n = len(x)
    if n < frames:
        x = np.pad(x, (0, frames - n))
        n = frames
    edges = np.linspace(0, n, frames + 1).astype(int)
    rms = np.empty(frames)
    zcr = np.empty(frames)
    for f in range(frames):
        w = x[edges[f]:max(edges[f + 1], edges[f] + 1)]
        rms[f] = np.sqrt((w * w).mean())
        zcr[f] = np.mean(np.signbit(w[1:]) != np.signbit(w[:-1])) if len(w) > 1 else 0.0
    feats = np.concatenate([rms - rms.mean(), zcr - zcr.mean()])
    emb = feats @ proj
    norm = np.linalg.norm(emb)
    if norm > 0:
        emb = emb / norm
    else:
        emb = np.zeros(dim)
        emb[0] = 1.0
    return emb


def _load_audio_encoder(model: str):
    """Import-try a real audio encoder (same pattern as
    :func:`_load_image_encoder`); returns ``samples -> 1-D vector`` or
    None when the stack isn't importable."""
    try:  # pragma: no cover - the audio stack isn't in this container
        import torch  # noqa: F401
        from transformers import AutoFeatureExtractor, AutoModel

        proc = AutoFeatureExtractor.from_pretrained(model)
        enc = AutoModel.from_pretrained(model)
        enc.eval()

        def encode(samples, sr):
            with torch.no_grad():
                inputs = proc(
                    samples, sampling_rate=sr, return_tensors="pt"
                )
                out = enc(**inputs)
                return (
                    out.last_hidden_state.mean(dim=1)[0]
                    .numpy()
                    .astype(np.float64)
                )

        return encode
    except Exception:
        return None


def embed_audio_assets(
    assets: DataFrame,
    dim: int = 64,
    frames: int = 32,
    model: str | None = None,
) -> DataFrame:
    """Audio assets → ``(asset_id, embedding array<double>)`` — the
    audio twin of :func:`embed_image_assets`, feeding the same ANN /
    SemDeDup tiers so near-duplicate CLIPS (re-encodes, level changes)
    dedup semantically like text and images.  Fused decode + embed in
    one ``mapInPandas`` island (waveforms, like pixels, are much larger
    than their embeddings); ``model`` names a HuggingFace audio encoder
    import-tried per executor, with the deterministic windowed
    RMS/zero-crossing fallback otherwise.  L2-normalized either way."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        encoder = _load_audio_encoder(model) if model else None
        for pdf in batches:
            rows = []
            for aid, content, meta in zip(
                pdf["asset_id"], pdf["content"], pdf["meta"]
            ):
                samples, sr = _decode_audio_bytes(content, meta)
                if encoder is not None:
                    vec = np.asarray(encoder(samples, sr), dtype=np.float64)
                    norm = np.linalg.norm(vec)
                    if norm > 0:
                        vec = vec / norm
                else:
                    vec = _fallback_embed_audio_py(samples, dim, frames)
                rows.append((int(aid), vec.tolist()))
            yield pd.DataFrame(rows, columns=["asset_id", "embedding"])

    return assets.filter(F.col("kind") == "audio").mapInPandas(
        _embed, schema=IMAGE_EMBEDDING_DDL
    )
