"""Multimodal plumbing tests: schemas, batch shapes, determinism, and the
numpy math stages — decode itself is the documented deterministic fake."""

import pyspark.sql.functions as F
import pytest

from text_extensions_for_pandas_spark.operators import multimodal as MM


@pytest.fixture(scope="module")
def assets(spark):
    # synthesize binary assets from document text bytes — deterministic
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    img = docs.filter("doc_id % 3 = 0").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("image").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(24).alias("width"),
            F.lit(16).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("fake/rgb").alias("format"),
        ).alias("meta"),
    )
    aud = docs.filter("doc_id % 3 = 1").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("audio").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("channels"),
            F.lit(8000).alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
            F.lit("fake/pcm").alias("format"),
        ).alias("meta"),
    )
    vid = docs.filter("doc_id % 3 = 2").select(
        F.col("doc_id").alias("asset_id"),
        F.lit("video").alias("kind"),
        F.encode("text", "utf-8").alias("content"),
        F.struct(
            F.lit(8).alias("width"),
            F.lit(8).alias("height"),
            F.lit(3).alias("channels"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(25).alias("n_frames"),
            F.lit("fake/frames").alias("format"),
        ).alias("meta"),
    )
    return img.unionByName(aud).unionByName(vid).cache()


def test_decode_schema_and_shapes(assets):
    decoded = MM.decode_images(MM.repartition_for_decode(assets))
    rows = decoded.collect()
    assert len(rows) == assets.filter("kind = 'image'").count() > 0
    for r in rows[:5]:
        assert (r.height, r.width, r.channels) == (16, 24, 3)
        assert len(r.pixels) == 16 * 24 * 3


def test_decode_deterministic(assets):
    d1 = {r.asset_id: r.pixels for r in MM.decode_images(assets).collect()}
    d2 = {r.asset_id: r.pixels for r in MM.decode_images(assets).collect()}
    assert d1 == d2


def test_resize(assets):
    resized = MM.resize_images(MM.decode_images(assets), 8, 8)
    rows = resized.collect()
    assert all(len(r.pixels) == 8 * 8 * 3 for r in rows)
    assert {r.asset_id for r in rows} == {
        r.asset_id for r in assets.filter("kind='image'").select("asset_id").collect()
    }


def test_image_features_and_phash_dups(assets):
    feats = MM.image_features(MM.decode_images(assets)).cache()
    rows = feats.collect()
    assert all(0 <= r.mean_r <= 255 and len(r.phash) == 16 for r in rows)
    # identical content -> identical phash -> hamming 0 pair
    doubled = assets.filter("kind='image'").unionByName(
        assets.filter("kind='image'").withColumn(
            "asset_id", F.col("asset_id") + 100000
        )
    )
    dup_feats = MM.image_features(MM.decode_images(doubled))
    pairs = MM.phash_near_dups(dup_feats, max_hamming=0)
    exact = {
        (r.asset_a, r.asset_b) for r in pairs.filter("hamming = 0").collect()
    }
    for r in assets.filter("kind='image'").select("asset_id").collect():
        assert (r.asset_id, r.asset_id + 100000) in exact


def test_audio_features(assets):
    rows = MM.audio_features(assets).collect()
    assert len(rows) == assets.filter("kind='audio'").count() > 0
    for r in rows[:5]:
        assert r.sample_rate == 8000 and 0 < r.rms < 1 and r.n_samples > 0


def test_video_frame_sampling(assets):
    frames = MM.sample_video_frames(assets, every_n=10)
    per_asset = (
        frames.groupBy("asset_id").count().collect()
    )
    # 25 frames, every 10th -> indices 0, 10, 20
    assert per_asset and all(r["count"] == 3 for r in per_asset)
    idx = {r.frame_idx for r in frames.select("frame_idx").distinct().collect()}
    assert idx == {0, 10, 20}


def _encode_ppm(px):
    import numpy as np

    h, w, _ = px.shape
    return b"P6\n# test\n%d %d\n255\n" % (w, h) + np.ascontiguousarray(px).tobytes()


def _encode_bmp(px, bpp=24):
    """Minimal uncompressed BI_RGB BMP writer (bottom-up, BGR, padded rows)."""
    import numpy as np

    h, w, _ = px.shape
    nch = bpp // 8
    bgr = px[:, :, ::-1]
    if nch == 4:
        bgr = np.concatenate(
            [bgr, np.full((h, w, 1), 255, dtype=np.uint8)], axis=2
        )
    stride = (w * nch + 3) & ~3
    body = bytearray()
    for row in bgr[::-1]:
        raw = row.tobytes()
        body += raw + b"\x00" * (stride - len(raw))
    data_offset = 54
    size = data_offset + len(body)
    header = (
        b"BM" + size.to_bytes(4, "little") + b"\x00\x00\x00\x00"
        + data_offset.to_bytes(4, "little")
        + (40).to_bytes(4, "little")
        + w.to_bytes(4, "little", signed=True)
        + h.to_bytes(4, "little", signed=True)
        + (1).to_bytes(2, "little")
        + bpp.to_bytes(2, "little")
        + (0).to_bytes(4, "little")  # BI_RGB
        + len(body).to_bytes(4, "little")
        + b"\x00" * 16
    )
    return bytes(header) + bytes(body)


def test_real_decode_feature_parity(spark):
    """Feature values (not just plumbing) verified against numpy on real
    uncompressed image bytes: PPM and BMP decode must reproduce the exact
    source pixels, so mean/std/phash match a driver-side recompute."""
    import numpy as np

    rng = np.random.default_rng(3)
    px = {
        1: rng.integers(0, 256, size=(11, 7, 3), dtype=np.uint8),
        2: rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8),
        3: rng.integers(0, 256, size=(9, 13, 3), dtype=np.uint8),
    }
    content = {
        1: _encode_ppm(px[1]),
        2: _encode_bmp(px[2], bpp=24),
        3: _encode_bmp(px[3], bpp=32),
    }
    rows = [
        (aid, "image", content[aid], (None, None, None, None, None, "real"))
        for aid in px
    ]
    assets = spark.createDataFrame(rows, MM.ASSETS_DDL)

    decoded = {r.asset_id: r for r in MM.decode_images(assets).collect()}
    for aid, want in px.items():
        got = np.frombuffer(decoded[aid].pixels, dtype=np.uint8).reshape(
            decoded[aid].height, decoded[aid].width, decoded[aid].channels
        )
        # BMP 32-bpp decodes to RGB (alpha dropped); shapes+values exact
        assert got.shape == want.shape
        assert np.array_equal(got, want), aid

    feats = {r.asset_id: r for r in
             MM.image_features(MM.decode_images(assets)).collect()}
    for aid, want in px.items():
        f = feats[aid]
        pf = want.astype(np.float64)
        assert f.mean_r == pytest.approx(pf[:, :, 0].mean())
        assert f.mean_g == pytest.approx(pf[:, :, 1].mean())
        assert f.mean_b == pytest.approx(pf[:, :, 2].mean())
        gray = pf.mean(axis=2)
        assert f.std_gray == pytest.approx(gray.std())
        h, w = want.shape[:2]
        yi = np.arange(8) * h // 8
        xi = np.arange(8) * w // 8
        small = gray[yi][:, xi]
        bits = (small > small.mean()).flatten()
        assert f.phash == f"{int(''.join('1' if b else '0' for b in bits), 2):016x}"


def test_real_wav_decode_closed_form(spark):
    """PCM16 WAV built in-test decodes for real: a full-scale square wave
    at sr/2 has RMS ~= 1.0 and a zero crossing at every sample boundary —
    closed-form values no fake could produce."""
    import io
    import wave

    import numpy as np

    def wav_bytes(samples_i16, sr=8000, ch=1):
        buf = io.BytesIO()
        with wave.open(buf, "wb") as w:
            w.setnchannels(ch)
            w.setsampwidth(2)
            w.setframerate(sr)
            w.writeframes(samples_i16.tobytes())
        return buf.getvalue()

    n = 1000
    square = (np.tile([32767, -32767], n // 2)).astype("<i2")
    silence = np.zeros(n, dtype="<i2")
    stereo = np.ravel(
        np.column_stack([square, square])
    ).astype("<i2")  # same signal both channels -> mono mixdown identical
    assets = spark.createDataFrame(
        [
            (1, "audio", bytearray(wav_bytes(square)), None),
            (2, "audio", bytearray(wav_bytes(silence)), None),
            (3, "audio", bytearray(wav_bytes(stereo, ch=2)), None),
        ],
        "asset_id long, kind string, content binary, "
        "meta struct<height:int,width:int,channels:int,sample_rate:int>",
    )
    from text_extensions_for_pandas_spark.operators.multimodal import (
        audio_features,
    )

    rows = {r.asset_id: r for r in audio_features(assets).collect()}
    assert rows[1].n_samples == n and rows[1].sample_rate == 8000
    assert abs(rows[1].rms - 1.0) < 1e-3
    assert rows[1].zero_crossings == n - 1
    assert rows[2].rms == 0.0 and rows[2].zero_crossings == 0
    # stereo mixdown: identical channels -> identical mono stats
    assert abs(rows[3].rms - rows[1].rms) < 1e-6
    assert rows[3].n_samples == n


# ---------------------------------------------------------------------------
# embed_images: the bridge into the ANN/SemDeDup tiers
# ---------------------------------------------------------------------------

def test_fallback_embed_is_normalized_smooth_and_separating():
    """The deterministic fallback encoder's contract: unit-norm output,
    near-identical images land at cosine ~1, unrelated patterns land
    well below, a flat image gets a fixed unit vector."""
    import numpy as np

    from text_extensions_for_pandas_spark.operators.multimodal import (
        _fallback_embed_py,
    )

    def rng_px(key):
        p = np.arange(256)
        # the key*p cross term decorrelates patterns ACROSS keys; without
        # it two keys differ by a constant, which mean-centering removes
        vals = (key * 2654435761 + p * 40503 + key * p * 97) % 248
        return np.repeat(vals.astype(np.uint8), 3).reshape(16, 16, 3)

    a = _fallback_embed_py(rng_px(1), 64, 8)
    assert abs(np.linalg.norm(a) - 1.0) < 1e-9
    # +2 brightness + one perturbed pixel is still the "same" image
    near = rng_px(1).astype(np.int64) + 2
    near[0, 0, :] += 40
    b = _fallback_embed_py(near.clip(0, 255).astype(np.uint8), 64, 8)
    assert float(a @ b) > 0.9
    # a different base pattern is far
    c = _fallback_embed_py(rng_px(2), 64, 8)
    assert float(a @ c) < 0.7
    # flat image: deterministic fallback basis vector
    flat = _fallback_embed_py(np.full((16, 16, 3), 128, np.uint8), 64, 8)
    assert flat[0] == 1.0 and np.linalg.norm(flat) == 1.0
    # determinism across calls (cached projection)
    assert np.array_equal(a, _fallback_embed_py(rng_px(1), 64, 8))


def test_embed_images_feeds_semantic_dedup(spark):
    """End-to-end: decode -> embed_images -> semantic_dedup clusters the
    image near-dups via the ANN tier (embedding cosine), not phash."""
    import numpy as np
    import pandas as pd

    from text_extensions_for_pandas_spark.operators import multimodal as MM
    from text_extensions_for_pandas_spark.operators import similarity as SIM
    from pyspark.sql import functions as F

    header = b"P6\n16 16\n255\n"

    def _gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                key, v = i // 2, i % 2  # pairs of near-dups
                p = np.arange(256, dtype=np.int64)
                base = (key * 2654435761 + p * 40503 + key * p * 97) % 248
                px = np.repeat((base + v).astype(np.uint8), 3).tobytes()
                rows.append(
                    (i, "image", header + px,
                     (16, 16, 3, None, None, "image/x-portable-pixmap"))
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "content", "meta"]
            )

    assets = spark.range(8).mapInPandas(_gen, schema=MM.ASSETS_DDL)
    embs = MM.embed_images(MM.decode_images(assets))
    rows = embs.collect()
    assert len(rows) == 8 and all(len(r.embedding) == 64 for r in rows)
    cents = embs.filter(F.col("asset_id") % 2 == 0).select(
        F.col("asset_id").alias("centroid_id"), "embedding"
    )
    out = {
        r.asset_id: r
        for r in SIM.semantic_dedup(
            embs, cents, threshold=0.8, id_col="asset_id"
        ).collect()
    }
    for i in range(8):
        assert out[i].component == (i // 2) * 2
        assert out[i].cluster_size == 2
        assert out[i].keep == (i % 2 == 0)


def test_embed_images_feeds_ivf_ann_search(spark):
    """Images flow through the full ANN search tier: decode ->
    embed_images -> ivf_assign -> ivf_topk retrieves each image's
    near-duplicate twin as its nearest non-self neighbor."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import functions as F

    from text_extensions_for_pandas_spark.operators import multimodal as MM
    from text_extensions_for_pandas_spark.operators.similarity import (
        ivf_assign,
        ivf_topk,
    )

    header = b"P6\n16 16\n255\n"

    def _gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                key, v = i // 2, i % 2  # pairs: 2k and 2k+1 are twins
                p = np.arange(256, dtype=np.int64)
                base = (key * 2654435761 + p * 40503 + key * p * 97) % 248
                px = np.repeat((base + v).astype(np.uint8), 3).tobytes()
                rows.append(
                    (i, "image", header + px,
                     (16, 16, 3, None, None, "image/x-portable-pixmap"))
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "content", "meta"]
            )

    assets = spark.range(12).mapInPandas(_gen, schema=MM.ASSETS_DDL)
    embs = MM.embed_images(MM.decode_images(assets)).withColumnRenamed(
        "asset_id", "vec_id"
    )
    cents = embs.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    assigned = ivf_assign(embs, cents)
    # sanity: each twin pair shares its even member's cluster
    assign_map = dict(
        (r.vec_id, r.cluster_id)
        for r in assigned.select("vec_id", "cluster_id").collect()
    )
    assert all(assign_map[i] == (i // 2) * 2 for i in range(12))
    hits = ivf_topk(assigned, cents, queries=embs, k=2, nprobe=2)
    # ivf_topk excludes self: rank 1 is each image's nearest neighbor,
    # which must be its twin (cosine ~1 vs ~0.27 cross-pair)
    best = {r.query_id: r.neighbor_id for r in hits.collect() if r.rank == 1}
    for i in range(12):
        twin = i + 1 if i % 2 == 0 else i - 1
        assert best[i] == twin, (i, best.get(i))


def test_fused_embed_matches_two_stage_path(spark):
    """embed_image_assets (fused decode+embed, no pixel buffers in the
    plan) is bit-identical to decode_images -> embed_images."""
    import numpy as np
    import pandas as pd

    from text_extensions_for_pandas_spark.operators import multimodal as MM

    header = b"P6\n16 16\n255\n"

    def _gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                p = np.arange(256, dtype=np.int64)
                base = (i * 2654435761 + p * 40503 + i * p * 97) % 248
                px = np.repeat(base.astype(np.uint8), 3).tobytes()
                rows.append(
                    (i, "image", header + px,
                     (16, 16, 3, None, None, "image/x-portable-pixmap"))
                )
            yield pd.DataFrame(
                rows, columns=["asset_id", "kind", "content", "meta"]
            )

    assets = spark.range(10).mapInPandas(_gen, schema=MM.ASSETS_DDL)
    fused = {
        r.asset_id: r.embedding
        for r in MM.embed_image_assets(assets).collect()
    }
    staged = {
        r.asset_id: r.embedding
        for r in MM.embed_images(MM.decode_images(assets)).collect()
    }
    assert fused == staged and len(fused) == 10
    # non-image assets are excluded, like decode_images
    mixed = assets.unionByName(
        spark.createDataFrame(
            [(999, "audio", b"\x00\x01", (None,) * 5 + ("pcm",))],
            MM.ASSETS_DDL,
        )
    )
    assert 999 not in {
        r.asset_id for r in MM.embed_image_assets(mixed).collect()
    }


def _encode_wav(samples, sr=8000):
    """16-bit mono PCM WAV bytes from float samples in [-1, 1]."""
    import io
    import wave

    import numpy as np

    pcm = (np.clip(samples, -1, 1) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes(pcm.tobytes())
    return buf.getvalue()


def test_embed_audio_assets_near_dups_cluster(spark):
    """Audio flows through the same semantic dedup tier: re-leveled
    copies of the same clip (x0.9 amplitude) land at cosine ~1 and
    cluster; different-frequency clips separate.  Real WAV decode, no
    fake path."""
    import numpy as np

    from text_extensions_for_pandas_spark.operators import multimodal as MM
    from text_extensions_for_pandas_spark.operators import similarity as SIM
    from text_extensions_for_pandas_spark.operators.multimodal import (
        _fallback_embed_audio_py,
    )
    from pyspark.sql import functions as F

    t = np.arange(8000) / 8000.0
    rows = []
    for i in range(8):
        key, v = i // 2, i % 2
        # distinct tone mixes per pair; variant = slight re-level
        wave_f = (
            np.sin(2 * np.pi * (220 + 110 * key) * t)
            + 0.5 * np.sin(2 * np.pi * (500 + 70 * key) * t)
        ) * (1.0 - 0.1 * v)
        rows.append(
            (i, "audio", _encode_wav(wave_f),
             (None, None, None, 8000, None, "audio/wav"))
        )
    assets = spark.createDataFrame(rows, MM.ASSETS_DDL)
    embs = MM.embed_audio_assets(assets)
    got = {r.asset_id: np.array(r.embedding) for r in embs.collect()}
    assert len(got) == 8 and all(len(v) == 64 for v in got.values())
    for i in range(0, 8, 2):
        assert float(got[i] @ got[i + 1]) > 0.9, i
    assert float(got[0] @ got[2]) < 0.8
    # driver-side reference agrees with the island
    samples, _ = MM._decode_audio_bytes(rows[0][2], None)
    ref = _fallback_embed_audio_py(samples, 64, 32)
    assert np.allclose(ref, got[0])

    # full tier: semantic_dedup groups the pairs
    vecs = embs.withColumnRenamed("asset_id", "vec_id")
    cents = vecs.filter(F.col("vec_id") % 2 == 0).select(
        F.col("vec_id").alias("centroid_id"), "embedding"
    )
    out = {
        r.vec_id: r
        for r in SIM.semantic_dedup(
            vecs, cents, threshold=0.85, id_col="vec_id"
        ).collect()
    }
    for i in range(8):
        assert out[i].component == (i // 2) * 2
        assert out[i].keep == (i % 2 == 0)
