import hashlib

import pytest

from loudml_spark.pipeline.multimodal import (
    extract_features,
    fake_media_table,
    frame_sample,
)


@pytest.fixture(scope="module")
def media(spark):
    docs = spark.createDataFrame(
        [(0, "an image doc"), (1, "an audio doc"), (2, "a video document x"),
         (5, "video two with a longer body for frames")],
        "doc_id long, text string",
    )
    return fake_media_table(docs)


def test_media_schema(media):
    assert dict(media.dtypes)["content"] == "binary"
    types = {r["media_id"]: r["media_type"] for r in media.collect()}
    assert types == {0: "image", 1: "audio", 2: "video", 5: "video"}


def test_extract_features_fake(media):
    out = {r["media_id"]: r for r in
           extract_features(media, use_fake_decoder=True).collect()}
    expect = hashlib.sha256(b"an image doc").hexdigest()
    assert out[0]["sha256"] == expect
    assert out[0]["n_bytes"] == len(b"an image doc")
    assert out[0]["decoded"] is True
    assert 0 < out[0]["byte_mean"] < 255


def test_extract_features_real_decode_is_explicit(media):
    with pytest.raises(Exception, match="use_fake_decoder"):
        extract_features(media).collect()


def test_frame_sample(media):
    frames = frame_sample(media, every_ms=100,
                          use_fake_decoder=True).collect()
    assert frames, "video rows must yield frames"
    by_media = {r["media_id"] for r in frames}
    assert by_media <= {2, 5}
    f0 = [r for r in frames if r["media_id"] == 5][0]
    assert isinstance(f0["frame"], (bytes, bytearray))
    assert f0["ts_ms"] == f0["frame_idx"] * 100


def test_resize_images_fake(media):
    from loudml_spark.pipeline.multimodal import resize_images

    out = resize_images(media, 8, 4, use_fake_decoder=True).collect()
    assert len(out) > 0
    for r in out:
        assert (r["width"], r["height"]) == (8, 4)
        assert len(r["resized"]) == 32  # width*height under the cap
    # only image-typed media rows pass through
    src_images = media.filter("media_type = 'image'").count()
    assert len(out) == src_images
    # deterministic across runs
    again = resize_images(media, 8, 4, use_fake_decoder=True).collect()
    assert sorted(r["media_id"] for r in out) == \
        sorted(r["media_id"] for r in again)


def test_resize_images_real_decode_is_explicit(media):
    import pytest
    from loudml_spark.pipeline.multimodal import resize_images

    with pytest.raises(Exception) as e:
        resize_images(media, 8, 4).collect()
    assert "PIL" in str(e.value)
    with pytest.raises(ValueError):
        resize_images(media, 0, 4, use_fake_decoder=True)


def test_audio_windows_fake(media):
    from loudml_spark.pipeline.multimodal import audio_windows

    out = audio_windows(
        media, window_ms=40, hop_ms=20, use_fake_decoder=True,
    ).collect()
    assert len(out) > 0
    by_id = {}
    for r in out:
        by_id.setdefault(r["media_id"], []).append(r)
        assert isinstance(r["pcm"], (bytes, bytearray)) and len(r["pcm"]) > 0
        assert r["start_ms"] == r["window_idx"] * 20
        assert 0.0 <= r["rms"] <= 255.0
    # overlap math: a track of duration d yields 1 + (d-40)//20
    # windows (capped); verify against the fake metadata
    metas = {r["media_id"]: r["meta"]["duration_ms"]
             for r in media.filter("media_type = 'audio'").collect()}
    for mid, rows in by_id.items():
        want = min(1 + (metas[mid] - 40) // 20, 64)
        assert len(rows) == want, mid
    # audio-only rows; short tracks (< window) emit nothing
    assert set(by_id) == {m for m, d in metas.items() if d >= 40}
    # deterministic
    again = audio_windows(
        media, window_ms=40, hop_ms=20, use_fake_decoder=True,
    ).collect()
    assert sorted((r["media_id"], r["window_idx"], bytes(r["pcm"]))
                  for r in out) == \
        sorted((r["media_id"], r["window_idx"], bytes(r["pcm"]))
               for r in again)


def test_audio_windows_gating_and_validation(media):
    import pytest
    from loudml_spark.pipeline.multimodal import audio_windows

    with pytest.raises(Exception) as e:
        audio_windows(media).collect()
    assert "librosa" in str(e.value)
    with pytest.raises(ValueError):
        audio_windows(media, window_ms=0, use_fake_decoder=True)
    with pytest.raises(ValueError):
        audio_windows(media, hop_ms=0, use_fake_decoder=True)


class TestDhash:
    def test_gated_codec_contract(self, spark):
        from loudml_spark.pipeline.multimodal import (
            dhash_images, fake_media_table)
        import pytest as _pytest

        docs = spark.createDataFrame(
            [(0, "hello world")], "doc_id long, text string")
        media = fake_media_table(docs)
        with _pytest.raises(Exception) as ei:
            dhash_images(media).collect()
        assert "PIL" in str(ei.value)

    def test_grid_validation(self, spark):
        from loudml_spark.pipeline.multimodal import dhash_images
        import pytest as _pytest

        df = spark.createDataFrame([], "media_id long, media_type string,"
                                   " content binary")
        with _pytest.raises(ValueError, match="grid"):
            dhash_images(df, use_fake_decoder=True, grid=9)

    def test_near_dups_found_distinct_not(self, spark):
        """The acceptance property: re-encoded (byte-perturbed) and
        slightly-shifted copies of a seeded image land within the
        Hamming gate; unrelated images do not."""
        import random

        from loudml_spark.pipeline.dedup import hamming_pairs_blocked
        from loudml_spark.pipeline.multimodal import dhash_images

        rng = random.Random(5)
        base = bytes(rng.randrange(256) for _ in range(1200))
        noisy = bytearray(base)
        for i in (17, 300, 601, 850, 990):
            noisy[i] = (noisy[i] + 7) % 256
        shifted = base[:100] + b"z" + base[100:]
        others = [bytes(rng.randrange(256) for _ in range(1200))
                  for _ in range(5)]
        rows = ([(0, "image", base), (1, "image", bytes(noisy)),
                 (2, "image", shifted),
                 (3, "audio", base)]           # non-image: filtered
                + [(10 + i, "image", o) for i, o in enumerate(others)])
        media = spark.createDataFrame(
            rows, "media_id long, media_type string, content binary")
        hashes = dhash_images(media, use_fake_decoder=True)
        assert hashes.count() == 8            # audio row dropped
        pairs = {(r["id_a"], r["id_b"]): r["hamming"]
                 for r in hamming_pairs_blocked(
                     hashes, hash_col="dhash", id_col="media_id",
                     bits=64, max_distance=10).collect()}
        assert (0, 1) in pairs and pairs[(0, 1)] <= 2   # re-encode
        assert (0, 2) in pairs                           # small shift
        assert all(a < 10 and b < 10 for a, b in pairs), pairs

    def test_signed_int64_and_python_parity(self, spark):
        """Spark-side hashes equal the shared Python core bit-for-bit
        (including fingerprints with bit 63 set → negative int64)."""
        import random

        from loudml_spark.pipeline.multimodal import (
            dhash_bytes, dhash_images)

        rng = random.Random(1)
        blobs = [bytes(rng.randrange(256) for _ in range(400))
                 for _ in range(40)]
        media = spark.createDataFrame(
            [(i, "image", b) for i, b in enumerate(blobs)],
            "media_id long, media_type string, content binary")
        got = {r["media_id"]: r["dhash"]
               for r in dhash_images(
                   media, use_fake_decoder=True).collect()}
        want = {i: dhash_bytes(b) for i, b in enumerate(blobs)}
        assert got == want
        assert any(v < 0 for v in want.values())
