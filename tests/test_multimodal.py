"""Multimodal stages: resize, features, phash near-dups, frame-sample."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cola_spark.codecs import decode_image, encode_jpgq
from cola_spark.codecs.pixels import gen_pixels
from cola_spark.operators.multimodal import (
    encode_vidf,
    frame_sample,
    image_features,
    phash_near_dup_pairs,
    resize_images,
    resize_nn,
)
from cola_spark.sources import gen_images


@pytest.fixture(scope="module")
def images(spark):
    return gen_images(spark, 16).cache()


def test_resize_roundtrip(spark, images):
    out = resize_images(images, 8, 8).collect()
    assert len(out) == 16
    for r in out:
        px = decode_image(bytes(r.bytes), "png")
        assert px.shape == (8, 8, 3)
    # resize of a known image matches numpy reference
    r0 = sorted(out, key=lambda r: r.image_id)[0]
    src = [x for x in images.collect() if x.image_id == r0.image_id][0]
    truth = resize_nn(decode_image(bytes(src.bytes), src.fmt), 8, 8)
    assert np.array_equal(decode_image(bytes(r0.bytes), "png"), truth)


def test_image_features_deterministic(spark, images):
    a = {r.image_id: tuple(r)[1:] for r in image_features(images).collect()}
    b = {r.image_id: tuple(r)[1:] for r in image_features(images).collect()}
    assert a == b
    assert all(v[2] >= 0 for v in a.values())  # mean luma scaled int


def test_phash_near_dups_finds_lossy_twin(spark, images):
    """A jpgq re-encode of an image is a near-dup of the original."""
    feats = image_features(images)
    twins = feats.select(
        F.concat(F.lit("twin_"), "image_id").alias("image_id"), "w", "h",
        "mean_luma_x1000", "std_luma_x1000", "phash",
    )
    # recompute phash on a quantized copy for one image: do it properly
    # through the dataframe path: union features of re-encoded images
    import pandas as pd

    src = images.limit(4).collect()
    rows = []
    for r in src:
        px = decode_image(bytes(r.bytes), r.fmt)
        rows.append((f"twin_{r.image_id}", encode_jpgq(px), "jpgq"))
    twins_df = image_features(
        images.sparkSession.createDataFrame(rows, "image_id string, bytes binary, fmt string")
    )
    allf = feats.unionByName(twins_df)
    pairs = {(r.img_a, r.img_b) for r in phash_near_dup_pairs(allf, max_hamming=6).collect()}
    for r in src:
        assert (r.image_id, f"twin_{r.image_id}") in pairs


def test_frame_sample(spark):
    frames = [encode_jpgq(gen_pixels(f"f{i}", 16, 16)) for i in range(7)]
    vid = encode_vidf(frames)
    df = spark.createDataFrame([("v1", bytearray(vid))], "video_id string, bytes binary")
    out = frame_sample(df, every_n=2).orderBy("frame_no").collect()
    assert [r.frame_no for r in out] == [0, 2, 4, 6]
    px = decode_image(bytes(out[1].bytes), out[1].fmt)
    assert px.shape == (16, 16, 3)


def test_frame_sample_bad_container(spark):
    df = spark.createDataFrame([("bad", bytearray(b"nope"))], "video_id string, bytes binary")
    with pytest.raises(Exception):
        frame_sample(df).collect()


def test_image_corpus_clean_matches_local_oracle(spark):
    """The image-side cleaning composition (exact byte dedup -> pHash
    keep-set -> luma quality gate -> per-format stats) equals its
    sequential pure-Python recomputation exactly, dtypes included."""
    import pandas as pd

    from cola_spark.queries import LOCAL_ORACLES, PAIRS

    got = PAIRS["image_corpus_clean"][0](spark, "unused").toPandas()
    want = LOCAL_ORACLES["image_corpus_clean"](spark, "unused")
    cols = sorted(got.columns)
    got = got[cols].sort_values(cols).reset_index(drop=True)
    want = want[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=True)
    # the composition is non-degenerate: both formats survive and the
    # injected duplicates plus pHash-identical twins were dropped
    assert set(want["fmt"]) == {"png", "jpgq"}
    assert int(want["n_images"].sum()) < 64


def test_caption_consolidate_semantics(spark):
    """Hand graph: {1,2,3} one image cluster (rep 1), {7,9} another
    (rep 7), 5 a singleton. Everyone gets the representative's caption;
    is_rep marks exactly the minimum member / singleton."""
    from cola_spark.operators.multimodal import caption_consolidate

    docs = spark.createDataFrame(
        [(i, f"cap{i}") for i in (1, 2, 3, 5, 7, 9)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: (r.cluster_id, r.is_rep, r.canon_caption)
        for r in caption_consolidate(docs, pairs).collect()
    }
    assert out == {
        1: (1, True, "cap1"),
        2: (1, False, "cap1"),
        3: (1, False, "cap1"),
        5: (5, True, "cap5"),
        7: (7, True, "cap7"),
        9: (7, False, "cap7"),
    }


# ------------------------------------------------------------------ audio


def test_wavf_roundtrip_and_gated_codecs():
    from cola_spark.codecs import decode_audio, encode_audio, gen_samples

    s = gen_samples("aud00000007", 1600, 8000)
    blob = encode_audio(s, 8000, "wavf")
    s2, sr = decode_audio(blob, "wavf")
    assert sr == 8000 and (s2 == s).all(), "WAVF must roundtrip bit-exact"
    with pytest.raises(NotImplementedError):
        encode_audio(s, 8000, "mp3")
    with pytest.raises(NotImplementedError):
        decode_audio(blob, "opus")
    with pytest.raises(ValueError):
        decode_audio(b"JUNKDATA", "wavf")


def test_audio_features_deterministic(spark):
    from cola_spark.operators.multimodal import audio_features
    from cola_spark.sources import gen_audio

    a = audio_features(gen_audio(spark, 16, parts=2)).orderBy("audio_id").collect()
    b = audio_features(gen_audio(spark, 16, parts=5)).orderBy("audio_id").collect()
    assert a == b, "features must not depend on partitioning"
    r = a[0]
    assert r.duration_ms == r.n_samples * 1000 // r.sample_rate
    assert 0 < r.rms_x1000 < 1000 and 0 < r.zero_crossings < r.n_samples


def test_audio_resample_halves_and_preserves_energy(spark):
    from cola_spark.operators.multimodal import audio_features, audio_resample
    from cola_spark.sources import gen_audio

    src = gen_audio(spark, 8)
    down = audio_resample(src, 4000)
    feats = {r.audio_id: r for r in audio_features(down).collect()}
    orig = {r.audio_id: r for r in audio_features(src).collect()}
    for aid, o in orig.items():
        d = feats[aid]
        assert d.sample_rate == 4000
        assert d.n_samples == o.n_samples * 4000 // o.sample_rate
        # NN resample keeps the envelope: RMS within 15%
        assert abs(d.rms_x1000 - o.rms_x1000) <= max(15, o.rms_x1000 * 0.15)


def test_caption_consolidate_longest_strategy(spark):
    """strategy='longest': canonical = max-length caption, ties to the
    smaller id; is_rep still marks the min-id member; bad strategy
    raises."""
    from cola_spark.operators.multimodal import caption_consolidate

    docs = spark.createDataFrame(
        [(1, "short"), (2, "the longest caption"), (3, "mid one"),
         (5, "solo"), (7, "same len"), (9, "same len")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "doc_a long, doc_b long"
    )
    out = {
        r.doc_id: (r.cluster_id, r.is_rep, r.canon_caption)
        for r in caption_consolidate(docs, pairs, strategy="longest").collect()
    }
    assert out == {
        1: (1, True, "the longest caption"),
        2: (1, False, "the longest caption"),
        3: (1, False, "the longest caption"),
        5: (5, True, "solo"),
        7: (7, True, "same len"),  # tie -> smaller id (7) wins
        9: (7, False, "same len"),
    }
    with pytest.raises(ValueError):
        caption_consolidate(docs, pairs, strategy="median").collect()


def test_sniff_format_magics_and_lies(spark):
    """Real container magics sniff correctly from raw bytes (incl. the
    two-probe RIFF/WEBP rule); truncated/garbage bytes -> unknown; the
    planted declared-format lies are exactly the mismatch rows."""
    from cola_spark.operators.multimodal import sniff_format
    from cola_spark.queries import q_magic_sniff_gate
    import pyspark.sql.functions as F  # noqa: N812

    samples = [
        ("png", bytes.fromhex("89504E47") + b"rest"),
        ("jpeg", bytes.fromhex("FFD8FF") + b"\xe0body"),
        ("gif", b"GIF8" + b"9a..."),
        ("webp", b"RIFF" + b"\x00\x00\x00\x00" + b"WEBP" + b"vp8 "),
        ("unknown", b"RIFF" + b"\x00\x00\x00\x00" + b"WAVE" + b"data"),
        ("unknown", b"\x00\x01"),
        ("unknown", b""),
    ]
    df = spark.createDataFrame(
        [(i, exp, bs) for i, (exp, bs) in enumerate(samples)],
        "i long, exp string, bytes binary",
    )
    got = df.select("exp", sniff_format(df).alias("s")).collect()
    assert all(r.exp == r.s for r in got)

    rows = q_magic_sniff_gate(spark, "/root/testdata/sf0.001").collect()
    # every payload is a real container: sniff never says unknown, and
    # mismatch rows are exactly the lie-planted fifth
    assert all(r.sniffed_fmt != "unknown" for r in rows)
    assert 0.10 < sum(r.mismatch for r in rows) / len(rows) < 0.30
    assert all(
        (r.declared_fmt != r.sniffed_fmt) == r.mismatch for r in rows
    )


def test_phash_keep_best_resolution_rule(spark):
    """Exactly one keep per cluster; the kept member has the max pixel
    count, ties to the smaller doc_id; singletons keep themselves."""
    from cola_spark.queries import q_phash_keep_best_resolution

    rows = q_phash_keep_best_resolution(
        spark, "/root/testdata/sf0.001"
    ).collect()
    per = {}
    for r in rows:
        per.setdefault(r.cluster_id, []).append(r)
    multi = 0
    for cid, members in per.items():
        kept = [m for m in members if m.keep]
        assert len(kept) == 1
        best = min(members, key=lambda m: (-m.px, m.doc_id))
        assert kept[0].doc_id == best.doc_id
        if len(members) > 1:
            multi += 1
    assert multi > 0  # planted clusters exist
