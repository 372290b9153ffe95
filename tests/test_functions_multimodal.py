"""Scalar SQL functions vs numpy kernels; multimodal plumbing."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdftabextract_spark import functions as FX
from pdftabextract_spark.kernels import geom as GK
from pdftabextract_spark.kernels.png import encode_png
from pdftabextract_spark.operators import multimodal as MM


def test_scalar_functions_match_kernels(spark):
    rng = np.random.RandomState(3)
    rows = []
    for i in range(200):
        al, at = rng.rand(2) * 100
        ar, ab = al + rng.rand() * 50 + 0.1, at + rng.rand() * 50 + 0.1
        bl, bt = rng.rand(2) * 100
        br, bb = bl + rng.rand() * 50 + 0.1, bt + rng.rand() * 50 + 0.1
        rows.append((i, float(al), float(at), float(ar), float(ab),
                     float(bl), float(bt), float(br), float(bb)))
    df = spark.createDataFrame(rows, "id long, al double, at double, ar double, "
                                     "ab double, bl double, bt double, br double, bb double")
    got = df.select(
        "id",
        FX.rect_intersect("al", "at", "ar", "ab", "bl", "bt", "br", "bb", norm="b").alias("ix"),
        FX.rect_center_dist("al", "at", "ar", "ab", "bl", "bt", "br", "bb").alias("cd"),
        FX.interval_overlap("al", "ar", "bl", "br").alias("ov"),
    ).collect()
    for r, row in zip(sorted(got, key=lambda x: x["id"]), rows):
        _, al, at, ar, ab, bl, bt, br, bb = row
        a = GK.rect(GK.pt(al, at), GK.pt(ar, ab))
        b = GK.rect(GK.pt(bl, bt), GK.pt(br, bb))
        expect = GK.rectintersect(a, b, norm_intersect_area="b")
        if expect is None:
            assert r["ix"] is None
        else:
            assert abs(r["ix"] - expect) < 1e-12
        assert abs(r["cd"] - GK.rectcenter_dist(a, b)) < 1e-9
        assert r["ov"] == GK.overlap(al, ar, bl, br)


def test_rel_levenshtein(spark):
    df = spark.createDataFrame(
        [("kitten", "sitting"), ("", ""), ("abc", "abc")], "a string, b string")
    got = [r["rl"] for r in df.select(FX.rel_levenshtein("a", "b").alias("rl")).collect()]
    assert got[0] == 3 / 7
    assert got[1] == 0.0
    assert got[2] == 0.0


def test_probe_and_features_and_resize(spark):
    rng = np.random.RandomState(1)
    imgs = {f"m{i}": rng.randint(0, 256, (20 + i, 30 + i), dtype=np.uint8)
            for i in range(3)}
    media = spark.createDataFrame(
        [(k, bytearray(encode_png(v))) for k, v in imgs.items()],
        "media_ref string, bytes binary")

    meta = {r["media_ref"]: r for r in MM.probe_media(media).collect()}
    for k, v in imgs.items():
        assert meta[k]["codec"] == "png"
        assert (meta[k]["width"], meta[k]["height"]) == (v.shape[1], v.shape[0])

    feats = {r["media_ref"]: r for r in MM.image_features(media).collect()}
    for k, v in imgs.items():
        assert abs(feats[k]["mean"] - v.mean()) < 1e-9
        assert abs(feats[k]["std"] - v.std()) < 1e-9

    small = {r["media_ref"]: bytes(r["bytes"])
             for r in MM.resize_images(media, 10, 8).collect()}
    from pdftabextract_spark.kernels.png import decode_png
    for k in imgs:
        assert decode_png(small[k + "#rs"]).shape == (8, 10)


def test_sample_frames_is_stubbed(spark):
    media = spark.createDataFrame([("v1", bytearray(b"\x00\x01"))],
                                  "media_ref string, bytes binary")
    with pytest.raises(Exception) as exc:
        MM.sample_frames(media).collect()
    assert "NotImplementedError" in str(exc.value) or "codec" in str(exc.value)


def test_fake_decoder_plumbing(spark):
    media = spark.createDataFrame(
        [("x1", bytearray(b"\x10" * 100)), ("x2", bytearray(b"\xf0" * 64))],
        "media_ref string, bytes binary")
    feats = {r["media_ref"]: r for r in
             MM.image_features(media, decoder=MM.fake_decode).collect()}
    assert feats["x1"]["mean"] == 16.0
    assert feats["x2"]["mean"] == 240.0
