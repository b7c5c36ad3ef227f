"""Multimodal binary-column plumbing: schema, Arrow batch shapes, 1->N frame
explosion, feature vectors feeding similarity search. Decode itself is a
deterministic stub (no codecs in-sandbox, multimodal.decode_payload raises)."""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from visigoth_spark import multimodal as M
from visigoth_spark.corpus import generate_corpus


@pytest.fixture(scope="module")
def bin_df(spark):
    pdf = generate_corpus(80)
    pdf = pdf.reset_index().rename(columns={"index": "doc_id"})
    return spark.createDataFrame(pdf[["doc_id", "html"]]).withColumnRenamed(
        "html", "payload"
    )


def test_real_decoder_is_explicit_stub():
    with pytest.raises(NotImplementedError):
        M.decode_payload(b"\x89PNG...", "image")


def test_image_meta_schema_and_values(spark, bin_df):
    out = M.image_meta(bin_df).collect()
    assert len(out) == 80
    pdf = generate_corpus(80)
    by_id = {r["doc_id"]: r for r in out}
    for i, b in enumerate(pdf["html"]):
        w, h, c, br = M.stub_meta(b)
        r = by_id[i]
        assert (r["width"], r["height"], r["channels"]) == (w, h, c)
        assert r["brightness"] == pytest.approx(br)
        assert 16 <= r["width"] < 1040 and 1 <= r["channels"] <= 4


def test_none_payload_is_safe(spark):
    df = spark.createDataFrame([(0, None), (1, b"x")],
                               "doc_id long, payload binary")
    rows = M.image_meta(df).orderBy("doc_id").collect()
    assert len(rows) == 2
    assert rows[0]["width"] == M.stub_meta(b"")[0]


def test_features_are_unit_norm_and_deterministic(spark, bin_df):
    out = {r["doc_id"]: r["features"]
           for r in M.image_features(bin_df).collect()}
    assert len(out) == 80 and all(len(v) == M.FEAT_DIM for v in out.values())
    for v in list(out.values())[:5]:
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)
    out2 = {r["doc_id"]: r["features"]
            for r in M.image_features(bin_df).collect()}
    assert out == out2


def test_features_feed_similarity_search(spark, bin_df):
    from visigoth_spark.pipeline import cosine_topk

    feats = M.image_features(bin_df).withColumnRenamed(
        "features", "embedding").withColumnRenamed("doc_id", "vec_id")
    q = feats.filter("vec_id = 3").collect()[0]["embedding"]
    top = cosine_topk(feats, list(q), k=5).collect()
    assert top[0]["vec_id"] == 3  # self is nearest
    assert top[0]["sim"] == pytest.approx(1.0, abs=1e-6)


def test_frame_sample_explodes_and_caps(spark, bin_df):
    rows = M.frame_sample(bin_df, every_n=4, max_frames=8).collect()
    pdf = generate_corpus(80)
    by_id: dict[int, list] = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append(r)
    for i, b in enumerate(pdf["html"]):
        n_frames = 1 + len(b) % 64
        exp = list(range(0, n_frames, 4))[:8]
        got = sorted(r["frame_id"] for r in by_id[i])
        assert got == exp, i
        for r in by_id[i]:
            want = hashlib.md5(
                bytes(b) + int(r["frame_id"]).to_bytes(4, "little")
            ).hexdigest()
            assert r["frame_fp"] == want


def test_resize_meta_is_pure_catalyst(spark, bin_df):
    meta = M.image_meta(bin_df)
    out = M.resize_meta(meta, target=256).collect()
    for r in out:
        assert max(r["out_width"], r["out_height"]) <= 256
        ar_in = r["width"] / r["height"]
        ar_out = r["out_width"] / r["out_height"]
        assert ar_out == pytest.approx(ar_in, rel=0.05)
