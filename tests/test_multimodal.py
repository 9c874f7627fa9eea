"""Multimodal plumbing tests: opaque binary columns + Arrow-batched decode
stubs (real codec gated behind NotImplementedError, SURVEY.md §7.6)."""

import pytest
from pyspark.sql import functions as F

from seraster_spark import multimodal as M


@pytest.fixture(scope="module")
def media(spark):
    return M.fake_media_df(spark, n=48).cache()


def test_media_schema(spark, media):
    assert media.count() == 48
    assert dict(media.dtypes)["payload"] == "binary"
    kinds = {r[0] for r in media.select("media_type").distinct().collect()}
    assert kinds == {"image", "audio", "video"}


def test_image_features_deterministic(spark, media):
    a = M.image_features(media, out_dim=32).toPandas().set_index("media_ref")
    b = M.image_features(media, out_dim=32).toPandas().set_index("media_ref")
    assert len(a) == media.filter(F.col("media_type") == "image").count()
    for ref in a.index:
        assert list(a.loc[ref, "feat"]) == list(b.loc[ref, "feat"])
        assert len(a.loc[ref, "feat"]) == 32
        assert all(0.0 <= v < 1.0 for v in a.loc[ref, "feat"])
    assert (a["out_width"] == 64).all()


def test_real_decoder_gated(spark, media):
    with pytest.raises(NotImplementedError):
        M.image_features(media, decoder="pil")
    with pytest.raises(NotImplementedError):
        M.frame_sample(media, decoder="ffmpeg")


def test_frame_sample_fanout(spark, media):
    frames = M.frame_sample(media, every_ms=1000, out_dim=16).toPandas()
    vids = media.filter(F.col("media_type") == "video").select(
        "media_ref", "duration_ms"
    ).toPandas()
    exp_counts = {
        r.media_ref: max(1, int(r.duration_ms) // 1000) for r in vids.itertuples()
    }
    got_counts = frames.groupby("media_ref").size().to_dict()
    assert got_counts == exp_counts
    # frame features differ across frames of the same video
    g = frames[frames["media_ref"] == vids.iloc[0]["media_ref"]]
    if len(g) > 1:
        assert list(g.iloc[0]["frame_feat"]) != list(g.iloc[1]["frame_feat"])


def test_resolve_media_preserves_span_order(spark, docs, media):
    resolved = M.resolve_media(docs, media)
    assert resolved.filter(F.col("media_ref") == "").count() == 0
    # per-doc offsets strictly increasing when re-sorted
    pdf = resolved.orderBy("doc_id", "offset").toPandas()
    for _, grp in pdf.groupby("doc_id"):
        offs = list(grp["offset"])
        assert offs == sorted(offs) and len(set(offs)) == len(offs)
