import pyarrow as pa
import pytest
import ray.data

from knowledge_graph_creation_from_text_with_llms_ray.stages import multimodal


def _docs(n=12):
    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(n), pa.int64()),
                "text": pa.array([f"document {i}" for i in range(n)], pa.string()),
            }
        )
    )


def test_attach_payloads_schema():
    media = multimodal.attach_fake_payloads(_docs())
    rows = media.take_all()
    assert len(rows) == 12
    for r in rows:
        assert isinstance(r["payload"], bytes) and len(r["payload"]) == 256
        assert r["media_type"] in ("image", "audio", "video")
        assert r["width"] >= 64 and r["height"] >= 64


def test_decode_drops_payload_adds_feature():
    media = multimodal.attach_fake_payloads(_docs())
    decoded = multimodal.decode_features(media, concurrency=1).take_all()
    for r in decoded:
        assert "payload" not in r
        assert len(r["feature"]) == multimodal.FEATURE_DIM
    # deterministic: same payload → same feature
    again = multimodal.decode_features(
        multimodal.attach_fake_payloads(_docs()), concurrency=1
    ).take_all()
    f1 = {r["media_id"]: list(r["feature"]) for r in decoded}
    f2 = {r["media_id"]: list(r["feature"]) for r in again}
    assert f1 == f2


def test_strict_decode_raises_without_codec_libs():
    try:
        import PIL  # noqa: F401

        pytest.skip("PIL present; stub path not exercised")
    except ImportError:
        pass
    media = multimodal.attach_fake_payloads(_docs(3))
    with pytest.raises(Exception) as exc_info:
        multimodal.decode_features(media, concurrency=1, strict=True).take_all()
    assert "NotImplementedError" in str(exc_info.value) or isinstance(
        exc_info.value, NotImplementedError
    )


def test_frame_sample_only_videos():
    media = multimodal.attach_fake_payloads(_docs(12))
    frames = multimodal.frame_sample(media, every_nth=8).take_all()
    media_rows = {r["media_id"]: r for r in media.take_all()}
    for r in frames:
        src = media_rows[r["media_id"]]
        assert src["media_type"] == "video"
        assert r["frame_index"] % 8 == 0
        assert r["frame_index"] < src["n_frames"]
    video_ids = {i for i, r in media_rows.items() if r["media_type"] == "video"}
    assert {r["media_id"] for r in frames} == video_ids


def test_resize_plan_aspect_math():
    """Fit-within-box plan: landscape, portrait, and already-fits rows;
    integer floor division, aspect preserved."""
    import pyarrow as pa
    import ray.data

    from knowledge_graph_creation_from_text_with_llms_ray.stages import multimodal

    rows = pa.table(
        {
            "media_id": pa.array([1, 2, 3], pa.int64()),
            "width": pa.array([640, 100, 200], pa.int32()),   # landscape, portrait, fits
            "height": pa.array([360, 500, 224], pa.int32()),
        }
    )
    out = {
        r["media_id"]: (r["new_width"], r["new_height"])
        for r in multimodal.resize_plan(
            ray.data.from_arrow(rows), max_w=224, max_h=224
        ).take_all()
    }
    assert out[1] == (224, 360 * 224 // 640)  # width-limited
    assert out[2] == (100 * 224 // 500, 224)  # height-limited
    assert out[3] == (200, 224)               # already fits: untouched
