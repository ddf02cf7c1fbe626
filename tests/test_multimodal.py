"""Multimodal-column plumbing tests: binary payloads + typed metadata,
mapInPandas decode stub, frame-sample planning (SURVEY.md §2.10)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tcga_query_project_spark.operators import multimodal


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (1, "image", bytes(range(256)), "image/png", 16, 16, None, None),
        (2, "image", b"\x00" * 64, "image/png", 8, 8, None, None),
        (3, "audio", bytes([7, 7, 7, 255]), "audio/wav", None, None, 16000, 2.5),
        (4, "video", b"\xff" * 128, "video/mp4", 320, 240, None, 3.2),
    ]
    return spark.createDataFrame(rows, multimodal.MEDIA_SCHEMA)


def test_extract_features_deterministic(spark, media):
    out = {r["media_id"]: r for r in multimodal.extract_features(media, dim=32).collect()}
    assert set(out) == {1, 2, 3, 4}
    # all-zero payload → histogram mass entirely in bucket 0, tiled
    f2 = out[2]["feature"]
    assert len(f2) == 32
    assert f2[0] == 1.0 and f2[16] == 1.0 and sum(f2[1:16]) == 0.0
    # uniform byte payload (0..255) → 1/16 per bucket
    f1 = np.array(out[1]["feature"])
    assert np.allclose(f1, 1 / 16, atol=1e-6)
    assert out[1]["n_bytes"] == 256
    # schema honored: float32 array, bigint bytes
    schema = dict(
        (f.name, f.dataType.simpleString())
        for f in multimodal.extract_features(media).schema.fields
    )
    assert schema["feature"] == "array<float>"
    assert schema["n_bytes"] == "bigint"


def test_extract_features_batch_iterator_contract(spark, media):
    # many partitions → several Arrow batches; row count preserved
    out = multimodal.extract_features(media.repartition(3), dim=8)
    assert out.count() == 4


def test_frame_sample_plan(spark, media):
    plan = multimodal.frame_sample_plan(media, every_s=1.0).collect()
    # only the video row plans frames: duration 3.2s → frames at 0,1,2
    assert {r["media_id"] for r in plan} == {4}
    assert sorted(r["frame_ts"] for r in plan) == [0.0, 1.0, 2.0]


def test_metadata_profile_prunes_payload(spark, media, tmp_path):
    # written as parquet, the profile plan must not read the payload col
    path = str(tmp_path / "media")
    media.write.parquet(path)
    scan = spark.read.parquet(path)
    prof = multimodal.metadata_profile(scan)
    plan = prof.queryExecution if hasattr(prof, "queryExecution") else None
    explained = prof._jdf.queryExecution().executedPlan().toString()
    assert "payload" not in explained, "payload column must be pruned from the scan"
    rows = {r["kind"]: r for r in prof.collect()}
    assert rows["image"]["n_items"] == 2
    assert rows["image"]["mean_pixels"] == (256 + 64) / 2
    assert rows["audio"]["mean_duration_s"] == 2.5


def test_resize_images_rewrites_payload_and_metadata(spark, media):
    out = {
        r["media_id"]: r
        for r in multimodal.resize_images(media, 4, 4).collect()
    }
    # image rows: payload resized to exactly w*h bytes, metadata updated
    assert len(out[1]["payload"]) == 16
    assert out[1]["payload"] == bytes(range(16))  # truncation of 0..255
    assert (out[1]["width"], out[1]["height"]) == (4, 4)
    # short payload tiles up to the target size
    assert len(out[2]["payload"]) == 16
    # non-image rows pass through untouched
    assert out[3]["payload"] == bytes([7, 7, 7, 255])
    assert out[3]["width"] is None
    assert out[4]["payload"] == b"\xff" * 128
    assert (out[4]["width"], out[4]["height"]) == (320, 240)


def test_decode_frames_covers_plan_exactly(spark, media):
    plan = multimodal.frame_sample_plan(media, every_s=1.0)
    out = multimodal.decode_frames(plan, media, dim=16).collect()
    # one feature row per planned frame, nothing else
    planned = {(r["media_id"], r["frame_ts"]) for r in plan.collect()}
    got = {(r["media_id"], r["frame_ts"]) for r in out}
    assert got == planned and len(out) == len(planned)
    # deterministic, fixed-dim, and ts-dependent (rotation changes the
    # histogram only when the payload isn't constant; media 4 is 0xff*128
    # so its frames agree — assert dim + determinism instead)
    for r in out:
        assert len(r["feature"]) == 16
    again = multimodal.decode_frames(plan, media, dim=16).collect()
    assert sorted(map(str, out)) == sorted(map(str, again))
