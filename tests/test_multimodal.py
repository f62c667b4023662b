"""Multimodal plumbing: schema, batch shape, determinism, metadata
pruning. Codec is the deterministic fake (real codecs unavailable —
the Spark-side dataflow is what's under test)."""

import pytest

from ocr_intern_spark.operators.multimodal import (
    DeterministicFakeCodec,
    MediaCodec,
    filter_by_meta,
    image_features,
    sample_video_frames,
    synth_media_table,
)


def test_real_codec_is_stubbed():
    c = MediaCodec()
    with pytest.raises(NotImplementedError):
        c.decode_image(b"x")
    with pytest.raises(NotImplementedError):
        c.sample_frames(b"x", 2)


def test_image_features_schema_and_determinism(spark):
    media = synth_media_table(spark, 20)
    out = image_features(media, resize_to=4)
    assert out.schema.simpleString() == (
        "struct<media_id:string,kind:string,feature:array<float>,"
        "out_width:int,out_height:int>"
    )
    a = {r["media_id"]: r["feature"] for r in out.collect()}
    b = {r["media_id"]: r["feature"] for r in image_features(
        synth_media_table(spark, 20), resize_to=4).collect()}
    assert a == b
    assert all(len(v) == 16 for v in a.values())
    assert len(a) == 20


def test_frame_sampling(spark):
    media = synth_media_table(spark, 12)
    frames = sample_video_frames(media, frames_per_video=3).collect()
    by_media = {}
    for r in frames:
        by_media.setdefault(r["media_id"], []).append(r["frame_idx"])
    assert all(sorted(v) == list(range(len(v))) for v in by_media.values())
    # deterministic shas
    again = sample_video_frames(synth_media_table(spark, 12), frames_per_video=3).collect()
    assert {(r["media_id"], r["frame_idx"], r["frame_sha"]) for r in frames} == {
        (r["media_id"], r["frame_idx"], r["frame_sha"]) for r in again}


def test_meta_filter_native_and_pruned(spark, tmp_path):
    path = str(tmp_path / "media.parquet")
    synth_media_table(spark, 40).write.parquet(path)
    media = spark.read.parquet(path)
    imgs = filter_by_meta(media, "image/", min_pixels=1)
    got = imgs.select("media_id", "meta.mime").collect()
    assert len(got) == 20  # png + jpeg = 2 of 4 mimes
    assert all(r["mime"].startswith("image/") for r in got)
    # payload must be pruned out of the parquet scan when only
    # metadata is selected (ReadSchema excludes it)
    physical = (
        imgs.select("media_id", "meta.mime")
        ._jdf.queryExecution().executedPlan().toString()
    )
    import re
    read_schema = re.search(r"ReadSchema: ([^\n]*)", physical)
    assert read_schema and "payload" not in read_schema.group(1), physical


def _ref_ahash(payload: bytes, codec, grid: int = 8) -> int:
    """Independent aHash recompute: plain Python ints over the decoded
    array — no numpy reductions shared with the operator."""
    img = codec.decode_image(payload)
    h, w = len(img), len(img[0])
    gray = [[int(img[y][x][0]) + int(img[y][x][1]) + int(img[y][x][2])
             for x in range(w)] for y in range(h)]
    total_sum = sum(sum(row) for row in gray)
    total_px = h * w
    import numpy as np
    ys = np.linspace(0, h, grid + 1, dtype=int)
    xs = np.linspace(0, w, grid + 1, dtype=int)
    code = 0
    for i in range(grid):
        for j in range(grid):
            cs, n = 0, 0
            for y in range(ys[i], ys[i + 1]):
                for x in range(xs[j], xs[j + 1]):
                    cs += gray[y][x]
                    n += 1
            code = (code << 1) | int(cs * total_px > total_sum * n)
    # signed view of the uint64 bit-string, as the operator emits
    return code - (1 << 64) if code >= (1 << 63) else code


def test_image_ahash_matches_reference_and_dedups(spark):
    from ocr_intern_spark.operators.multimodal import (
        ChainedFakeCodec,
        image_ahash,
    )

    codec = ChainedFakeCodec()
    media = synth_media_table(spark, 24)
    got = {r["media_id"]: r["ahash"]
           for r in image_ahash(media, codec=codec).collect()}
    rows = media.select("media_id", "payload").collect()
    assert len(got) == 24
    for r in rows:
        assert got[r["media_id"]] == _ref_ahash(bytes(r["payload"]), codec), r["media_id"]
    # equal payloads MUST collide (the dedup certificate's forward
    # direction): two ids sharing payload bytes share the code
    import hashlib as _h
    by_payload = {}
    for r in rows:
        by_payload.setdefault(_h.md5(bytes(r["payload"])).hexdigest(), set()).add(
            got[r["media_id"]]
        )
    assert all(len(v) == 1 for v in by_payload.values())


def test_chained_codec_entropy_beats_tiled():
    """The tiled fake collapses aHash entropy (periodic pixels); the
    chained fake must keep 200 distinct payloads collision-free."""
    from ocr_intern_spark.operators.multimodal import ChainedFakeCodec

    chained = ChainedFakeCodec()
    payloads = [f"payload-{i:04d}".encode() for i in range(200)]
    codes = {_ref_ahash(p, chained) for p in payloads}
    assert len(codes) == 200
