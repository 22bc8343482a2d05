"""Multimodal payload plumbing tests (decode stub + real Spark stages)."""

import random

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.multimodal import (
    PAYLOAD_SCHEMA,
    decode_png_stub,
    decode_stub,
    extract_features,
    payload_size_stats,
    phash_near_dups,
    psnr,
    validate_payloads,
)
from crawler_spark.sources.fixtures import payload_bytes


@pytest.fixture(scope="module")
def payload(spark):
    rng = random.Random(7)
    rows = []
    for i in range(12):
        prng = random.Random(1000 + i)
        rows.append(
            (f"img{i}", payload_bytes(prng, 4, 4), 4, 4, "png", f"cap {i}", prng.getrandbits(63))
        )
    # a near-dup phash pair: img20's phash = img0's with 2 bits flipped
    prng = random.Random(1000)
    payload_bytes(prng, 4, 4)  # consume the same entropy the fixture did
    ph0 = prng.getrandbits(63)
    rows.append(("img20", payload_bytes(random.Random(2000), 4, 4), 4, 4, "png", "cap 20", ph0 ^ 0b101))
    return spark.createDataFrame(rows, PAYLOAD_SCHEMA)


def test_png_stub_roundtrip():
    rng = random.Random(5)
    data = payload_bytes(rng, 6, 3)
    px = decode_png_stub(data, "png")
    assert len(px) == 3 and len(px[0]) == 6 and len(px[0][0]) == 3
    assert all(0 <= c <= 255 for row in px for p in row for c in p)
    # deterministic: decoding twice gives identical pixels
    assert px == decode_png_stub(data, "png")


def test_decode_stub_raises():
    with pytest.raises(NotImplementedError):
        decode_stub(b"", "jpeg")


def test_psnr_identical_is_inf():
    rng = random.Random(5)
    px = decode_png_stub(payload_bytes(rng, 4, 4), "png")
    assert psnr(px, px) == float("inf")


def test_extract_features(payload):
    feats = extract_features(payload, decoder=decode_png_stub)
    rows = {r["image_id"]: r for r in feats.collect()}
    assert len(rows) == 13
    r0 = rows["img0"]
    assert r0["w"] == 4 and r0["h"] == 4
    assert len(r0["mean_px"]) == 3 and all(0 <= m <= 255 for m in r0["mean_px"])
    # mean matches a direct decode
    px = decode_png_stub(payload.where("image_id='img0'").first()["bytes"], "png")
    want = [sum(p[c] for row in px for p in row) // 16 for c in range(3)]
    assert list(r0["mean_px"]) == want


def test_payload_size_stats(payload):
    s = payload_size_stats(payload).collect()
    assert len(s) == 1 and s[0]["fmt"] == "png" and s[0]["n"] == 13


def test_phash_near_dups(payload):
    pairs = phash_near_dups(payload, radius=6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("img0", "img20") in got


def test_validate_payloads_pass_and_fail(payload, spark):
    ok = validate_payloads(payload, payload, decoder=decode_png_stub)
    rows = ok.collect()
    assert len(rows) == 13 and all(r["passed"] for r in rows)
    # corrupt a caption → that row fails on caption equality
    bad = payload.withColumn(
        "caption", F.when(F.col("image_id") == "img3", F.lit("WRONG")).otherwise(F.col("caption"))
    )
    rows = {r["image_id"]: r for r in validate_payloads(payload, bad, decoder=decode_png_stub).collect()}
    assert not rows["img3"]["passed"] and not rows["img3"]["caption_ok"]
    assert rows["img1"]["passed"]


def test_encode_decode_roundtrip():
    from crawler_spark.operators.multimodal import encode_png_stub

    rng = random.Random(11)
    px = decode_png_stub(payload_bytes(rng, 5, 4), "png")
    assert decode_png_stub(encode_png_stub(px), "png") == px


def test_resize_images(spark, payload):
    from crawler_spark.operators.multimodal import encode_png_stub, resize_images

    out = resize_images(payload, 2, 2, decoder=decode_png_stub).collect()
    assert len(out) == 13
    by_id = {r["image_id"]: r for r in out}
    r0 = by_id["img0"]
    assert (r0["w"], r0["h"], r0["fmt"]) == (2, 2, "png")
    # nearest-neighbour with floor mapping: 4x4 -> 2x2 picks (0,0) (0,2) (2,0) (2,2)
    src = decode_png_stub(payload_bytes(random.Random(1000), 4, 4), "png")
    got = decode_png_stub(bytes(r0["bytes"]), "png")
    assert got == [[src[0][0], src[0][2]], [src[2][0], src[2][2]]]
    # metadata passthrough
    assert r0["caption"] == "cap 0"
    # identity-size resize keeps pixels exactly (PSNR = inf)
    same = resize_images(payload, 4, 4, decoder=decode_png_stub)
    v = validate_payloads(same, payload, decoder=decode_png_stub).collect()
    assert all(r["passed"] for r in v)


def test_sample_frames(spark):
    from crawler_spark.operators.multimodal import sample_frames

    vids = spark.createDataFrame(
        [("v1", 10), ("v2", 3), ("v3", 1)], "image_id string, n_frames int"
    )
    got = {
        (r["image_id"], r["frame_idx"])
        for r in sample_frames(vids, stride=4).collect()
    }
    assert got == {("v1", 0), ("v1", 4), ("v1", 8), ("v2", 0), ("v3", 0)}
    # pure column plan: no Python stage in the explain output
    plan = sample_frames(vids, stride=4)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_image_quality_filter(spark):
    from crawler_spark.operators.multimodal import image_quality_filter

    rows = [
        # (image_id, w, h, n_bytes, caption) — one row per verdict branch
        ("keep", 640, 480, 64_000, "a fine caption of adequate length"),
        ("narrow", 32, 480, 64_000, "a fine caption of adequate length"),
        ("short", 640, 32, 64_000, "a fine caption of adequate length"),
        ("aspect", 2000, 100, 64_000, "a fine caption of adequate length"),
        ("blank", 640, 480, 10, "a fine caption of adequate length"),
        ("corrupt", 64, 64, 100_000, "a fine caption of adequate length"),
        ("nocap", 640, 480, 64_000, "  hi  "),
        ("nullcap", 640, 480, 64_000, None),
    ]
    df = spark.createDataFrame(
        [(i, bytearray(b"\0" * min(nb, 1)) * nb, w, h, "png", c, 0) for i, w, h, nb, c in rows],
        "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    got = {r["image_id"]: r for r in image_quality_filter(df).collect()}
    assert got["keep"]["verdict"] == "keep"
    assert got["narrow"]["verdict"] == "too_narrow"
    assert got["short"]["verdict"] == "too_short"
    assert got["aspect"]["verdict"] == "extreme_aspect"
    assert got["blank"]["verdict"] == "low_entropy"
    assert got["corrupt"]["verdict"] == "suspicious_size"
    assert got["nocap"]["verdict"] == "caption_too_short"
    assert got["nocap"]["caption_len"] == 2  # trimmed
    assert got["nullcap"]["verdict"] == "caption_too_short"  # NULL rejects
    # first-match precedence: a row failing several rules reports the first
    assert got["narrow"]["w"] == 32
    # integer bpp survives exactly: 64000 / (640*480) * 1e4 = 2083.33… → 2083
    assert got["keep"]["bpp_e4"] == 2083
    # metadata-only: the plan never sends bytes through Python
    plan = image_quality_filter(df)._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan and "ArrowEval" not in plan


def test_canonical_image_corpus_pipeline(spark):
    """plans/corpus.canonical_image_corpus: every stage must bite —
    the quality gate drops a row BEFORE it can form a phash pair, the
    caption dedup keeps only the best copy, the clustering keeps the
    min-id member of a Hamming-≤6 cluster."""
    from crawler_spark.plans.corpus import canonical_image_corpus

    blob = bytearray(b"x" * 5000)
    rows = [
        # (id, bytes, w, h, caption, phash)
        (1, blob, 100, 100, "Sunset One", 0xF0F0F0F0),      # loses caption dedup to 2
        (2, blob, 200, 200, "sunset one", 0),               # caption winner; cluster rep
        (3, blob, 8, 100, "tiny image row", 1),             # gate-rejected (too_narrow)
        #   ^ phash 1 is within Hamming 1 of row 2 — must NOT pair (gated out first)
        (4, blob, 100, 100, "fourth caption", 3),           # clusters with 2 (Hamming 2) → dropped
        (5, blob, 100, 100, "fifth caption", 0xFFFF0000),   # untouched survivor
    ]
    payload = spark.createDataFrame(
        [(i, bytes(b), w, h, "png", c, p) for i, b, w, h, c, p in rows],
        "image_id long, bytes binary, w int, h int, fmt string, caption string, phash long",
    )
    got = {r["image_id"]: r for r in canonical_image_corpus(payload).collect()}
    assert set(got) == {2, 5}
    assert got[2]["caption_key"] == "sunset one"
    assert got[2]["px"] == 40_000
    assert got[5]["caption_key"] == "fifth caption"

    # Plan shape: the quality gate is a FILTER on the scan (not a
    # verdict-ids join) and the caption winner rides out of the argmax
    # aggregation directly (not a winner-ids semi-join) — the final-keep
    # plan carries exactly ONE join: the |pairs|-scale drop anti-join.
    plan = (
        canonical_image_corpus(payload)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Join") == 1, plan

    # pin_survivors: identical output; the handle releases the cache
    pinned = canonical_image_corpus(payload, pin_survivors=True)
    got2 = {r["image_id"]: r for r in pinned.collect()}
    assert got2.keys() == got.keys()
    assert got2[2]["px"] == got[2]["px"]
    assert pinned.pinned_survivors.is_cached
    pinned.pinned_survivors.unpersist()
    assert not pinned.pinned_survivors.is_cached


def test_image_quality_null_dims(spark):
    """NULL or non-positive w/h must REJECT (bad_dims), not slip through
    the CASE into keep (NULL comparisons are NULL, so every other branch
    is skipped for missing metadata) — ADVICE r3."""
    from crawler_spark.operators.multimodal import image_quality_filter

    df = spark.createDataFrame(
        [
            ("null_w", None, 480, "a fine caption of adequate length"),
            ("null_h", 640, None, "a fine caption of adequate length"),
            ("zero_w", 0, 480, "a fine caption of adequate length"),
            ("neg_h", 640, -3, "a fine caption of adequate length"),
            ("fine", 640, 480, "a fine caption of adequate length"),
        ],
        "image_id string, w int, h int, caption string",
    ).withColumn("bytes", F.encode(F.lit("x" * 64), "utf-8").cast("binary"))
    got = {r["image_id"]: r["verdict"] for r in image_quality_filter(df).collect()}
    assert got["null_w"] == "bad_dims"
    assert got["null_h"] == "bad_dims"
    assert got["zero_w"] == "bad_dims"
    assert got["neg_h"] == "bad_dims"
    assert got["fine"] != "bad_dims"


def test_caption_dedup_null_px(spark):
    """A NULL-dim copy must NOT win the argmax: struct-min sorts NULL
    fields first, so without the px coalesce the broken copy would beat
    every real resolution (and diverge from a SQL oracle's ORDER BY px
    DESC NULLS LAST) — ADVICE r3."""
    from crawler_spark.operators.multimodal import caption_dedup_best

    df = spark.createDataFrame(
        [
            ("img_nulldim", None, None, "sunset"),
            ("img_real", 200, 200, "sunset"),
            # all-copies-null group: falls back to px=0, id tie-break
            ("img_n2", None, 5, "beach"),
            ("img_n1", 5, None, "beach"),
        ],
        "image_id string, w int, h int, caption string",
    )
    got = {r["caption_key"]: r for r in caption_dedup_best(df).collect()}
    assert got["sunset"]["keep_image_id"] == "img_real"
    assert got["sunset"]["keep_pixels"] == 40_000
    assert got["beach"]["keep_image_id"] == "img_n1"  # id tie-break at px=0
    assert got["beach"]["keep_pixels"] == 0


def test_caption_dedup_best(spark):
    from crawler_spark.operators.multimodal import caption_dedup_best

    df = spark.createDataFrame(
        [
            # "Sunset" ×3: img_b wins on pixels
            ("img_a", 100, 100, " Sunset "),
            ("img_b", 200, 200, "sunset"),
            ("img_c", 150, 150, "SUNSET"),
            # pixel tie: img_a2 < img_z2 lexically → img_a2 wins
            ("img_z2", 50, 50, "beach"),
            ("img_a2", 50, 50, "beach"),
            # singleton passes through
            ("img_solo", 10, 20, "mountain"),
        ],
        "image_id string, w int, h int, caption string",
    )
    got = {r["caption_key"]: r for r in caption_dedup_best(df).collect()}
    assert set(got) == {"sunset", "beach", "mountain"}
    assert got["sunset"]["keep_image_id"] == "img_b"
    assert got["sunset"]["n_copies"] == 3
    assert got["sunset"]["keep_pixels"] == 40_000
    assert got["beach"]["keep_image_id"] == "img_a2"  # deterministic tie-break
    assert got["mountain"]["n_copies"] == 1
    # single partial-aggregated groupBy: the argmax combines map-side
    # (partial_min over the struct), exactly one shuffle, no Window
    plan = caption_dedup_best(df)._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan
    assert plan.count("Exchange") == 1
    assert "Window(" not in plan
