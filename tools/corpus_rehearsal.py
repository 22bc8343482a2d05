"""Image-corpus scale rehearsal: the composed canonical_image_corpus
pipeline (quality gate → caption best-copy dedup → phash clustering →
canonical corpus) at ~10^7 images — the image analog of
tools/dedup_rehearsal.py. Verifies the composition's plan shapes hold at
a corpus the sandbox E2E tests never reach:

  * quality gate — pure JVM CASE; bytes only reach octet_length;
  * caption dedup — ONE partial-aggregated struct-min groupBy;
  * phash pairs — pigeonhole-blocked Hamming join (uniform hashes ⇒
    bucket sizes ~1 even at 10^7 rows; never all-pairs);
  * clustering — O(log d) label propagation, storage flat per round.

Input: a deterministic arithmetic corpus (no external data, no pixels).
Images come in triples (group g = id/3, member m = id%3) with planted
structure so EVERY stage bites and the end state is exactly computable:

  * m0: w=160 (biggest px), caption capA(g)=md5, phash = xxhash64(g);
  * m1: w=96, same caption capA(g), phash 2 bits away — EXCEPT groups
    g%17==3 where w=16 (quality gate rejects: too_narrow);
  * m2: w=96, unique caption capB(g), phash = xxhash64(g)^1 (Hamming 1)
    — EXCEPT groups g%13==5 where caption="x" (caption_too_short).

Expected flow per clean triple: gate keeps all → caption dedup drops m1
(m0 wins by px) → phash pairs (m0,m2) at radius 1 → cluster keeps min id
m0. A g%17 group loses m1 at the gate instead; a g%13 group loses m2 at
the gate and yields no pair. EVERY group therefore yields exactly one
canonical image: m0. Radius 1 (not the operator default 6) keeps the
planted separation exact: with uniform 64-bit phashes the chance any two
of ~3M group hashes land within Hamming 1 is ~2e-5 at 10^7 docs, so the
pair/cluster/canonical counts assert EXACTLY; min_bpp=0 because the
synthetic byte column is a 16-byte md5 digest, not real pixels.

On top of the triples, ``--blanks B`` (default n/10) plants the
duplicate class that dominates real image corpora: B extra rows sharing
ONE phash value (-1, ≥28 bits from every xxhash64 triple hash) with
unique captions — blank frames / boilerplate thumbnails. They survive
the gate and caption dedup, then must collapse to ONE canonical (the
min id). This is exactly the shape the GROUP-reduced clustering path
exists for: member-pair expansion of a B-clique is B(B-1)/2 hamming-0
pairs (5*10^11 at B=10^6 — structurally impossible), while the group
graph carries one node and zero edges, and membership alone routes the
clique to its representative. tools/cluster_skew_probe.py measures the
member-pair plan's quadratic growth directly at small B.

Prints ONE JSON line. Usage:
  python tools/corpus_rehearsal.py --smoke     # 3*10^5 images, ~1 min
  python tools/corpus_rehearsal.py             # ~10^7 images
  python tools/corpus_rehearsal.py --blanks 0  # triples only (pre-r4 shape)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from tools.dedup_rehearsal import max_stage_shuffle_mb  # noqa: E402

QUALITY_KWARGS = dict(min_bpp=0.0)
RADIUS = 1


def build_payload(spark, n_images: int, n_blanks: int = 0):
    """Deterministic triple-structured image+caption payload
    (BASELINE.json input_hint shape: image_id, bytes, w, h, fmt,
    caption, phash), plus ``n_blanks`` equal-phash blank-frame rows
    (ids [n_images, n_images+n_blanks), phash -1, unique captions).
    All synthesis is JVM column expressions."""
    if n_blanks:
        blank_ids = spark.range(n_images, n_images + n_blanks)
        blanks = blank_ids.select(
            F.col("id").alias("image_id"),
            F.to_binary(
                F.md5(F.concat(F.lit("px"), F.col("id").cast("string"))),
                F.lit("hex"),
            ).alias("bytes"),
            F.lit(96).alias("w"),
            F.lit(96).alias("h"),
            F.lit("png").alias("fmt"),
            F.md5(F.concat(F.lit("blankcap"), F.col("id").cast("string"))).alias("caption"),
            F.lit(-1).cast("long").alias("phash"),
        )
        return build_payload(spark, n_images).unionByName(blanks)
    ids = spark.range(n_images)
    g = (F.col("id") / 3).cast("long")
    m = F.col("id") % 3
    gs = g.cast("string")
    base_ph = F.xxhash64(F.concat(F.lit("ph"), gs))
    phash = (
        F.when(m == 1, base_ph.bitwiseXOR(F.lit(6)))
        .when(m == 2, base_ph.bitwiseXOR(F.lit(1)))
        .otherwise(base_ph)
    )
    cap_a = F.md5(F.concat(F.lit("capA"), gs))
    cap_b = F.md5(F.concat(F.lit("capB"), gs))
    caption = (
        F.when((m == 2) & (g % 13 == 5), F.lit("x"))
        .when(m == 2, cap_b)
        .otherwise(cap_a)
    )
    w = (
        F.when((m == 1) & (g % 17 == 3), F.lit(16))
        .when(m == 0, F.lit(160))
        .otherwise(F.lit(96))
    )
    return ids.select(
        F.col("id").alias("image_id"),
        F.to_binary(F.md5(F.concat(F.lit("px"), F.col("id").cast("string"))),
                    F.lit("hex")).alias("bytes"),
        w.cast("int").alias("w"),
        F.lit(96).alias("h"),
        F.lit("png").alias("fmt"),
        caption.alias("caption"),
        phash.alias("phash"),
    )


def run(spark, n_images: int, n_blanks: int = 0) -> dict:
    from crawler_spark.operators.multimodal import image_quality_filter
    from crawler_spark.plans.corpus import canonical_image_corpus

    n_images -= n_images % 3  # whole triples keep the arithmetic exact
    groups = n_images // 3
    c17 = len(range(3, groups, 17))  # gate-rejected m1 copies
    c13 = len(range(5, groups, 13))  # gate-rejected m2 captions

    payload = build_payload(spark, n_images, n_blanks).persist()
    n = payload.count()
    assert n == n_images + n_blanks

    t0 = time.time()
    verdicts = dict(
        image_quality_filter(payload, **QUALITY_KWARGS)
        .groupBy("verdict").count().collect()
    )
    wall_gate = time.time() - t0
    assert verdicts.get("too_narrow", 0) == c17, (verdicts, c17)
    assert verdicts.get("caption_too_short", 0) == c13, (verdicts, c13)
    assert verdicts["keep"] == n - c17 - c13, verdicts

    t1 = time.time()
    kept = canonical_image_corpus(
        payload, radius=RADIUS, quality_kwargs=QUALITY_KWARGS
    ).persist()
    n_canonical = kept.count()
    wall_pipeline = time.time() - t1
    # every group yields exactly its m0, regardless of which plant hit
    # it; the whole blank-frame clique collapses to its min id
    want = groups + (1 if n_blanks else 0)
    assert n_canonical == want, (n_canonical, want)
    bad = kept.where(
        ~(
            ((F.col("image_id") < n_images) & (F.col("image_id") % 3 == 0))
            | (F.col("image_id") == n_images)
        )
    ).count()
    assert bad == 0, f"{bad} canonical rows are neither triple heads nor the blank representative"

    kept.unpersist()
    payload.unpersist()
    return dict(
        n_images=n,
        n_blanks=n_blanks,
        n_groups=groups,
        gate_rejects=c17 + c13,
        wall_gate_s=round(wall_gate, 1),
        wall_pipeline_s=round(wall_pipeline, 1),
        n_canonical=n_canonical,
        images_per_sec=round(n / wall_pipeline),
        max_stage_shuffle_write_mb=max_stage_shuffle_mb(spark),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=9_999_999)
    ap.add_argument("--blanks", type=int, default=-1,
                    help="equal-phash blank-frame rows planted on top of "
                         "the triples (-1 = images/10; 0 = pre-r4 shape)")
    ap.add_argument("--smoke", action="store_true", help="3*10^5 images")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from crawler_spark.session import get_spark

    spark = get_spark(
        app_name="corpus-rehearsal",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(32, args.cpus * 2),
    )
    n = 300_000 if args.smoke else args.images
    blanks = n // 10 if args.blanks < 0 else args.blanks
    print(json.dumps(run(spark, n, blanks)))


if __name__ == "__main__":
    main()
