"""The end-to-end image-corpus pipeline a training-data user actually
runs: raw image+caption payload → metadata quality gate → best-copy
caption dedup → perceptual-hash near-dup clustering → canonical corpus.

This is the composition face of the individual operators (each of which
is oracle-checked standalone): the reference's serial analog is the
fetch handler chain that gates bodies by size/type and folds each new
fingerprint into its nearest BK-tree cluster one document at a time
(/root/reference/crawler.go:35-49 config gates;
/root/reference/sample/fingerprint + sample/bktree controller); here
every stage is a distributed batch operator over the
BASELINE.json input_hint payload shape
(image_id, bytes, w, h, fmt, caption, phash).

Scale story (all stages inherit their operators' plans):
  * quality gate — pure JVM column CASE applied as a filter on the
    scan (zero exchanges; bytes only reach octet_length);
  * caption dedup — ONE partial-aggregated groupBy whose widened
    struct-min argmax emits the winner row itself (no winner-ids join
    back against the corpus);
  * phash pairs — pigeonhole-blocked Hamming join, never all-pairs,
    consumed in GROUP-reduced form (one node per distinct hash value);
  * clustering — O(log d) label propagation over the group graph, one
    generation of checkpoint blocks live at a time (state/ckpt.py
    release); members attach by one corpus-scale join at the end, so
    exact-dup cliques never expand to O(clique²) pairs;
  * final keep — one anti-join against the pinned drop set.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_image_corpus(
    payload: DataFrame,
    *,
    radius: int = 6,
    quality_kwargs: dict | None = None,
    pin_survivors: bool = False,
) -> DataFrame:
    """Canonical (kept) rows of an image+caption corpus.

    Stages: (1) reject rows failing the metadata quality gate
    (image_quality_filter verdict != 'keep'); (2) keep only the best
    copy per exact caption (caption_dedup_best winners); (3) cluster
    the survivors' perceptual hashes at Hamming ≤ ``radius`` and keep
    the minimum-id member per cluster (canonical_docs_grouped over the
    group-reduced Hamming join — identical output to the member-pair
    composition, proven by tests/test_components.py).

    Returns (image_id, caption_key, px) — one row per canonical image.
    Deterministic; every tie-break is by image_id. ``image_id`` must be
    integral (the clustering stage labels nodes by id — a string-keyed
    corpus should carry a surrogate long id, e.g. ``xxhash64(image_id)``
    checked for collisions or a dense id from the ingest path).
    """
    from crawler_spark.operators.components import canonical_docs_grouped
    from crawler_spark.operators.dedup import simhash_group_pairs
    from crawler_spark.operators.multimodal import image_quality_verdict

    # The gate verdict is a row-local CASE, so gating is a FILTER on the
    # scan — not the verdict-ids semi-join back against payload it would
    # naively be (that join shuffles the whole corpus against itself;
    # the filter costs zero exchanges and pushes into the source).
    gate = image_quality_verdict(**(quality_kwargs or {}))
    gated = payload.where(gate == "keep")

    # Best copy per caption as ONE widened argmax aggregation: every
    # column the downstream stages need (image_id, phash, w, h) rides
    # inside the min-struct, so the winner ROW comes out of the groupBy
    # directly — no winner-ids semi-join back against the corpus (that
    # join re-shuffles every gated row; the agg moves one ~40-byte
    # struct per (partition, distinct caption) after map-side combine).
    # Same semantics as caption_dedup_best: max pixels, ties by
    # image_id; the unique image_id field makes trailing struct fields
    # comparison-inert, so the argmax stays deterministic.
    px = F.coalesce(F.col("w").cast("long") * F.col("h"), F.lit(0).cast("long"))
    survivors = (
        gated.select(
            F.lower(F.trim(F.col("caption"))).alias("caption_key"),
            "image_id", "phash", "w", "h", px.alias("px"),
        )
        .groupBy("caption_key")
        .agg(
            F.min(
                F.struct(
                    (-F.col("px")).alias("neg_px"),
                    F.col("image_id"),
                    F.col("phash"),
                    F.col("w"),
                    F.col("h"),
                )
            ).alias("b")
        )
        .select(
            "caption_key",
            F.col("b.image_id").alias("image_id"),
            F.col("b.phash").alias("phash"),
            F.col("b.w").alias("w"),
            F.col("b.h").alias("h"),
        )
    )
    # The clustering phase is EAGER (its label loop checkpoints per
    # round, and canonical_docs_grouped pins the drop set) — so cache
    # survivors for the duration of that phase: the gate+argmax runs
    # once while the group graph materializes. Both the survivors cache
    # and the Hamming join's window-tag table are released before
    # returning (no storage outlives the call); the caller's final
    # action recomputes the filter+argmax exactly once against the
    # pinned drop set.
    #
    # The near-dup relation is consumed in its GROUP-reduced form
    # (simhash_group_pairs + canonical_docs_grouped): clustering runs on
    # distinct phash values and cross-hash edges only; exact-equal
    # fingerprints — blank frames, boilerplate thumbnails, the dominant
    # duplicate mass at corpus scale — never expand to O(clique²)
    # member pairs on the way to their cluster.
    survivors = survivors.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        sh = survivors.select(
            F.col("image_id").alias("id"), F.col("phash").alias("simhash")
        )
        gpairs, mem, tagged = simhash_group_pairs(sh, radius=radius)
        try:
            kept = canonical_docs_grouped(survivors, gpairs, mem, "image_id")
        finally:
            tagged.unpersist()
    finally:
        if not pin_survivors:
            # default: no storage outlives the call — the caller's final
            # action recomputes the gate+argmax once against the pinned
            # drop set.  ``pin_survivors=True`` keeps the ~50 B/row
            # 6-column cache alive so that final action reuses it
            # instead of re-scanning the full payload (bytes included) —
            # one payload pass and one argmax shuffle fewer, the right
            # trade for bandwidth-bound scaling runs; the caller owns
            # the release (spark.catalog.clearCache() or .unpersist()).
            survivors.unpersist()
    out = kept.select(
        "image_id",
        "caption_key",
        (F.col("w").cast("long") * F.col("h")).alias("px"),
    )
    if pin_survivors:
        # release handle for the caller (out.pinned_survivors.unpersist())
        out.pinned_survivors = survivors
    return out


def canonical_text_corpus(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    *,
    quality_cutoff: float = 0.5,
    threshold: float = 0.6,
    k: int = 32,
    bands: int = 8,
    rows: int = 4,
    feature_hash: str = "xxhash64",
    max_bucket: int = 1000,
) -> DataFrame:
    """The document analog of `canonical_image_corpus`: raw docs →
    quality-score gate → MinHash+LSH near-dup pairs → connected-component
    clustering → canonical corpus (min-id representative per cluster,
    plus every unpaired survivor). Returns (id, quality).

    Composition of oracle-checked operators (quality_filter,
    minhash_near_dups, dedup_groups); the reference's serial analog is
    the same handler chain `canonical_image_corpus` cites, with the text
    fingerprint in place of the perceptual hash. Scale story: the gate
    is a JVM column filter on the scan; pair-finding inherits the
    distinct-signature banded plan (cap only on diverse degenerate
    buckets) and is consumed GROUP-reduced — exact-dup cliques reach
    their cluster via membership, never as O(clique²) pairs; clustering
    is O(log d) label propagation over the group graph; the final keep
    is one anti-join against the pinned drop set."""
    from crawler_spark.functions.text import quality_score
    from crawler_spark.operators.components import canonical_docs_grouped
    from crawler_spark.operators.dedup import minhash_group_pairs

    gated = docs.select(
        F.col(id_col).alias(id_col),
        F.col(text_col).alias(text_col),
        quality_score(F.col(text_col)).alias("quality"),
    ).where(F.col("quality") >= quality_cutoff)
    # the group graph (label loop is eager; canonical_docs_grouped pins
    # the drop set) and the final anti-join both consume the gated
    # corpus: cache it for the call. The near-dup relation is consumed
    # GROUP-reduced (minhash_group_pairs): clustering runs on distinct
    # signature vectors and cross-group LSH edges only — exact-dup
    # cliques never expand to O(clique²) member pairs on the way to
    # their cluster (on a boilerplate-heavy corpus that expansion, not
    # the LSH join, dominates the whole pipeline).
    gated = gated.persist(StorageLevel.MEMORY_AND_DISK)
    try:
        gpairs, mem, tagged = minhash_group_pairs(
            gated, id_col, text_col, k=k, bands=bands, rows=rows,
            threshold=threshold, feature_hash=feature_hash,
            max_bucket=max_bucket,
        )
        try:
            kept = canonical_docs_grouped(gated, gpairs, mem, id_col)
        finally:
            tagged.unpersist()
    finally:
        gated.unpersist()
    return kept.select(id_col, "quality")
