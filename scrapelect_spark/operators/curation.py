"""Image+caption pair curation: the end-of-pipeline pass that turns a
raw extracted corpus (the ``input_hint`` table shape — image_id,
bytes, w, h, fmt, caption, phash) into a training set.

This composes the individually-gated pieces into the LAION-style
curation cascade every large multimodal training pipeline runs:

1. decodability  — drop rows whose image failed to decode
   (``decode_error`` from :func:`multimodal.with_image_features`);
2. geometry      — minimum side length + aspect-ratio bound (tiny
   thumbnails and extreme banners are training poison);
3. caption text  — whitespace-normalized, token-count window, must
   contain letters;
4. caption dedup — exact, keep the lowest ``image_id`` per
   normalized caption (min-per-group aggregation + semi-join: one
   partial-agg shuffle, NO window over the corpus, so a
   million-copy boilerplate caption costs its group one reduce,
   not one task);
5. image near-dedup — 64-bit perceptual-hash banding
   (:func:`imagemeta.phash_neardup`, pigeonhole-exact for the
   Hamming bound, hot-bucket-salted) and greedy keep-lowest-id.

Every predicate is integer/string arithmetic in JVM expressions —
the whole cascade is oracle-verifiable and Catalyst pushes the
geometry filters into the scan.  Scale shape at 100 TB: two shuffles
(caption groups, phash bands) + two semi/anti joins, all keyed and
salt-guarded; nothing driver-side.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def curate_image_caption_pairs(
    featured: DataFrame,
    *,
    min_side: int = 64,
    max_aspect_x100: int = 300,
    min_tokens: int = 3,
    max_tokens: int = 128,
    phash_hamming: int = 7,
    n_bands: int = 8,
) -> DataFrame:
    """Curate an ``input_hint``-shaped table (post
    ``with_image_features``: has ``decode_error``) down to training
    pairs.  Returns the surviving rows as
    ``(image_id, w, h, n_tokens)``.

    The aspect bound is integer-exact (``max_side * 100 <=
    max_aspect_x100 * min_side``) so Spark and any SQL oracle agree
    bit-for-bit — no float ratios."""
    from .imagemeta import phash_neardup

    norm = F.lower(F.trim(F.regexp_replace(F.col("caption"), r"\s+", " ")))
    viable = (
        featured.filter(F.col("decode_error").isNull())
        .filter(F.col("w").isNotNull() & F.col("h").isNotNull())
        # min-side as two scalar comparisons (≡ least(w,h) >= min_side)
        # so Catalyst pushes both into the parquet scan — at corpus
        # scale the tiny-thumbnail majority dies in the reader
        .filter((F.col("w") >= min_side) & (F.col("h") >= min_side))
        .filter(
            F.greatest("w", "h") * 100 <= max_aspect_x100 * F.least("w", "h")
        )
        .withColumn("norm_caption", norm)
        .withColumn(
            "n_tokens", F.size(F.split(F.col("norm_caption"), " ")).cast("long")
        )
        .filter(F.col("n_tokens").between(min_tokens, max_tokens))
        .filter(F.col("norm_caption").rlike("[a-z]"))
    )

    # caption exact-dedup: min image_id per normalized caption
    cap_keep = (
        viable.groupBy(F.md5("norm_caption").alias("caption_key"))
        .agg(F.min("image_id").alias("image_id"))
        .select("image_id")
    )
    deduped = viable.join(cap_keep, on="image_id", how="left_semi")

    # perceptual near-dedup among survivors: greedy keep-lowest-id
    hashed = deduped.select(
        F.col("image_id").alias("doc_id"), "phash"
    )
    drops = (
        phash_neardup(hashed, max_hamming=phash_hamming, n_bands=n_bands)
        .select(F.col("doc_b").alias("image_id"))
        .distinct()
    )
    return (
        deduped.join(drops, on="image_id", how="left_anti")
        .select("image_id", "w", "h", "n_tokens")
    )


# --- gate ---------------------------------------------------------------


def _synth_phash(doc_id: int) -> int:
    """i.i.d. 64-bit hash per doc from md5; docs ≡6 (mod 10) are
    Hamming-2 near-copies of their predecessor (same construction as
    imagemeta's pixel-level gate, minus the pixels — the pixel path is
    covered by ``image_phash_neardup``)."""
    if doc_id % 10 == 6:
        return _synth_phash(doc_id - 1) ^ 0b100000001
    v = int.from_bytes(hashlib.md5(str(doc_id).encode()).digest()[:8], "big")
    return v - (1 << 64) if v >= (1 << 63) else v


def curate_pairs_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gate for the full curation cascade: synthesize a deterministic
    ``input_hint``-shaped corpus per doc —

    - ``w = 32 + (doc_id % 20) * 16``, ``h = 64 + (doc_id % 15) * 32``
      (some rows fail the 64-px minimum, some the 3:1 aspect bound);
    - ``decode_error`` set on docs ≡0 (mod 17);
    - caption = ``'Tok '`` × (2 + doc_id % 12) + a group tag
      ``doc_id % 40`` ⇒ token counts 3-14 (min_tokens=4 prunes the
      short tail) and exact-duplicate groups keyed by doc_id mod 120;
    - phash near-dups: docs ≡6 (mod 10) Hamming-2 from doc_id-1 —

    run the REAL cascade, and check against an oracle that derives
    each stage's survivor set analytically."""
    from .tables import load, spread

    d = spread(load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300))

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids = pdf["doc_id"].astype("int64")
            n = len(ids)
            rows = {
                "image_id": ids,
                "bytes": pd.Series([None] * n, dtype=object),
                "w": (32 + (ids % 20) * 16).astype("int32"),
                "h": (64 + (ids % 15) * 32).astype("int32"),
                "fmt": pd.Series(["png"] * n, dtype=object),
                "caption": pd.Series(
                    [
                        "Tok " * (2 + int(i) % 12) + "grp%d" % (int(i) % 40)
                        for i in ids
                    ],
                    dtype=object,
                ),
                "phash": pd.Series(
                    [_synth_phash(int(i)) for i in ids], dtype="int64"
                ),
                "decode_error": pd.Series(
                    [
                        "truncated stream" if int(i) % 17 == 0 else None
                        for i in ids
                    ],
                    dtype=object,
                ),
            }
            yield pd.DataFrame(rows)

    featured = d.select("doc_id").mapInPandas(
        synth,
        schema="image_id long, bytes binary, w int, h int, fmt string, "
        "caption string, phash long, decode_error string",
    )
    return curate_image_caption_pairs(
        featured, min_side=64, max_aspect_x100=300, min_tokens=4,
        max_tokens=128, phash_hamming=7, n_bands=8,
    ).orderBy("image_id")


# The oracle rebuilds the cascade stage-by-stage in SQL over the same
# integer formulas.  ``stage3`` = geometry+caption survivors; caption
# dedup keeps min(image_id) per (doc_id%120) group WITHIN stage3;
# near-dup drops doc ≡6 (mod 10) iff its predecessor also reached the
# phash stage.
_CURATE_SQL = """
WITH synth AS (
  SELECT doc_id AS image_id,
         CAST(32 + (doc_id % 20) * 16 AS INTEGER) AS w,
         CAST(64 + (doc_id % 15) * 32 AS INTEGER) AS h,
         CAST(3 + (doc_id % 12) AS BIGINT) AS n_tokens,
         doc_id % 120 AS caption_grp,
         (doc_id % 17 = 0) AS dead
  FROM documents WHERE doc_id < 300
),
stage3 AS (
  SELECT * FROM synth
  WHERE NOT dead
    AND LEAST(w, h) >= 64
    AND GREATEST(w, h) * 100 <= 300 * LEAST(w, h)
    AND n_tokens BETWEEN 4 AND 128
),
capdedup AS (
  SELECT * FROM (
    SELECT *, MIN(image_id) OVER (PARTITION BY caption_grp) AS keeper
    FROM stage3
  ) WHERE image_id = keeper
)
SELECT image_id, w, h, n_tokens
FROM capdedup a
WHERE NOT (a.image_id % 10 = 6 AND EXISTS (
      SELECT 1 FROM capdedup p WHERE p.image_id = a.image_id - 1))
ORDER BY image_id
"""


QUERIES = {
    "curate_pairs_pipeline": curate_pairs_pipeline,
}
ORACLE_SQL = {
    "curate_pairs_pipeline": _CURATE_SQL,
}
