"""Deduplication family over the ``documents`` / ``embeddings`` tables:
exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine near-dup.

Cross-engine determinism rules (shared with relational.py):
- hashes are ``md5`` hex strings (identical in Spark and DuckDB);
  MinHash uses *lexicographic min* over ``md5(shingle || '#' || k)``
  so no hex→int conversion is needed anywhere;
- every multi-row float reduction (vector dots/norms) is a SUM of
  per-row doubles cast to ``DECIMAL(28,12)`` — exact and
  order-independent, so partial aggregation / AQE can do anything;
- bit arithmetic (SimHash) uses FLOOR-divide + ``%`` on small ints,
  exact in double, identical in both dialects.

Scale notes: shingling explodes ~L rows per doc — at 100 TB this is
the map-side of one shuffle (groupBy doc_id,k with partial min); LSH
banding turns O(n²) candidate generation into an equi-join on
(band, band_val), the classic shuffle-friendly formulation.  The
MinHash query bounds its input (doc_id < 300) so candidate volume is
sf-independent for the gate; production entry points take thresholds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .tables import barrier, load, spread

DEC = "decimal(28,12)"


# --- exact ----------------------------------------------------------


def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-first exact dedup by content hash: dup_rank 1 = keeper."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("fingerprint").orderBy("doc_id")
    return (
        d.withColumn("fingerprint", F.md5(F.col("text")))
        .withColumn("dup_rank", F.row_number().over(w).cast("int"))
        .select("doc_id", "fingerprint", "dup_rank")
        .transform(barrier).orderBy("doc_id")
    )


_EXACT_SQL = """
SELECT doc_id, md5(text) AS fingerprint,
       CAST(ROW_NUMBER() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS INTEGER) AS dup_rank
FROM documents
ORDER BY doc_id
"""


# --- shingles helper (Spark side) -----------------------------------


def _words(d: DataFrame) -> DataFrame:
    return d.select(
        "doc_id",
        F.posexplode(F.split(F.trim(F.col("text")), r"\s+")).alias("pos", "w"),
    ).withColumn("ord", (F.col("pos") + 1).cast("long")).drop("pos")


def _shingles(words: DataFrame, n: int = 3) -> DataFrame:
    w = Window.partitionBy("doc_id").orderBy("ord")
    sh = F.concat_ws(
        " ", F.col("w"), F.lead("w", 1).over(w), F.lead("w", 2).over(w)
    )
    # concat_ws skips NULLs; emulate strict concat by requiring lead-2
    return (
        words.withColumn("w2", F.lead("w", 2).over(w))
        .withColumn("sh", sh)
        .filter(F.col("w2").isNotNull())
        .select("doc_id", "ord", "sh")
    )


_WORDS_SQL = r"""
words AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\s+')) AS w,
         generate_subscripts(regexp_split_to_array(trim(text), '\s+'), 1) AS ord
  FROM documents {where}
)
"""

_SHINGLES_SQL = """
shingles AS (
  SELECT doc_id, ord,
         w || ' ' || lead(w, 1) OVER win || ' ' || lead(w, 2) OVER win AS sh
  FROM words
  WINDOW win AS (PARTITION BY doc_id ORDER BY ord)
)
"""


# --- MinHash + LSH --------------------------------------------------

_MINHASH_K = 8
_LSH_ROWS_PER_BAND = 2


def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate pairs: K=8 minhashes over word 3-gram shingles,
    4 bands × 2 rows; pair (a,b) is a candidate iff some band agrees."""
    return _minhash_pairs(spark, sf_dir)


#: band buckets larger than this take the salted pair path; smaller
#: buckets use the plain equi-join (no replication cost).  m docs in a
#: hot bucket → m²/2 pairs; unsalted, all of them land in ONE task.
_HOT_BAND_THRESHOLD = 1_000
_HOT_SALT_BUCKETS = 16


def band_pairs(
    bands: DataFrame,
    hot_threshold: int = _HOT_BAND_THRESHOLD,
    salt_buckets: int = _HOT_SALT_BUCKETS,
) -> DataFrame:
    """All candidate pairs (doc_a < doc_b) sharing a (band, band_val)
    bucket, with a skew guard: bucket sizes are counted first and any
    bucket above ``hot_threshold`` members is self-joined through a
    salted path — side A keyed by ``doc_id % salt_buckets``, side B
    replicated to every salt — so a boilerplate-heavy corpus that puts
    millions of docs in one band bucket spreads its m²/2 pairs across
    ``salt_buckets`` tasks instead of OOMing one.  The pair set is
    IDENTICAL to the naive join (each pair matches in exactly one salt
    partition — A contributes one salt, B all of them); only the task
    placement changes (`tests/test_dedup_cc.py::test_band_pairs_*`).
    """
    sizes = bands.groupBy("band", "band_val").agg(F.count("*").alias("bsz"))
    # the size-tagged band table feeds FOUR consumers (both sides of the
    # cold self-join, both sides of the salted hot join) — materialize it
    # once so the upstream band derivation (and whatever produced the
    # hashes) does not re-execute per consumer; (doc_id, band, band_val,
    # bsz) is a lightweight proxy row (guide §8), cheap to hold
    tagged = bands.join(sizes, ["band", "band_val"]).localCheckpoint(
        eager=False
    )
    cold = tagged.filter(F.col("bsz") <= hot_threshold)
    hot = tagged.filter(F.col("bsz") > hot_threshold)

    def pair_join(a_side: DataFrame, b_side: DataFrame, extra_keys):
        a = a_side.select(
            F.col("doc_id").alias("doc_a"), "band", "band_val", *extra_keys
        )
        b = b_side.select(
            F.col("doc_id").alias("doc_b"),
            F.col("band").alias("band_b"),
            F.col("band_val").alias("band_val_b"),
            *[F.col(k).alias(f"{k}_b") for k in extra_keys],
        )
        cond = (a.band == b.band_b) & (a.band_val == b.band_val_b)
        for k in extra_keys:
            cond = cond & (a[k] == b[f"{k}_b"])
        return a.join(b, cond & (a.doc_a < b.doc_b)).select("doc_a", "doc_b")

    cold_pairs = pair_join(cold, cold, [])
    hot_a = hot.withColumn(
        # pmod, not %: Spark's % preserves sign, and a negative doc_id
        # would get a salt no replica of side B carries — dropping pairs
        "salt", F.pmod(F.col("doc_id"), F.lit(salt_buckets)).cast("int")
    )
    hot_b = hot.withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    hot_pairs = pair_join(hot_a, hot_b, ["salt"])
    return cold_pairs.unionByName(hot_pairs).distinct()


def _minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    sh = _shingles(_words(d)).filter(F.col("sh").isNotNull())
    # all K minhashes in ONE aggregation over the shingle rows (the
    # crossJoin-with-seeds formulation shuffles the shingles K times
    # and then needs an even/odd self-join to pair band halves; this
    # shuffles them once and derives bands with zero joins)
    sigs_wide = sh.groupBy("doc_id").agg(
        *[
            F.min(F.md5(F.concat(F.col("sh"), F.lit(f"#{k}")))).alias(f"mh{k}")
            for k in range(_MINHASH_K)
        ]
    )
    n_bands = _MINHASH_K // _LSH_ROWS_PER_BAND
    stack_args = ", ".join(
        f"{b}, md5(concat(mh{2 * b}, mh{2 * b + 1}))" for b in range(n_bands)
    )
    bands = sigs_wide.select(
        "doc_id",
        F.expr(f"stack({n_bands}, {stack_args}) AS (band, band_val)"),
    ).select("doc_id", F.col("band").cast("int").alias("band"), "band_val")
    return band_pairs(bands).transform(barrier).orderBy("doc_a", "doc_b")


_MINHASH_SQL = (
    "WITH "
    + _WORDS_SQL.format(where="WHERE doc_id < 300")
    + ", "
    + _SHINGLES_SQL
    + """
, sigs AS (
  SELECT doc_id, k, min(md5(sh || '#' || CAST(k AS VARCHAR))) AS mh
  FROM shingles CROSS JOIN (SELECT unnest(range(8)) AS k) seeds
  WHERE sh IS NOT NULL
  GROUP BY doc_id, k
),
bands AS (
  SELECT a.doc_id, CAST(a.k / 2 AS INTEGER) AS band, md5(a.mh || b.mh) AS band_val
  FROM sigs a JOIN sigs b ON a.doc_id = b.doc_id AND b.k = a.k + 1
  WHERE a.k % 2 = 0
)
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM bands x
JOIN bands y ON x.band = y.band AND x.band_val = y.band_val AND x.doc_id < y.doc_id
ORDER BY doc_a, doc_b
"""
)


# --- SimHash --------------------------------------------------------


def _simhash_bit_sql(j: int) -> str:
    """Bit j of hex nibble j//4 of md5(w): exact small-int arithmetic
    via FLOOR-divide + %, parsed identically by both dialects."""
    nib = j // 4  # which hex char (1-based substr offset nib+1)
    div = 2 ** (j % 4)
    return (
        f"CAST(FLOOR((instr('0123456789abcdef', substr(md5(w), {nib + 1}, 1)) - 1) "
        f"/ {div}) AS INT) % 2"
    )


def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load(spark, sf_dir, "documents")
    words = _words(d)
    spark_cols = [
        F.sum(F.when(F.expr(_simhash_bit_sql(j)) == 1, 1).otherwise(-1)).alias(f"s{j}")
        for j in range(16)
    ]
    per = words.groupBy("doc_id").agg(*spark_cols)
    combine = None
    for j in range(16):
        term = F.when(F.col(f"s{j}") > 0, 2**j).otherwise(0)
        combine = term if combine is None else combine + term
    return (
        per.select("doc_id", combine.cast("long").alias("simhash"))
        .transform(barrier).orderBy("doc_id")
    )


def _simhash_sql() -> str:
    sums = ", ".join(
        f"SUM(CASE WHEN {_simhash_bit_sql(j)} = 1 THEN 1 ELSE -1 END) AS s{j}"
        for j in range(16)
    )
    combine = " + ".join(
        f"(CASE WHEN s{j} > 0 THEN {2**j} ELSE 0 END)" for j in range(16)
    )
    return (
        "WITH "
        + _WORDS_SQL.format(where="")
        + f""", per AS (
  SELECT doc_id, {sums}
  FROM words GROUP BY doc_id
)
SELECT doc_id, CAST({combine} AS BIGINT) AS simhash
FROM per ORDER BY doc_id
"""
    )


# --- n-gram / token Jaccard ----------------------------------------


def dedup_jaccard_adjacent(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-set Jaccard between doc i and i+1 (deterministic linear
    pairing; the pairwise building block of near-dup scoring)."""
    d = load(spark, sf_dir, "documents").select(
        "doc_id", F.array_distinct(F.split(F.trim("text"), r"\s+")).alias("toks")
    )
    a = d.alias("a")
    b = d.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("toks").alias("toks_b")
    ).alias("b")
    return (
        a.join(b, "doc_id")
        .select(
            "doc_id",
            F.round(
                F.size(F.array_intersect("toks", "toks_b"))
                / F.size(F.array_union("toks", "toks_b")),
                6,
            ).alias("jaccard"),
        )
        .transform(barrier).orderBy("doc_id")
    )


def dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric shingle CONTAINMENT (Broder's measure):
    |S(a) ∩ S(b)| / |S(a)| over 3-gram shingles — the quote/subsumption
    detector symmetric Jaccard misses (a short doc wholly quoted
    inside a long one has low Jaccard but containment 1.0).  Docs ≡0
    (mod 6) are planted as fully contained in their successor (the
    successor's text gets the doc appended), and must score exactly
    1.0 while their Jaccard stays well below the dedup threshold.
    All higher-order array expressions — no shuffle beyond the
    adjacent-pair join."""
    base = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 400)
    prev = base.select(
        (F.col("doc_id") + 1).alias("doc_id"),
        F.col("text").alias("prev_text"),
    )
    planted = (
        base.join(prev, "doc_id", "left")
        .withColumn(
            "text",
            F.when(
                (F.col("doc_id") % 6 == 1) & F.col("prev_text").isNotNull(),
                F.concat_ws(" ", "text", "prev_text"),
            ).otherwise(F.col("text")),
        )
        .drop("prev_text")
    )

    def shingles(col):
        ws = F.split(F.trim(col), r"\s+")
        return F.when(
            F.size(ws) >= 3,
            F.array_distinct(
                F.transform(
                    F.sequence(F.lit(0), F.size(ws) - 3),
                    lambda i: F.concat_ws(
                        " ",
                        F.element_at(ws, i + 1),
                        F.element_at(ws, i + 2),
                        F.element_at(ws, i + 3),
                    ),
                )
            ),
        ).otherwise(F.array().cast("array<string>"))

    # the shingle table is consumed by both sides of the adjacent-pair
    # self-join (and the final total sort samples the tree a second
    # time): materialize once — the shingle transform over planted text
    # is the expensive part of this plan
    sh = planted.select(
        "doc_id", shingles(F.col("text")).alias("sh")
    ).transform(barrier)
    a = sh.alias("a")
    b = sh.select(
        (F.col("doc_id") - 1).alias("doc_id"), F.col("sh").alias("sh_b")
    )
    inter = F.size(F.array_intersect("sh", "sh_b"))
    return (
        a.join(b, "doc_id")
        .filter((F.size("sh") > 0) & (F.size("sh_b") > 0))
        .select(
            "doc_id",
            F.round(inter / F.size("sh"), 6).alias("containment"),
            F.round(
                inter / F.size(F.array_union("sh", "sh_b")), 6
            ).alias("jaccard"),
        )
        .withColumn(
            "contained", (F.col("containment") >= 0.9).cast("long")
        )
        .transform(barrier).orderBy("doc_id")
    )


_CONTAINMENT_SQL = r"""
WITH base AS (
  SELECT doc_id, text FROM documents WHERE doc_id < 400
),
planted AS (
  SELECT b.doc_id,
         CASE WHEN b.doc_id % 6 = 1 AND p.text IS NOT NULL
              THEN b.text || ' ' || p.text
              ELSE b.text END AS text
  FROM base b LEFT JOIN base p ON p.doc_id = b.doc_id - 1
),
sh AS (
  SELECT doc_id,
    CASE WHEN len(regexp_split_to_array(trim(text), '\s+')) >= 3 THEN
      list_distinct(list_transform(
        range(1, len(regexp_split_to_array(trim(text), '\s+')) - 1),
        i -> regexp_split_to_array(trim(text), '\s+')[i] || ' '
          || regexp_split_to_array(trim(text), '\s+')[i + 1] || ' '
          || regexp_split_to_array(trim(text), '\s+')[i + 2]))
    ELSE CAST([] AS VARCHAR[]) END AS sh
  FROM planted
)
SELECT a.doc_id,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(a.sh), 6) AS containment,
       ROUND(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
             / len(list_distinct(list_concat(a.sh, b.sh))), 6) AS jaccard,
       CAST(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
            / len(a.sh) >= 0.9 AS BIGINT) AS contained
FROM sh a JOIN sh b ON b.doc_id = a.doc_id + 1
WHERE len(a.sh) > 0 AND len(b.sh) > 0
ORDER BY a.doc_id
"""


_JACCARD_SQL = r"""
WITH toks AS (
  SELECT doc_id, list_distinct(regexp_split_to_array(trim(text), '\s+')) AS t
  FROM documents
)
SELECT a.doc_id,
       ROUND(CAST(len(list_intersect(a.t, b.t)) AS DOUBLE)
             / len(list_distinct(list_concat(a.t, b.t))), 6) AS jaccard
FROM toks a JOIN toks b ON b.doc_id = a.doc_id + 1
ORDER BY a.doc_id
"""


# --- embedding cosine near-dup -------------------------------------


def _pair_cosine(spark: SparkSession, sf_dir: str, offset: int = 1) -> DataFrame:
    e = load(spark, sf_dir, "embeddings")
    a = e.select("vec_id", "embedding")
    b = e.select(
        (F.col("vec_id") - offset).alias("vec_id"),
        F.col("embedding").alias("embedding_b"),
    )
    joined = a.join(b, "vec_id")
    ex = joined.select(
        "vec_id",
        F.posexplode(
            F.zip_with(
                "embedding",
                "embedding_b",
                lambda x, y: F.struct(
                    x.cast("double").alias("x"), y.cast("double").alias("y")
                ),
            )
        ).alias("pos", "p"),
    )
    agg = ex.groupBy("vec_id").agg(
        F.sum((F.col("p.x") * F.col("p.y")).cast(DEC)).alias("dot"),
        F.sum((F.col("p.x") * F.col("p.x")).cast(DEC)).alias("na"),
        F.sum((F.col("p.y") * F.col("p.y")).cast(DEC)).alias("nb"),
    )
    return agg.select(
        "vec_id",
        F.round(
            F.col("dot").cast("double")
            / F.sqrt(F.col("na").cast("double") * F.col("nb").cast("double")),
            6,
        ).alias("cosine"),
    )


def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cosine near-dup flags between adjacent embedding rows."""
    return (
        _pair_cosine(spark, sf_dir)
        .select(
            "vec_id",
            "cosine",
            F.when(F.col("cosine") > 0.95, 1).otherwise(0).cast("int").alias("is_near_dup"),
        )
        .transform(barrier).orderBy("vec_id")
    )


_EMB_COS_SQL = """
WITH pairs AS (
  SELECT a.vec_id,
         unnest(a.embedding) AS xa,
         unnest(b.embedding) AS xb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
),
agg AS (
  SELECT vec_id,
    SUM(CAST(CAST(xa AS DOUBLE) * CAST(xb AS DOUBLE) AS DECIMAL(28,12))) AS dot,
    SUM(CAST(CAST(xa AS DOUBLE) * CAST(xa AS DOUBLE) AS DECIMAL(28,12))) AS na,
    SUM(CAST(CAST(xb AS DOUBLE) * CAST(xb AS DOUBLE) AS DECIMAL(28,12))) AS nb
  FROM pairs GROUP BY vec_id
)
SELECT vec_id,
  ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS cosine,
  CAST(CASE WHEN ROUND(CAST(dot AS DOUBLE) / sqrt(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) > 0.95
       THEN 1 ELSE 0 END AS INTEGER) AS is_near_dup
FROM agg ORDER BY vec_id
"""


class ConvergenceError(RuntimeError):
    """Connected components did not reach a fixpoint within its round
    budget — raised instead of silently returning a wrong clustering."""


def _large_star(edges: DataFrame) -> DataFrame:
    """Large-star rewrite (Kiveris et al., "Connected Components in
    MapReduce and Beyond"): for every node u with symmetric
    neighborhood N(u), connect each LARGER neighbor v > u directly to
    m = min(N(u) ∪ {u}).  Expressed as groupBy-min + join — no
    collect_list, so a 10^8-degree hub never materializes its
    neighborhood in one task."""
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    mins = sym.groupBy("src").agg(
        F.least(F.min("dst"), F.first("src")).alias("m")
    )
    return (
        sym.filter(F.col("dst") > F.col("src"))
        .join(mins, "src")
        .select(F.col("m").alias("src"), F.col("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Small-star rewrite: orient every edge large→small, then for each
    node u connect all of its (smaller) neighbors and u itself to
    m = min(N(u)).  Same join + groupBy-min dataflow as large-star."""
    lohi = (
        edges.select(
            F.greatest("src", "dst").alias("hi"), F.least("src", "dst").alias("lo")
        )
        .filter(F.col("hi") != F.col("lo"))
        .distinct()
    )
    mins = lohi.groupBy("hi").agg(F.min("lo").alias("m"))
    nbr = (
        lohi.join(mins, "hi")
        .filter(F.col("lo") != F.col("m"))
        .select(F.col("m").alias("src"), F.col("lo").alias("dst"))
    )
    own = mins.select(F.col("m").alias("src"), F.col("hi").alias("dst"))
    return nbr.unionByName(own).distinct()


def _union_find_local(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Exact union-find with min-label roots — the driver-local solve
    for candidate graphs small enough to collect."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {x: find(x) for x in parent}


def connected_components(
    edges: DataFrame, max_rounds: int = 50, local_threshold: int = 200_000
) -> DataFrame:
    """Connected components of an undirected edge list
    (columns ``src``, ``dst``) via alternating large-star/small-star
    contraction — O(log n) rounds instead of O(graph diameter), so a
    chain-shaped component of any length converges in the same handful
    of shuffles as a clique.  Returns (``doc_id``, ``cluster``) with
    cluster = the component's minimum node id.

    Candidate graphs at or below ``local_threshold`` edges (the count
    is needed for the fixpoint test anyway) are solved exactly with
    driver-local union-find instead — near-dup *candidate* graphs are
    typically 2-4 orders of magnitude smaller than the corpus, and a
    sub-second local solve beats 4-6 distributed rounds of scheduler
    latency.  Pass ``local_threshold=0`` to force the distributed path
    (the scale tests do).

    Raises :class:`ConvergenceError` if ``max_rounds`` is exhausted
    before the edge set reaches a fixpoint (never silently returns a
    wrong clustering; 50 rounds covers n ≈ 2^25 components even at the
    paper's conservative bound — real graphs converge in < 10).
    """
    # materialize the edge list once — nodes and the canonical set both
    # derive from it, and the input plan may be an expensive pipeline
    # (the MinHash candidate generator) that must not run twice.  All
    # three checkpoints are LAZY: the cur.count() below materializes
    # cur AND edges in one job instead of three eager materialization
    # jobs (r5 paid a scheduler round-trip per checkpoint); nodes
    # materializes inside whichever job first consumes it.
    edges = edges.select("src", "dst").transform(barrier)
    nodes = (
        edges.select(F.col("src").alias("doc_id"))
        .unionByName(edges.select(F.col("dst").alias("doc_id")))
        .distinct()
        .transform(barrier)
    )
    cur = (
        edges.filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
        .distinct()
        .transform(barrier)
    )
    cur_cnt = cur.count()
    if cur_cnt <= local_threshold:
        labels = _union_find_local(
            [(r.src, r.dst) for r in cur.collect()]
        )
        spark = edges.sparkSession
        if not labels:
            return nodes.select(
                "doc_id", F.col("doc_id").alias("cluster")
            )
        lab_df = spark.createDataFrame(
            list(labels.items()), ["doc_id", "root"]
        )
        return nodes.join(lab_df, "doc_id", "left").select(
            "doc_id", F.coalesce(F.col("root"), F.col("doc_id")).alias("cluster")
        )
    for _ in range(max_rounds):
        nxt = _small_star(_large_star(cur)).transform(barrier)
        # fixpoint test on the canonical (distinct, src<dst) edge sets;
        # cheap count comparison first — the exceptAll job only runs on
        # the (rare) rounds where the cardinality already matches
        # (the count also materializes the lazy checkpoint, one job)
        nxt_cnt = nxt.count()
        same = (
            nxt_cnt == cur_cnt
            and nxt.exceptAll(cur).limit(1).count() == 0
        )
        cur, cur_cnt = nxt, nxt_cnt
        if same:
            break
    else:
        raise ConvergenceError(
            f"connected_components: no fixpoint within {max_rounds} rounds"
        )
    # at the fixpoint the edges form stars: (root=min, member) per edge
    roots = cur.select(F.col("dst").alias("doc_id"), F.col("src").alias("root"))
    return nodes.join(roots, "doc_id", "left").select(
        "doc_id", F.coalesce(F.col("root"), F.col("doc_id")).alias("cluster")
    )


def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the LSH candidate-pair graph — the
    step that turns pair detection into corpus dedup (keep one doc per
    near-duplicate cluster; cluster id = min doc_id in the component).

    Uses alternating large-star/small-star edge contraction
    (:func:`connected_components`): O(log n) shuffle rounds regardless
    of component diameter, with a hard convergence assertion — the
    scale-safe replacement for diameter-bounded min-label propagation
    (which silently mis-clusters any component of diameter > its
    round bound)."""
    pairs = _minhash_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return connected_components(edges).transform(barrier).orderBy("doc_id")


_DECON_N = 4  # n-gram width; real pipelines use 8-13 — the synthetic
# corpus has little natural repetition, so the gate uses 4 to keep the
# flagged set non-vacuous (17/490 docs at sf0.01) while the operator
# itself is width-parametric


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = _DECON_N,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination — the training-data admission step
    that flags corpus documents sharing any ``n``-token n-gram with an
    evaluation benchmark (the standard guard against test-set leakage
    into a training corpus).

    Scale shape: the benchmark side is small by construction (eval
    suites are MBs; the corpus is the 100-TB side), so its distinct
    n-gram set is broadcast and the corpus side streams through one
    generate + broadcast-hash-join + partial-agg pipeline — no shuffle
    of the corpus, no driver collection.  Returns
    (``doc_id``, ``n_shared``) for flagged documents only.
    """
    tok = F.split(F.trim(F.col(text_col)), r"\s+")

    def grams(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col(id_col), tok.alias("t"))
            .filter(F.size("t") >= n)
            .select(
                id_col,
                F.explode(
                    F.expr(
                        f"transform(sequence(1, size(t) - {n - 1}),"
                        f" i -> concat_ws(' ', slice(t, i, {n})))"
                    )
                ).alias("g"),
            )
        )

    bench_grams = grams(benchmark).select("g").distinct()
    return (
        grams(corpus)
        .join(F.broadcast(bench_grams), "g")
        .groupBy(id_col)
        .agg(F.count_distinct("g").cast("long").alias("n_shared"))
    )


def corpus_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver gate for :func:`decontaminate`: benchmark = every 50th
    document (doc_id % 50 == 7 — deterministic, no external data),
    corpus = the rest; report the flagged doc_ids with their shared
    distinct-n-gram counts."""
    d = load(spark, sf_dir, "documents")
    bench = d.filter(F.col("doc_id") % 50 == 7)
    corpus = d.filter(F.col("doc_id") % 50 != 7)
    return decontaminate(corpus, bench).transform(barrier).orderBy("doc_id")


_DECONTAMINATE_SQL = rf"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM documents
),
pos AS (
  SELECT doc_id, t, unnest(range(1, len(t) - {_DECON_N - 2})) AS i FROM toks
),
grams AS (
  SELECT doc_id,
         list_aggr(t[i : i + {_DECON_N - 1}], 'string_agg', ' ') AS g
  FROM pos
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 7)
SELECT doc_id, CAST(COUNT(DISTINCT g) AS BIGINT) AS n_shared
FROM grams JOIN bench USING (g)
WHERE doc_id % 50 <> 7
GROUP BY doc_id
ORDER BY doc_id
"""


def dedup_clusters_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """:func:`dedup_clusters` with ``local_threshold=0`` — the gate row
    that EXECUTES the distributed large-star/small-star contraction
    loop (VERDICT r3 item #4: at gate scale the candidate graph always
    fit the driver-local union-find, so the code path the 100-TB story
    depends on was pytest-only).  Same oracle as ``dedup_clusters``;
    the two must agree with each other and with the recursive-CTE
    reachability oracle."""
    pairs = _minhash_pairs(spark, sf_dir)
    edges = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    return connected_components(edges, local_threshold=0).transform(barrier).orderBy("doc_id")


_CLUSTERS_SQL = (
    "WITH RECURSIVE "
    + _WORDS_SQL.format(where="WHERE doc_id < 300")
    + ", "
    + _SHINGLES_SQL
    + """
, sigs AS (
  SELECT doc_id, k, min(md5(sh || '#' || CAST(k AS VARCHAR))) AS mh
  FROM shingles CROSS JOIN (SELECT unnest(range(8)) AS k) seeds
  WHERE sh IS NOT NULL
  GROUP BY doc_id, k
),
bands AS (
  SELECT a.doc_id, CAST(a.k / 2 AS INTEGER) AS band, md5(a.mh || b.mh) AS band_val
  FROM sigs a JOIN sigs b ON a.doc_id = b.doc_id AND b.k = a.k + 1
  WHERE a.k % 2 = 0
),
pairs AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM bands x
  JOIN bands y ON x.band = y.band AND x.band_val = y.band_val AND x.doc_id < y.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL
  SELECT doc_b, doc_a FROM pairs
),
reach(doc_id, lab) AS (
  SELECT DISTINCT src, src FROM edges
  UNION
  SELECT e.dst, r.lab FROM reach r JOIN edges e ON e.src = r.doc_id
)
SELECT doc_id, MIN(lab) AS cluster
FROM reach GROUP BY doc_id ORDER BY doc_id
"""
)


def dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The step after detection: APPLY the dedup decision to the
    corpus.  Fingerprint = md5 of the first 50 chars (the boilerplate-
    header dedup shape — this corpus has 24 natural prefix collisions),
    keep the lowest doc_id per fingerprint, and report per-source
    kept/dropped counts — the numbers a training-data pipeline logs
    after every dedup pass."""
    d = load(spark, sf_dir, "documents")
    w = Window.partitionBy("fp").orderBy("doc_id")
    ranked = d.withColumn(
        "fp", F.md5(F.substring(F.col("text"), 1, 50))
    ).withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("total"),
            F.sum(F.when(F.col("rk") == 1, 1).otherwise(0))
            .cast("long")
            .alias("kept"),
            F.sum(F.when(F.col("rk") > 1, 1).otherwise(0))
            .cast("long")
            .alias("dropped"),
        )
        .transform(barrier).orderBy("source")
    )


_DEDUP_APPLY_SQL = """
WITH ranked AS (
  SELECT source,
         ROW_NUMBER() OVER (PARTITION BY md5(substr(text, 1, 50))
                            ORDER BY doc_id) AS rk
  FROM documents
)
SELECT source,
  COUNT(*) AS total,
  CAST(SUM(CASE WHEN rk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS kept,
  CAST(SUM(CASE WHEN rk > 1 THEN 1 ELSE 0 END) AS BIGINT) AS dropped
FROM ranked
GROUP BY source
ORDER BY source
"""


def dedup_near_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full near-dup pass end to end: MinHash→LSH candidate pairs →
    connected components → keep the minimum doc per cluster — reported
    as the corpus yield numbers a pipeline logs (total, dup members
    dropped, kept)."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    labels = connected_components(
        _minhash_pairs(spark, sf_dir).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
    )
    dropped = labels.filter(F.col("doc_id") != F.col("cluster")).select("doc_id")
    kept = d.join(dropped, "doc_id", "left_anti")
    return d.agg(F.count(F.lit(1)).cast("long").alias("total")).crossJoin(
        kept.agg(F.count(F.lit(1)).cast("long").alias("kept"))
    ).select(
        "total",
        (F.col("total") - F.col("kept")).cast("long").alias("dropped"),
        "kept",
    )


_NEAR_YIELD_SQL = (
    _CLUSTERS_SQL.replace(
        "SELECT doc_id, MIN(lab) AS cluster\nFROM reach GROUP BY doc_id ORDER BY doc_id",
        """, labels AS (
  SELECT doc_id, MIN(lab) AS cluster FROM reach GROUP BY doc_id
)
SELECT
  (SELECT COUNT(*) FROM documents WHERE doc_id < 300) AS total,
  (SELECT COUNT(*) FROM labels WHERE doc_id <> cluster) AS dropped,
  (SELECT COUNT(*) FROM documents WHERE doc_id < 300)
    - (SELECT COUNT(*) FROM labels WHERE doc_id <> cluster) AS kept""",
    )
)


def repeated_ngram_spans(
    docs: DataFrame,
    n: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact repeated-substring detection, the token-level
    dedup-within-documents pass LLM pipelines run after document-level
    dedup (flag every length-``n`` token window whose exact text
    occurs ≥ ``min_count`` times across the whole corpus, then merge
    windows into covered-token spans per document).

    Returns one row per document:
    ``(doc_id, n_tokens, repeated_windows, covered_tokens)`` —
    ``covered_tokens`` is the size of the union of all flagged
    windows' token positions (what a removal pass would cut).

    Entirely JVM-side: tokenize → slide windows with
    ``transform(sequence(...))`` → md5 the window text → one
    ``groupBy(window_hash)`` count (partial-agg shuffle) → semi-join
    flagged hashes back → per-doc union of covered positions via
    ``explode(sequence(pos, pos+n-1))`` + distinct count.  At 100 TB
    this is two shuffles (hash count, doc re-group), no window
    functions, no Python."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(F.col(text_col), " ").alias("t"),
    ).withColumn("n_tokens", F.size("t"))
    wins = toks.select(
        "doc_id",
        "n_tokens",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size("t") - n, F.lit(-1))),
                lambda i: F.concat_ws(
                    " ", F.slice(F.col("t"), i + 1, n)
                ),
            )
        ).alias("pos", "win"),
    ).withColumn("h", F.md5("win")).drop("win")
    counts = (
        wins.groupBy("h")
        .count()
        .filter(F.col("count") >= min_count)
        .select("h")
    )
    flagged = wins.join(counts, "h", "left_semi")
    covered = (
        flagged.select(
            "doc_id",
            F.explode(
                F.sequence(F.col("pos"), F.col("pos") + (n - 1))
            ).alias("tok"),
        )
        .groupBy("doc_id")
        .agg(F.countDistinct("tok").alias("covered_tokens"))
    )
    nwin = flagged.groupBy("doc_id").agg(
        F.count("*").alias("repeated_windows")
    )
    base = toks.select("doc_id", "n_tokens")
    return (
        base.join(nwin, "doc_id", "left")
        .join(covered, "doc_id", "left")
        .select(
            "doc_id",
            "n_tokens",
            F.coalesce("repeated_windows", F.lit(0)).alias(
                "repeated_windows"
            ),
            F.coalesce("covered_tokens", F.lit(0)).alias("covered_tokens"),
        )
    )


def corpus_repeated_ngram_dedup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Gate for exact repeated-substring dedup: per doc (< 300),
    synthesize a token stream unique to the doc (``w<id>_<i>``, length
    20 + doc_id%7) and, for doc_id%3==0, splice a 10-token span shared
    verbatim across all such docs at offset doc_id%5.  The only
    8-token windows repeating corpus-wide are the 3 inside the shared
    span, covering exactly its 10 tokens — closed form per doc."""
    d = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    uniq = F.transform(
        F.sequence(F.lit(0), F.lit(19) + F.col("doc_id") % 7),
        lambda i: F.concat(
            F.lit("w"), F.col("doc_id"), F.lit("_"), i
        ),
    )
    shared = F.transform(
        F.sequence(F.lit(0), F.lit(9)),
        lambda i: F.concat(F.lit("shared_"), i),
    )
    off = (F.col("doc_id") % 5).cast("int")
    toks = F.when(
        F.col("doc_id") % 3 == 0,
        F.concat(
            F.slice(uniq, 1, off),
            shared,
            F.slice(uniq, off + 1, F.size(uniq) - off),
        ),
    ).otherwise(uniq)
    synth = d.select(
        "doc_id", F.concat_ws(" ", toks).alias("text")
    )
    return repeated_ngram_spans(synth, n=8, min_count=2).transform(barrier).orderBy("doc_id")


_REPEATED_NGRAM_SQL = """
SELECT doc_id,
  CAST(20 + doc_id % 7 + CASE WHEN doc_id % 3 = 0 THEN 10 ELSE 0 END
       AS INTEGER) AS n_tokens,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 3 ELSE 0 END AS BIGINT)
    AS repeated_windows,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 10 ELSE 0 END AS BIGINT)
    AS covered_tokens
FROM documents
WHERE doc_id < 300
ORDER BY doc_id
"""


QUERIES = {
    "dedup_containment": dedup_containment,
    "dedup_exact": dedup_exact,
    "dedup_apply": dedup_apply,
    "dedup_near_yield": dedup_near_yield,
    "dedup_minhash_lsh": dedup_minhash_lsh,
    "dedup_simhash": dedup_simhash,
    "dedup_jaccard_adjacent": dedup_jaccard_adjacent,
    "dedup_embedding_cosine": dedup_embedding_cosine,
    "dedup_clusters": dedup_clusters,
    "dedup_clusters_dist": dedup_clusters_dist,
    "corpus_decontaminate": corpus_decontaminate,
    "corpus_repeated_ngram_dedup": corpus_repeated_ngram_dedup,
}

ORACLE_SQL = {
    "dedup_containment": _CONTAINMENT_SQL,
    "dedup_exact": _EXACT_SQL,
    "dedup_apply": _DEDUP_APPLY_SQL,
    "dedup_near_yield": _NEAR_YIELD_SQL,
    "dedup_minhash_lsh": _MINHASH_SQL,
    "dedup_simhash": _simhash_sql(),
    "dedup_jaccard_adjacent": _JACCARD_SQL,
    "dedup_embedding_cosine": _EMB_COS_SQL,
    "dedup_clusters": _CLUSTERS_SQL,
    "dedup_clusters_dist": _CLUSTERS_SQL,
    "corpus_decontaminate": _DECONTAMINATE_SQL,
    "corpus_repeated_ngram_dedup": _REPEATED_NGRAM_SQL,
}
