"""URL-seen sketches: partitioned bloom filters + a cuckoo sidecar.

Role in the frontier (north_star): candidate URLs from a micro-batch
are pre-filtered against per-bucket bloom sketches *before* the exact
anti-join — a bloom has no false negatives, so "not in bloom" rows are
provably new and skip the join entirely; only the "maybe seen" sliver
(true dups + false positives) pays the shuffle.  The URL-seen set
stays **exact** (byte-for-byte requirement, SURVEY.md §7.1 item 4) —
the sketches change the *cost*, never the *answer*.

Partitioning: one bloom per frontier bucket (``pmod(hash(url), P)`` —
Spark's murmur3 column hash, computed JVM-side).  At 10^10 URLs and
1% FPP that is ~12 GiB of bloom spread over P buckets; each executor
only needs the buckets its partition touches, and rebuilds are
per-bucket incremental.  The cuckoo filter adds deletability (frontier
retractions, e.g. robots revocation) with ~same space at 3% FPP.

Hashing is ``pandas.util.hash_array`` (SipHash-ish, keyed, C-speed,
deterministic across processes for fixed keys) — vectorized over whole
Arrow batches, no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

_KEY1 = "scrapelect-blm-1"
_KEY2 = "scrapelect-blm-2"


def _hash2(items: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    arr = np.asarray(items, dtype=object)
    h1 = pd.util.hash_array(arr, hash_key=_KEY1, categorize=False)
    h2 = pd.util.hash_array(arr, hash_key=_KEY2, categorize=False)
    return h1, h2 | np.uint64(1)  # force h2 odd so probe strides cycle


class BloomFilter:
    """Plain m-bit, k-hash bloom over strings; vectorized add/query."""

    def __init__(self, num_bits: int, num_hashes: int):
        self.m = int(num_bits)
        self.k = int(num_hashes)
        self.bits = np.zeros((self.m + 7) // 8, dtype=np.uint8)

    @classmethod
    def for_capacity(cls, n: int, fpp: float = 0.01) -> "BloomFilter":
        n = max(n, 16)
        m = int(-n * np.log(fpp) / (np.log(2) ** 2))
        k = max(1, int(round(m / n * np.log(2))))
        return cls(m, k)

    def add_many(self, items) -> None:
        if len(items) == 0:
            return
        h1, h2 = _hash2(items)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            np.bitwise_or.at(
                self.bits, (idx >> np.uint64(3)).astype(np.int64),
                (np.uint8(1) << (idx & np.uint64(7)).astype(np.uint8)),
            )

    def might_contain_many(self, items) -> np.ndarray:
        if len(items) == 0:
            return np.zeros(0, dtype=bool)
        h1, h2 = _hash2(items)
        out = np.ones(len(items), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) % np.uint64(self.m)
            byte = self.bits[(idx >> np.uint64(3)).astype(np.int64)]
            bit = (byte >> (idx & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
            out &= bit.astype(bool)
        return out

    def merge(self, other: "BloomFilter") -> None:
        assert self.m == other.m and self.k == other.k
        np.bitwise_or(self.bits, other.bits, out=self.bits)

    # --- wire format ----------------------------------------------
    def to_bytes(self) -> bytes:
        head = np.array([self.m, self.k], dtype=np.int64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "BloomFilter":
        m, k = np.frombuffer(raw[:16], dtype=np.int64)
        f = cls(int(m), int(k))
        f.bits = np.frombuffer(raw[16:], dtype=np.uint8).copy()
        return f


class CuckooFilter:
    """Partial-key cuckoo filter: 16-bit fingerprints, 4-slot buckets.

    Supports delete (blooms cannot) — the sidecar for frontier
    retractions.  Insert is per-item (driver/compaction path, not the
    batch hot path); lookups are vectorized enough for sidecar use.
    """

    def __init__(self, num_buckets: int, bucket_size: int = 4, max_kicks: int = 500):
        self.nb = int(num_buckets)
        self.bs = bucket_size
        self.max_kicks = max_kicks
        self.table = np.zeros((self.nb, self.bs), dtype=np.uint16)
        self.rng = np.random.default_rng(42)

    @classmethod
    def for_capacity(cls, n: int) -> "CuckooFilter":
        nb = 1
        while nb * 4 * 0.95 < max(n, 16):
            nb *= 2
        return cls(nb)

    def _fp_and_index(self, item: str) -> tuple[int, int]:
        h1, h2 = _hash2(np.array([item], dtype=object))
        fp = int(h2[0] & np.uint64(0xFFFF)) or 1
        i1 = int(h1[0]) % self.nb
        return fp, i1

    def _alt_index(self, i: int, fp: int) -> int:
        fph = pd.util.hash_array(
            np.array([fp], dtype=np.uint64), hash_key=_KEY1
        )[0]
        return (i ^ int(fph)) % self.nb

    def insert(self, item: str) -> bool:
        fp, i1 = self._fp_and_index(item)
        i2 = self._alt_index(i1, fp)
        for i in (i1, i2):
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i, empty[0]] = fp
                return True
        i = i1 if self.rng.integers(2) else i2
        for _ in range(self.max_kicks):
            slot = int(self.rng.integers(self.bs))
            fp, self.table[i, slot] = int(self.table[i, slot]), fp
            i = self._alt_index(i, fp)
            empty = np.flatnonzero(self.table[i] == 0)
            if len(empty):
                self.table[i, empty[0]] = fp
                return True
        return False  # full — caller should resize/rebuild

    def contains(self, item: str) -> bool:
        fp, i1 = self._fp_and_index(item)
        i2 = self._alt_index(i1, fp)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def delete(self, item: str) -> bool:
        fp, i1 = self._fp_and_index(item)
        for i in (i1, self._alt_index(i1, fp)):
            hits = np.flatnonzero(self.table[i] == fp)
            if len(hits):
                self.table[i, hits[0]] = 0
                return True
        return False

    def to_bytes(self) -> bytes:
        head = np.array([self.nb, self.bs], dtype=np.int64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CuckooFilter":
        nb, bs = np.frombuffer(raw[:16], dtype=np.int64)
        f = cls(int(nb), int(bs))
        f.table = np.frombuffer(raw[16:], dtype=np.uint16).reshape(int(nb), int(bs)).copy()
        return f


class PartitionedSeenSketch:
    """bucket_id -> BloomFilter; built per-bucket on executors, merged
    as serialized bytes, broadcast back for candidate pre-filtering.

    ``bucket_counts`` (when built by :func:`build_sketches`) carries
    per-bucket row counts so callers get cardinality for free."""

    def __init__(self, sketches: dict[int, bytes]):
        self.raw = sketches
        self._cache: dict[int, BloomFilter] = {}
        self.bucket_counts: dict[int, int] = {}

    def _get(self, bucket: int) -> BloomFilter | None:
        if bucket not in self.raw:
            return None
        if bucket not in self._cache:
            self._cache[bucket] = BloomFilter.from_bytes(self.raw[bucket])
        return self._cache[bucket]

    def maybe_seen(self, urls: pd.Series, buckets: pd.Series) -> np.ndarray:
        """Vectorized per-bucket membership; False ⇒ provably new."""
        out = np.zeros(len(urls), dtype=bool)
        u = urls.to_numpy(dtype=object)
        b = buckets.to_numpy()
        for bucket in np.unique(b):
            mask = b == bucket
            f = self._get(int(bucket))
            if f is not None:
                out[mask] = f.might_contain_many(u[mask])
        return out


def build_sketches(
    seen_df,
    url_col: str = "url",
    bucket_col: str = "bucket",
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
) -> PartitionedSeenSketch:
    """Build per-bucket blooms with one ``applyInPandas`` pass over the
    seen table (group = bucket → sketch rows), merged on the driver.

    Driver traffic is just the serialized sketches (bytes per bucket),
    never the URLs.  ``num_bits``/``num_hashes`` are fixed per table so
    incremental per-batch sketches OR-merge with the running ones.
    """
    from pyspark.sql.types import (
        BinaryType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("bucket", IntegerType(), False),
            StructField("sketch", BinaryType(), False),
            StructField("n", LongType(), False),
        ]
    )

    def per_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
        urls = pdf[url_col].to_numpy(dtype=object)
        f = BloomFilter(num_bits, num_hashes)
        f.add_many(urls)
        return pd.DataFrame(
            {
                "bucket": [int(pdf[bucket_col].iloc[0])],
                "sketch": [f.to_bytes()],
                "n": [len(urls)],
            }
        )

    rows = seen_df.groupBy(bucket_col).applyInPandas(per_bucket, schema).collect()
    sk = PartitionedSeenSketch({r.bucket: bytes(r.sketch) for r in rows})
    sk.bucket_counts = {r.bucket: r.n for r in rows}
    return sk


def merge_sketches(
    base: PartitionedSeenSketch, delta: PartitionedSeenSketch
) -> PartitionedSeenSketch:
    """OR-merge two sketch sets (same num_bits/num_hashes per bucket)."""
    out = dict(base.raw)
    for bucket, raw in delta.raw.items():
        if bucket in out:
            f = BloomFilter.from_bytes(out[bucket])
            f.merge(BloomFilter.from_bytes(raw))
            out[bucket] = f.to_bytes()
        else:
            out[bucket] = raw
    return PartitionedSeenSketch(out)


# --- DataFrame-resident sketches (the 10^10-URL scale path) ----------
#
# At the design point (~12 GiB of bloom bits across P buckets) the
# sketch set must NOT live in a driver dict or a per-batch closure:
# it stays a (bucket, sketch) DataFrame on the executors, and both the
# candidate pre-filter and the per-batch merge are *cogrouped by
# bucket* — each task deserializes exactly the one bloom its bucket
# needs (asserted inside the UDFs), and only per-bucket counts ever
# reach the driver.


def empty_sketch_df(spark):
    return spark.createDataFrame([], "bucket int, sketch binary")


def merged_sketch_df(
    old_sketch_df,
    new_urls_df,
    num_bits: int = 1 << 20,
    num_hashes: int = 5,
):
    """(bucket, sketch, n_added) = ``old_sketch_df`` OR-merged with
    blooms of ``new_urls_df`` (url, bucket), built per bucket on
    executors via cogrouped applyInPandas.  Byte-identical to
    build-then-merge (bloom OR is order-free); the driver sees only
    the resulting DataFrame handle."""

    def merge(key, sk_pdf: pd.DataFrame, url_pdf: pd.DataFrame) -> pd.DataFrame:
        # invariant: one sketch row per bucket — per-task sketch bytes
        # are exactly one bucket's bloom
        if len(sk_pdf) > 1:
            raise AssertionError(
                f"bucket {key[0]}: {len(sk_pdf)} sketch rows (expected <= 1)"
            )
        if len(sk_pdf):
            f = BloomFilter.from_bytes(bytes(sk_pdf["sketch"].iloc[0]))
        else:
            f = BloomFilter(num_bits, num_hashes)
        urls = url_pdf["url"].to_numpy(dtype=object)
        if len(urls):
            f.add_many(urls)
        return pd.DataFrame(
            {
                "bucket": [int(key[0])],
                "sketch": [f.to_bytes()],
                "n_added": [len(urls)],
            }
        )

    return (
        old_sketch_df.groupBy("bucket")
        .cogroup(new_urls_df.select("url", "bucket").groupBy("bucket"))
        .applyInPandas(merge, "bucket int, sketch binary, n_added long")
    )


def maybe_seen_cogrouped(candidates, sketch_df, url_col: str = "url"):
    """Tag each candidate row ``maybe_seen`` ('y'/'n') by probing ONLY
    its bucket's bloom: candidates are cogrouped with the sketch table
    on ``bucket``, so a task holds one bucket's sketch at a time —
    never the whole set (the scale fix for closure-captured sketches).
    'n' rows are provably new (bloom: no false negatives)."""
    from pyspark.sql.types import StringType, StructField, StructType

    out_schema = StructType(
        list(candidates.schema.fields)
        + [StructField("maybe_seen", StringType(), False)]
    )
    cand_cols = [f.name for f in candidates.schema.fields]

    def check(key, cand_pdf: pd.DataFrame, sk_pdf: pd.DataFrame) -> pd.DataFrame:
        if len(sk_pdf) > 1:
            raise AssertionError(
                f"bucket {key[0]}: {len(sk_pdf)} sketch rows (expected <= 1)"
            )
        out = cand_pdf[cand_cols].copy()
        if len(sk_pdf):
            f = BloomFilter.from_bytes(bytes(sk_pdf["sketch"].iloc[0]))
            flags = f.might_contain_many(out[url_col].to_numpy(dtype=object))
        else:
            flags = np.zeros(len(out), dtype=bool)
        out["maybe_seen"] = np.where(flags, "y", "n")
        return out

    return (
        candidates.groupBy("bucket")
        .cogroup(sketch_df.select("bucket", "sketch").groupBy("bucket"))
        .applyInPandas(check, out_schema)
    )
