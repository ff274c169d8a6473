"""Partitioned bloom sidecar for the URL-seen set (north rule).

The seen table is hash-bucketed by pmod(url_hash, B). Each bucket keeps
a bloom filter sidecar file (numpy bitset). Per crawl round:

  * build: the round's seen_delta is grouped by bucket and each group's
    hashes are OR-ed into that bucket's sidecar (applyInPandas — one
    Python task per bucket, Arrow-batched)
  * probe: candidate rows are grouped by the same bucket; rows whose
    identity *might* be in the bloom go on to the exact anti-join, rows
    that *definitely* aren't skip it

False positives only cost a redundant anti-join probe; false negatives
are impossible, so membership semantics stay exactly the reference's
(a bloom must never drop a URL — SURVEY.md F1).

At 10^10 URLs this is B≈4096 buckets × ~300 MB sidecars on shared
storage, each bucket's build/probe a partition-local task — no
concentration on one executor. The reference's seen set is a single
in-memory DashSet (memory_scheduler.rs:16); the bucketed bloom + exact
anti-join is the distributed restatement.

Hashing: k=7 bit positions derived from the 64-bit url_hash via
splitmix64 — deterministic, no wall clock, vectorized in numpy.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd

_K = 7  # hash functions
_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _splitmix64(x: np.ndarray) -> np.ndarray:
    x = (x + _GOLDEN).astype(np.uint64)
    z = x
    z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
    return z ^ (z >> np.uint64(31))


def _positions(hashes: np.ndarray, n_bits: int) -> np.ndarray:
    """(len(hashes), K) bit positions via double hashing h1 + i*h2."""
    h = hashes.astype(np.uint64)
    h1 = _splitmix64(h)
    h2 = _splitmix64(h1) | np.uint64(1)
    i = np.arange(_K, dtype=np.uint64)[None, :]
    return ((h1[:, None] + i * h2[:, None]) % np.uint64(n_bits)).astype(
        np.uint64
    )


class BloomSidecar:
    """One directory of per-bucket bitset files (bucket_<i>.npy)."""

    def __init__(self, root: str, n_buckets: int, bits_per_bucket: int):
        self.root = root
        self.n_buckets = n_buckets
        self.n_bits = bits_per_bucket
        os.makedirs(root, exist_ok=True)

    def _path(self, bucket: int) -> str:
        return os.path.join(self.root, f"bucket_{bucket:05d}.npy")

    def _load_words(self, bucket: int) -> np.ndarray:
        p = self._path(bucket)
        if os.path.exists(p):
            return np.load(p)
        return np.zeros((self.n_bits + 63) // 64, dtype=np.uint64)

    def add_bucket(self, bucket: int, hashes: np.ndarray) -> None:
        """OR new hashes into one bucket's bitset (atomic rename commit)."""
        words = self._load_words(bucket)
        pos = _positions(hashes, self.n_bits).ravel()
        np.bitwise_or.at(
            words, (pos >> np.uint64(6)).astype(np.int64),
            np.uint64(1) << (pos & np.uint64(63)),
        )
        tmp = self._path(bucket) + ".tmp.npy"
        np.save(tmp, words)
        os.replace(tmp, self._path(bucket))

    def might_contain_bucket(
        self, bucket: int, hashes: np.ndarray
    ) -> np.ndarray:
        """Vectorized membership test for one bucket."""
        p = self._path(bucket)
        if not os.path.exists(p):
            return np.zeros(len(hashes), dtype=bool)
        words = np.load(p)
        pos = _positions(hashes, self.n_bits)
        bits = (
            words[(pos >> np.uint64(6)).astype(np.int64)]
            >> (pos & np.uint64(63))
        ) & np.uint64(1)
        return bits.all(axis=1)

    # ---- DataFrame-level build / probe ----
    def update_from(self, seen_delta, bucket_col: str = "bucket") -> None:
        """Distributed build: one applyInPandas task per bucket."""
        root, n_bits, n_buckets = self.root, self.n_bits, self.n_buckets

        def _upd(pdf: pd.DataFrame) -> pd.DataFrame:
            side = BloomSidecar(root, n_buckets, n_bits)
            b = int(pdf[bucket_col].iloc[0])
            side.add_bucket(b, pdf["url_hash"].to_numpy(dtype=np.int64))
            return pd.DataFrame({"bucket": [b], "n": [len(pdf)]})

        seen_delta.groupBy(bucket_col).applyInPandas(
            _upd, "bucket INT, n BIGINT"
        ).collect()

    def split_candidates(self, candidates, key: str = "url_hash"):
        """Tag candidates with __maybe_seen via the sidecar.

        Returns the input plus a boolean __maybe_seen column; grouping by
        bucket keeps each bloom load partition-local."""
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        root, n_bits, n_buckets = self.root, self.n_bits, self.n_buckets
        # fresh StructType — StructType.add would mutate the DataFrame's
        # cached schema object
        tagged_schema = T.StructType(
            list(candidates.schema.fields)
            + [T.StructField("__maybe_seen", T.BooleanType())]
        )
        with_bucket = candidates.withColumn(
            "__bucket", F.pmod(F.col(key), F.lit(self.n_buckets)).cast("int")
        )

        def _probe(pdf: pd.DataFrame) -> pd.DataFrame:
            side = BloomSidecar(root, n_buckets, n_bits)
            b = int(pdf["__bucket"].iloc[0])
            maybe = side.might_contain_bucket(
                b, pdf[key].to_numpy(dtype=np.int64)
            )
            out = pdf.drop(columns=["__bucket"])
            out["__maybe_seen"] = maybe
            return out

        return with_bucket.groupBy("__bucket").applyInPandas(
            _probe, tagged_schema
        )
