"""Broadcast Bloom filter over 64-bit URL hashes (D1 fast path).

The reference pays one sqlite lookup per request (middlewares.py:134-155) —
single-node, unscalable. Here the URL-seen fast path is a Bloom filter:

  build:  mapInPandas over the url_seen hash column -> one partial numpy
          bitmap per partition (vectorized bit ops) -> OR-reduce tiny byte
          blobs on the driver -> broadcast.
  probe:  vectorized pandas UDF 'might_contain' over the frontier hashes;
          rows that *might* be seen go through the exact anti-join, rows
          that definitely aren't skip it. At 10^10 URLs with a fresh-URL-
          heavy frontier this removes almost the whole shuffle.

Deletes (timestamp-invalidated crawl-once entries) can't be expressed in a
Bloom filter — that's the cuckoo filter's job (operators/cuckoo.py), or a
per-snapshot rebuild (the filter is derived state; rebuilding from the
url_seen table is one scan).

Hashing: double hashing h_i = h1 + i*h2 over the already-64-bit xxhash64
values (Kirsch-Mitzenmacher), all numpy-vectorized.
"""

from __future__ import annotations

import math
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import BooleanType


class BloomFilter:
    """Fixed-size bitmap with k double-hashed probes; mergeable via OR."""

    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None):
        self.n_bits = n_bits
        self.k = k
        self.bits = bits if bits is not None else np.zeros(n_bits // 8 + 1, dtype=np.uint8)

    @classmethod
    def sized_for(cls, n_items: int, fpp: float = 0.01) -> "BloomFilter":
        n_items = max(n_items, 1)
        n_bits = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(n_bits / n_items * math.log(2)))
        return cls(n_bits, k)

    def _positions(self, values: np.ndarray) -> np.ndarray:
        v = values.astype(np.uint64)
        h1 = v % np.uint64(self.n_bits)
        h2 = ((v >> np.uint64(33)) | np.uint64(1)) % np.uint64(self.n_bits)
        # (k, n) matrix of bit positions
        ks = np.arange(self.k, dtype=np.uint64)[:, None]
        return (h1[None, :] + ks * h2[None, :]) % np.uint64(self.n_bits)

    def add(self, values: np.ndarray) -> None:
        pos = self._positions(values).ravel()
        np.bitwise_or.at(self.bits, (pos >> 3).astype(np.int64), (1 << (pos & 7)).astype(np.uint8))

    def might_contain(self, values: np.ndarray) -> np.ndarray:
        if len(values) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(values)
        byte_idx = (pos >> 3).astype(np.int64)
        bit = (1 << (pos & 7)).astype(np.uint8)
        hits = (self.bits[byte_idx] & bit) != 0
        return hits.all(axis=0)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.k == other.k
        self.bits |= other.bits
        return self


def build_bloom(
    df: DataFrame, hash_col: str = "url_hash", n_items: int | None = None, fpp: float = 0.01
) -> BloomFilter:
    """Distributed build: per-partition partial bitmaps, OR-merged on driver.

    Each executor ships back only its bitmap (n_bits/8 bytes), not rows.
    """
    if n_items is None:
        n_items = df.count()
    proto = BloomFilter.sized_for(n_items, fpp)
    n_bits, k = proto.n_bits, proto.k

    def partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        bf = BloomFilter(n_bits, k)
        any_rows = False
        for pdf in batches:
            if len(pdf):
                any_rows = True
                bf.add(pdf.iloc[:, 0].to_numpy(dtype=np.int64))
        if any_rows:
            yield pd.DataFrame({"bits": [bf.bits.tobytes()]})

    parts = (
        df.select(F.col(hash_col).cast("long"))
        .mapInPandas(partials, "bits binary")
        .collect()
    )
    out = BloomFilter(n_bits, k)
    for row in parts:
        out.bits |= np.frombuffer(row["bits"], dtype=np.uint8)
    return out


def might_contain_udf(spark: SparkSession, bf: BloomFilter):
    """Broadcast the filter, return a vectorized might_contain column fn."""
    bcast = spark.sparkContext.broadcast((bf.n_bits, bf.k, bf.bits.tobytes()))

    @pandas_udf(BooleanType())
    def _might_contain(hashes: pd.Series) -> pd.Series:
        n_bits, k, blob = bcast.value
        local = BloomFilter(n_bits, k, np.frombuffer(blob, dtype=np.uint8))
        return pd.Series(local.might_contain(hashes.to_numpy(dtype=np.int64)))

    return _might_contain
