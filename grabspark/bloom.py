"""J2 — sharded Bloom URL-seen prefilter (north-rule extension).

Advisory prefilter in front of the exact seen anti-join (J1): rows whose
key is definitely-not-seen skip the anti-join entirely (at scale: skip
the shuffle of the certain-new majority); "maybe seen" rows still flow
through the exact anti-join, so false positives can never drop URLs and
false negatives are impossible for inserted keys (SURVEY.md §2.7 J2).

Representation: the bit space is split into ``n_shards`` independent
numpy bit arrays.  Build is distributed — each partition emits its
partial per-shard bitmaps via mapInPandas, the driver ORs them (bitmap
OR is associative/commutative, so merge order is irrelevant) — and
membership runs map-side from a broadcast.  At 10^10-frontier scale the
same shards become per-bucket files co-partitioned with the seen table
(partitioned mode, keyed by pmod(hash(key), shards)) so no single node
ever holds the whole filter; broadcast mode is used while the filter fits
(config BloomConfig.n_bits).

Hashing: pandas' stable siphash (``pandas.util.hash_array``) with two
fixed hash keys, combined by double hashing — vectorized, deterministic
across processes/runs, no per-row Python.
"""

from __future__ import annotations

import os
from typing import Iterator

import numpy as np
import pandas as pd
from pandas.util import hash_array

_HK1 = "grabspark-hash-1"  # hash_key must be exactly 16 bytes
_HK2 = "grabspark-hash-2"


def key_hashes(keys: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    arr = keys.astype(str).to_numpy(dtype=object)
    h1 = hash_array(arr, hash_key=_HK1, categorize=False)
    h2 = hash_array(arr, hash_key=_HK2, categorize=False)
    return h1, h2 | np.uint64(1)  # odd step so double-hash cycles the space


class ShardedBloom:
    """Flat bitmap internally (vectorized O(n*k) membership with direct
    byte indexing — no per-shard loop); ``shards`` exposes equal-sized
    contiguous views for distributed build / merge / persistence."""

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 7, n_shards: int = 16):
        assert n_bits % (8 * n_shards) == 0
        self.n_bits = int(n_bits)
        self.n_hashes = int(n_hashes)
        self.n_shards = int(n_shards)
        self.shard_bits = self.n_bits // self.n_shards
        self._bits = np.zeros(self.n_bits // 8, dtype=np.uint8)

    @property
    def shards(self) -> list[np.ndarray]:
        sb = self.shard_bits // 8
        return [self._bits[i * sb : (i + 1) * sb] for i in range(self.n_shards)]

    @shards.setter
    def shards(self, arrays: list[np.ndarray]) -> None:
        self._bits = np.concatenate([np.asarray(a, dtype=np.uint8) for a in arrays])
        assert self._bits.size == self.n_bits // 8

    # -- positions -----------------------------------------------------------

    def _positions(self, keys: pd.Series) -> np.ndarray:
        """(n_hashes, n_keys) flat bit positions via double hashing —
        per-hash in-place ops, no large broadcast temporaries."""
        h1, h2 = key_hashes(keys)
        out = np.empty((self.n_hashes, len(h1)), dtype=np.uint64)
        nb = np.uint64(self.n_bits)
        for i in range(self.n_hashes):
            np.multiply(h2, np.uint64(i), out=out[i])
            out[i] += h1
            out[i] %= nb
        return out

    # -- local ops -----------------------------------------------------------

    def add(self, keys: pd.Series) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(
            self._bits, (pos >> np.uint64(3)).astype(np.int64), (1 << (pos & np.uint64(7))).astype(np.uint8)
        )

    def contains(self, keys: pd.Series) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)  # (k, n)
        hit = np.ones(pos.shape[1], dtype=bool)
        for i in range(self.n_hashes):
            p = pos[i]
            hit &= (
                self._bits[(p >> np.uint64(3)).astype(np.int64)]
                & (1 << (p & np.uint64(7))).astype(np.uint8)
            ) != 0
        return hit

    def or_merge(self, other: "ShardedBloom") -> None:
        assert (other.n_bits, other.n_shards) == (self.n_bits, self.n_shards)
        np.bitwise_or(self._bits, other._bits, out=self._bits)

    def fill_ratio(self) -> float:
        return int(np.unpackbits(self._bits).sum()) / self.n_bits

    # -- persistence (resume) ------------------------------------------------

    def save(self, dirpath: str) -> None:
        os.makedirs(dirpath, exist_ok=True)
        np.savez_compressed(
            os.path.join(dirpath, "bloom.npz"),
            meta=np.array([self.n_bits, self.n_hashes, self.n_shards], dtype=np.int64),
            **{f"s{i}": sh for i, sh in enumerate(self.shards)},
        )

    @classmethod
    def load(cls, dirpath: str) -> "ShardedBloom":
        z = np.load(os.path.join(dirpath, "bloom.npz"))
        n_bits, n_hashes, n_shards = (int(x) for x in z["meta"])
        b = cls(n_bits, n_hashes, n_shards)
        b.shards = [z[f"s{i}"].copy() for i in range(n_shards)]
        return b


# -- broadcast membership ----------------------------------------------------

def make_might_contain(spark, bl: "ShardedBloom"):
    """Broadcast the filter once and return an Arrow-batched membership
    UDF.  Reconstruction on the worker is zero-copy (frombuffer over the
    broadcast bytes)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import BooleanType

    payload = {"meta": (bl.n_bits, bl.n_hashes, bl.n_shards), "bits": bl._bits.tobytes()}
    bc = spark.sparkContext.broadcast(payload)

    @F.pandas_udf(BooleanType())
    def might(keys: pd.Series) -> pd.Series:
        import numpy as np

        p = bc.value
        b = ShardedBloom(*p["meta"])
        b._bits = np.frombuffer(p["bits"], dtype=np.uint8)
        return pd.Series(b.contains(keys))

    return might


# -- distributed build -------------------------------------------------------

def build_partials(keys_df, key_col: str, n_bits: int, n_hashes: int, n_shards: int):
    """mapInPandas stage: per input partition, emit (shard, bits) partial
    bitmaps.  Driver ORs them into the cumulative filter."""

    def gen(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        local = ShardedBloom(n_bits, n_hashes, n_shards)
        any_rows = False
        for pdf in it:
            if len(pdf):
                any_rows = True
                local.add(pdf[key_col])
        if any_rows:
            yield pd.DataFrame(
                {
                    "shard": list(range(n_shards)),
                    "bits": [sh.tobytes() for sh in local.shards],
                }
            )

    return keys_df.select(key_col).mapInPandas(gen, schema="shard int, bits binary")


def merge_partials_into(bloom: ShardedBloom, partial_rows: list) -> None:
    for row in partial_rows:
        arr = np.frombuffer(row["bits"], dtype=np.uint8)
        np.bitwise_or(bloom.shards[row["shard"]], arr, out=bloom.shards[row["shard"]])
