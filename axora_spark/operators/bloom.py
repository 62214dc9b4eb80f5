"""Sharded Bloom filter over int64 url_hash keys — numpy-vectorized.

Why app-level (SURVEY.md §4.3 item 3): a single Bloom of 10^10 keys @1% FPR
is ~12 GB — unbroadcastable. We shard by `pmod(url_hash, n_shards)` aligned
with the frontier's bucket key, build each shard with `applyInPandas` over
the bucketed `seen` table (one shard = one group = one task), and broadcast
the shard dict. FPR policy: "maybe seen" rows still go through the exact
anti-join; a Bloom false positive can never drop a truly-unseen URL
(J1's authority is the exact join).

Hashing: double hashing g_i(x) = h1(x) + i*h2(x) (Kirsch–Mitzenmacher),
with h1/h2 derived from the stored xxhash64 key via splitmix64 finalizers —
pure numpy uint64 arithmetic, no Python loop over rows.
"""

from __future__ import annotations

import math

import numpy as np


def _mix(h: np.ndarray, c1: int, c2: int) -> np.ndarray:
    """splitmix64-style finalizer, vectorized over uint64."""
    z = h.copy()
    z ^= z >> np.uint64(30)
    z *= np.uint64(c1)
    z ^= z >> np.uint64(27)
    z *= np.uint64(c2)
    z ^= z >> np.uint64(31)
    return z


class Bloom:
    __slots__ = ("n_bits", "k", "bits")

    def __init__(self, n_bits: int, k: int, bits: np.ndarray | None = None):
        self.n_bits = int(n_bits)
        self.k = int(k)
        self.bits = bits if bits is not None else np.zeros(
            (self.n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized(cls, n_items: int, fpp: float = 0.01) -> "Bloom":
        n_items = max(n_items, 16)
        n_bits = max(64, int(-n_items * math.log(fpp) / (math.log(2) ** 2)))
        k = max(1, round(n_bits / n_items * math.log(2)))
        return cls(n_bits, k)

    def _positions(self, keys: np.ndarray) -> np.ndarray:
        """(len(keys), k) bit positions."""
        h = keys.astype(np.int64).view(np.uint64)
        h1 = _mix(h, 0xBF58476D1CE4E5B9, 0x94D049BB133111EB)
        h2 = _mix(h, 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53) | np.uint64(1)
        i = np.arange(self.k, dtype=np.uint64)[None, :]
        return ((h1[:, None] + i * h2[:, None]) % np.uint64(self.n_bits))

    def add_many(self, keys: np.ndarray) -> None:
        if len(keys) == 0:
            return
        pos = self._positions(keys).ravel()
        np.bitwise_or.at(self.bits, (pos >> np.uint64(3)).astype(np.int64),
                         (np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)))

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        pos = self._positions(keys)
        byte = self.bits[(pos >> np.uint64(3)).astype(np.int64)]
        bit = (byte >> (pos & np.uint64(7)).astype(np.uint8)) & np.uint8(1)
        return bit.all(axis=1)

    # serialization for broadcast / applyInPandas transport
    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.k], dtype=np.int64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "Bloom":
        n_bits, k = np.frombuffer(raw[:16], dtype=np.int64)
        bits = np.frombuffer(raw[16:], dtype=np.uint8).copy()
        return cls(int(n_bits), int(k), bits)
