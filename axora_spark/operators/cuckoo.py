"""Cuckoo filter over int64 url_hash keys — numpy-vectorized.

The north-star names a "bloom/cuckoo URL-seen" set: the Bloom shards
(operators/bloom.py) are the default fast path; this cuckoo filter is the
alternative with DELETE support — needed when a crawl wants to retire
seen-entries (e.g. recrawl windows) without rebuilding the filter.

Standard 4-way bucketized cuckoo filter (Fan et al., CoNEXT'14, public
algorithm): 16-bit fingerprints, two candidate buckets via partial-key
cuckoo hashing (bucket2 = bucket1 XOR hash(fingerprint)), BFS-free random
kick eviction with a bounded loop. Same shard-by-pmod deployment shape as
the Bloom (one filter per url_hash shard, broadcast dict).

False-positive policy is identical to the Bloom path: "maybe seen" rows
still pass through the exact anti-join — a false positive can never drop
a truly-unseen URL.
"""

from __future__ import annotations

import numpy as np

_FP_BITS = 16
_SLOTS = 4
_MAX_KICKS = 500


def _mix(h: np.ndarray, c1: int, c2: int) -> np.ndarray:
    z = h.copy()
    z ^= z >> np.uint64(30)
    z *= np.uint64(c1)
    z ^= z >> np.uint64(27)
    z *= np.uint64(c2)
    z ^= z >> np.uint64(31)
    return z


class CuckooFilter:
    __slots__ = ("n_buckets", "table", "_rng")

    def __init__(self, n_buckets: int, table: np.ndarray | None = None):
        # power-of-two buckets so the XOR trick stays in range
        self.n_buckets = 1 << int(np.ceil(np.log2(max(n_buckets, 2))))
        self.table = table if table is not None else np.zeros(
            (self.n_buckets, _SLOTS), dtype=np.uint16)  # 0 = empty
        self._rng = np.random.default_rng(42)  # deterministic kicks

    @classmethod
    def sized(cls, n_items: int, load: float = 0.84) -> "CuckooFilter":
        return cls(max(2, int(n_items / (_SLOTS * load)) + 1))

    # ---- hashing ----
    def _fingerprint(self, keys: np.ndarray) -> np.ndarray:
        h = keys.astype(np.int64).view(np.uint64)
        fp = (_mix(h, 0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9)
              & np.uint64(0xFFFF)).astype(np.uint16)
        fp[fp == 0] = 1  # reserve 0 for "empty"
        return fp

    def _bucket1(self, keys: np.ndarray) -> np.ndarray:
        h = _mix(keys.astype(np.int64).view(np.uint64),
                 0xFF51AFD7ED558CCD, 0xC4CEB9FE1A85EC53)
        return (h % np.uint64(self.n_buckets)).astype(np.int64)

    def _alt_bucket(self, bucket: np.ndarray, fp: np.ndarray) -> np.ndarray:
        fph = _mix(fp.astype(np.uint64),
                   0x9E3779B97F4A7C15, 0x94D049BB133111EB)
        return ((bucket.astype(np.uint64) ^ fph)
                % np.uint64(self.n_buckets)).astype(np.int64)

    # ---- operations ----
    def _insert_one(self, b1: int, fp: int) -> bool:
        b2 = int(self._alt_bucket(np.array([b1]), np.array([fp], dtype=np.uint16))[0])
        for b in (b1, b2):
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = fp
                return True
        # kick loop
        b = b1 if self._rng.integers(2) else b2
        cur = np.uint16(fp)
        for _ in range(_MAX_KICKS):
            slot = int(self._rng.integers(_SLOTS))
            cur, self.table[b, slot] = self.table[b, slot], cur
            b = int(self._alt_bucket(np.array([b]), np.array([cur]))[0])
            row = self.table[b]
            empty = np.where(row == 0)[0]
            if len(empty):
                row[empty[0]] = cur
                return True
        return False  # table too full

    def add_many(self, keys: np.ndarray) -> int:
        """Insert; returns number of failed inserts (0 when sized right)."""
        if len(keys) == 0:
            return 0
        fps = self._fingerprint(keys)
        b1s = self._bucket1(keys)
        failures = 0
        for b1, fp in zip(b1s.tolist(), fps.tolist()):
            if not self._insert_one(b1, fp):
                failures += 1
        return failures

    def contains_many(self, keys: np.ndarray) -> np.ndarray:
        if len(keys) == 0:
            return np.zeros(0, dtype=bool)
        fps = self._fingerprint(keys)
        b1 = self._bucket1(keys)
        b2 = self._alt_bucket(b1, fps)
        in1 = (self.table[b1] == fps[:, None]).any(axis=1)
        in2 = (self.table[b2] == fps[:, None]).any(axis=1)
        return in1 | in2

    def delete_many(self, keys: np.ndarray) -> np.ndarray:
        """Delete one copy per key; returns per-key success (the Bloom
        can't do this — the reason cuckoo exists here)."""
        out = np.zeros(len(keys), dtype=bool)
        if len(keys) == 0:
            return out
        fps = self._fingerprint(keys)
        b1s = self._bucket1(keys)
        b2s = self._alt_bucket(b1s, fps)
        for i, (b1, b2, fp) in enumerate(zip(b1s.tolist(), b2s.tolist(),
                                             fps.tolist())):
            for b in (b1, b2):
                row = self.table[b]
                hit = np.where(row == fp)[0]
                if len(hit):
                    row[hit[0]] = 0
                    out[i] = True
                    break
        return out

    # ---- serialization (broadcast transport, same shape as Bloom) ----
    def to_bytes(self) -> bytes:
        head = np.array([self.n_buckets], dtype=np.int64).tobytes()
        return head + self.table.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "CuckooFilter":
        n_buckets = int(np.frombuffer(raw[:8], dtype=np.int64)[0])
        table = np.frombuffer(raw[8:], dtype=np.uint16).reshape(
            n_buckets, _SLOTS).copy()
        return cls(n_buckets, table)
