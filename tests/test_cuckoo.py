from __future__ import annotations

import numpy as np

from axora_spark.operators.cuckoo import CuckooFilter


def _keys(n, seed=3):
    rng = np.random.default_rng(seed)
    return np.unique(rng.integers(-2**63, 2**63 - 1, size=n, dtype=np.int64))


def test_no_false_negatives():
    keys = _keys(30_000)
    cf = CuckooFilter.sized(len(keys))
    assert cf.add_many(keys) == 0
    assert cf.contains_many(keys).all()


def test_fpr_reasonable():
    keys = _keys(30_000)
    other = np.setdiff1d(_keys(30_000, seed=9), keys)
    cf = CuckooFilter.sized(len(keys))
    cf.add_many(keys)
    fpr = cf.contains_many(other).mean()
    assert fpr < 0.01, fpr  # 16-bit fingerprints → ~2^-13 per probe


def test_delete_support():
    keys = _keys(5_000)
    cf = CuckooFilter.sized(len(keys))
    cf.add_many(keys)
    victims = keys[:1000]
    assert cf.delete_many(victims).all()
    # deleted keys gone (modulo fp collisions with survivors), rest intact
    assert cf.contains_many(keys[1000:]).all()
    assert cf.contains_many(victims).mean() < 0.02


def test_roundtrip_bytes():
    keys = _keys(2_000)
    cf = CuckooFilter.sized(len(keys))
    cf.add_many(keys)
    cf2 = CuckooFilter.from_bytes(cf.to_bytes())
    assert cf2.contains_many(keys).all()
    assert cf2.n_buckets == cf.n_buckets


def test_empty():
    cf = CuckooFilter.sized(100)
    assert cf.contains_many(np.array([], dtype=np.int64)).shape == (0,)
    assert not cf.contains_many(np.array([1, 2, 3], dtype=np.int64)).any()
