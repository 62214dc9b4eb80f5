from __future__ import annotations

import numpy as np

from axora_spark.operators.bloom import Bloom


def test_no_false_negatives():
    rng = np.random.default_rng(42)
    keys = rng.integers(-2**63, 2**63 - 1, size=50_000, dtype=np.int64)
    b = Bloom.sized(len(keys), fpp=0.01)
    b.add_many(keys)
    assert b.contains_many(keys).all()


def test_fpr_reasonable():
    rng = np.random.default_rng(7)
    keys = rng.integers(-2**63, 2**63 - 1, size=50_000, dtype=np.int64)
    other = rng.integers(-2**63, 2**63 - 1, size=50_000, dtype=np.int64)
    other = np.setdiff1d(other, keys)
    b = Bloom.sized(len(keys), fpp=0.01)
    b.add_many(keys)
    fpr = b.contains_many(other).mean()
    assert fpr < 0.03, fpr


def test_roundtrip_bytes():
    keys = np.arange(1000, dtype=np.int64) * 7919 - 500
    b = Bloom.sized(1000)
    b.add_many(keys)
    b2 = Bloom.from_bytes(b.to_bytes())
    assert b2.n_bits == b.n_bits and b2.k == b.k
    assert b2.contains_many(keys).all()


def test_empty():
    b = Bloom.sized(100)
    assert b.contains_many(np.array([], dtype=np.int64)).shape == (0,)
    assert not b.contains_many(np.array([1, 2, 3], dtype=np.int64)).any()
