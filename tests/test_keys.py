"""Unit tests for the key/search primitives (utils/keys.py)."""

import jax.numpy as jnp
import numpy as np

from treensearch_tpu.utils import keys as K


def test_searchsorted_2word_matches_numpy():
    rng = np.random.default_rng(0)
    hi = np.sort(rng.integers(0, 50, 1000)).astype(np.int32)
    lo = rng.integers(0, 100, 1000).astype(np.int32)
    # make (hi, lo) lexicographically sorted
    comb = np.sort(hi.astype(np.int64) * 1000 + lo)
    hi = (comb // 1000).astype(np.int32)
    lo = (comb % 1000).astype(np.int32)
    q = rng.integers(-5, 55, 300).astype(np.int32)
    ql = rng.integers(-5, 105, 300).astype(np.int32)
    qcomb = q.astype(np.int64) * 1000 + ql
    for side in ("left", "right"):
        got = np.asarray(K.searchsorted_2word(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(q),
            jnp.asarray(ql), side))
        want = np.searchsorted(comb, qcomb, side=side)
        assert np.array_equal(got, want), side


def test_searchsorted_2word_empty():
    out = K.searchsorted_2word(jnp.zeros((0,), jnp.int32),
                               jnp.zeros((0,), jnp.int32),
                               jnp.array([3], jnp.int32),
                               jnp.array([4], jnp.int32), "left")
    assert np.array_equal(np.asarray(out), [0])


def _morton_ref(i, j, k, bits):
    out = 0
    for b in range(bits):
        out |= ((i >> b) & 1) << (3 * b)
        out |= ((j >> b) & 1) << (3 * b + 1)
        out |= ((k >> b) & 1) << (3 * b + 2)
    return out


def test_morton_keys_match_bitwise_reference():
    rng = np.random.default_rng(1)
    ijk = rng.integers(0, 1 << 20, (256, 3)).astype(np.int32)
    hi, lo = K.morton_keys_2word(jnp.asarray(ijk), bits=20)
    hi, lo = np.asarray(hi).astype(np.int64), np.asarray(lo).astype(np.int64)
    got = (hi << 30) | lo
    want = np.array([_morton_ref(int(i), int(j), int(k), 20)
                     for i, j, k in ijk], np.int64)
    assert np.array_equal(got, want)


def test_morton_order_groups_neighbors():
    # consecutive morton codes of a 2x2x2 block are contiguous
    ijk = np.array([[i, j, k] for k in range(2) for j in range(2)
                    for i in range(2)], np.int32)
    hi, lo = K.morton_keys_2word(jnp.asarray(ijk))
    codes = (np.asarray(hi).astype(np.int64) << 30) | np.asarray(lo)
    assert sorted(codes.tolist()) == list(range(8))


def test_quantize_clamps_to_grid():
    pts = jnp.array([[-1.0, 0.5, 2.0]], jnp.float32)
    ijk = K.quantize(pts, jnp.zeros(3, jnp.float32),
                     jnp.float32(10.0), jnp.array([8, 8, 8], jnp.int32))
    assert np.array_equal(np.asarray(ijk), [[0, 5, 7]])


def test_blocked_scans_match_numpy():
    from treensearch_tpu.ops.fastpath import _blocked_cummax, _blocked_cumsum
    rng = np.random.default_rng(4)
    for m in (1, 7, 128, 1000, 4097):
        x = rng.integers(0, 50, m).astype(np.int32)
        got = np.asarray(_blocked_cummax(jnp.asarray(x)))
        assert np.array_equal(got, np.maximum.accumulate(x)), m
        got_s = np.asarray(_blocked_cumsum(jnp.asarray(x)))
        assert np.array_equal(got_s, np.cumsum(x)), m
