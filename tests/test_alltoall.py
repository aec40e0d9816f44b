"""all_to_all owner-resharding (SURVEY §2 collectives row)."""

import jax.numpy as jnp
import numpy as np
import pytest

from diasss_tpu.parallel.alltoall import reshard_rows
from diasss_tpu.parallel.shard import make_mesh


def _run(K, n_dev, capacity=None, seed=0):
    rng = np.random.default_rng(seed)
    mesh = make_mesh(n_dev)
    vals = rng.standard_normal((K, 3)).astype(np.float32)
    keys = np.arange(K, dtype=np.int32)
    dest = rng.integers(0, n_dev, K).astype(np.int32)
    valid = rng.random(K) > 0.1
    tree = {"vals": jnp.asarray(vals), "key": jnp.asarray(keys)}
    out, vout, dropped = reshard_rows(
        mesh, tree, jnp.asarray(dest), jnp.asarray(valid), capacity=capacity
    )
    return mesh, vals, keys, dest, valid, out, np.asarray(vout), dropped


class TestReshardRows:
    def test_every_valid_row_lands_on_its_owner(self):
        n_dev = 8
        mesh, vals, keys, dest, valid, out, vout, dropped = _run(500, n_dev)
        assert dropped == 0
        block = vout.shape[0] // n_dev  # per-device output rows
        okeys = np.asarray(out["key"])
        ovals = np.asarray(out["vals"])
        seen = []
        for d in range(n_dev):
            sl = slice(d * block, (d + 1) * block)
            got = okeys[sl][vout[sl]]
            # everything on device d was destined for d
            assert np.all(dest[got] == d), d
            # values rode along intact
            np.testing.assert_array_equal(ovals[sl][vout[sl]], vals[got])
            seen.append(got)
        seen = np.sort(np.concatenate(seen))
        expect = np.sort(np.where(valid)[0])
        np.testing.assert_array_equal(seen, expect)  # exactly once each

    def test_overflow_is_counted_not_silent(self):
        _, _, _, dest, valid, _, vout, dropped = _run(512, 4, capacity=4, seed=1)
        # 512 rows over 4x4 lanes at capacity 4 must overflow
        assert dropped > 0
        assert int(vout.sum()) + dropped == int(valid.sum())

    def test_unaligned_row_count(self):
        mesh, vals, keys, dest, valid, out, vout, dropped = _run(501, 8, seed=2)
        assert dropped == 0
        okeys = np.asarray(out["key"])[vout]
        np.testing.assert_array_equal(
            np.sort(okeys), np.sort(np.where(valid)[0])
        )
