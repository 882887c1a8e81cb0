"""Contiguous-window record fetch (ops/pallas/window_fetch.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.data.sampling import _window_pad


def _table(rng, e):
    ep = e + _window_pad(e)
    return jnp.asarray(rng.integers(
        -2**31, 2**31 - 1, (ep, 2), dtype=np.int64).astype(np.int32))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("e,f,m", [(5000, 8, 37), (3000, 48, 300),
                                   (100, 5, 1), (257, 40, 256 * 2 + 3)])
def test_window_rows_fetch_matches_slices(impl, e, f, m):
    from primekg_rgcn_tpu.ops.pallas.window_fetch import window_rows_fetch

    rng = np.random.default_rng(e + f + m)
    packed = _table(rng, e)
    starts = jnp.asarray(rng.integers(0, e, m).astype(np.int32))
    out = window_rows_fetch(packed, starts, f, impl=impl)
    assert out.shape == (m, f, 2)
    ref = np.stack([np.asarray(packed)[s:s + f]
                    for s in np.asarray(starts)])
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_window_rows_fetch_jit_composes():
    """The fetch must trace inside an outer jit (the sampled train step)."""
    from primekg_rgcn_tpu.ops.pallas.window_fetch import window_rows_fetch

    rng = np.random.default_rng(0)
    e = 500
    packed = jnp.asarray(rng.integers(
        0, 1000, (e + _window_pad(e), 2), dtype=np.int64).astype(np.int32))

    @jax.jit
    def f(starts):
        return window_rows_fetch(packed, starts, 8).sum()

    starts = jnp.asarray(rng.integers(0, e, 64).astype(np.int32))
    ref = sum(int(np.asarray(packed)[s:s + 8].sum())
              for s in np.asarray(starts))
    assert int(f(starts)) == ref


def test_window_rows_fetch_rejects_unpadded():
    from primekg_rgcn_tpu.ops.pallas.window_fetch import window_rows_fetch

    bad = jnp.zeros((1000, 2), jnp.int32)  # not whole 64-record granules
    with pytest.raises(ValueError, match="granule"):
        window_rows_fetch(bad, jnp.zeros((4,), jnp.int32), 8)


def test_window_fetch_smem_chunking(monkeypatch):
    """starts arrays beyond the SMEM scalar-prefetch capacity are split
    into multiple pallas_call chunks (a single 800K-starts call was a
    measured compile-time SMEM OOM on v5e: 3.2 MB > 1 MB); chunked output
    must equal the single-call path bit-for-bit."""
    import numpy as np
    import jax.numpy as jnp

    import primekg_rgcn_tpu.ops.pallas.window_fetch as wf

    rng = np.random.default_rng(0)
    e = 64 * 40
    packed = jnp.asarray(rng.integers(0, 2**20, (e, 2)).astype(np.int32))
    starts = jnp.asarray(rng.integers(0, e - 70, 300).astype(np.int32))
    ref = wf._xla_window_fetch(packed, starts, 6)
    monkeypatch.setattr(wf, "SMEM_STARTS", 64)  # force many chunks
    out = wf._pallas_window_fetch(packed, starts, 6)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(out))
