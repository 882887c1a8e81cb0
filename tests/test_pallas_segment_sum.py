"""Pallas sorted-segment-sum kernel tests (interpret mode on the CPU
platform; the same code path compiles via Mosaic on TPU — see bench.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.ops.pallas.segment_sum import (
    SEG_K,
    SEG_TILE,
    sorted_segment_sum_pallas,
)


def _case(e, n, seed=0, d=128):
    rng = np.random.default_rng(seed)
    dst = np.sort(rng.integers(0, n, e)).astype(np.int32)
    msg = rng.normal(size=(e, d)).astype(np.float32)
    return msg, dst


@pytest.mark.parametrize("e,n", [
    (SEG_K, 100),                  # single chunk, single tile
    (4 * SEG_K, 100),              # many chunks, dense runs
    (2 * SEG_K, SEG_TILE + 700),   # chunk shared across two output tiles
    (8 * SEG_K, 3 * SEG_TILE),     # sparse: most nodes absent
])
def test_matches_xla_segment_sum(e, n):
    msg, dst = _case(e, n)
    out = sorted_segment_sum_pallas(
        jnp.asarray(msg), jnp.asarray(dst), dst, n, interpret=True)
    ref = jax.ops.segment_sum(jnp.asarray(msg), jnp.asarray(dst),
                              num_segments=n, indices_are_sorted=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_single_giant_run():
    """All edges into one node (the sentinel-padding pattern)."""
    e, n = 4 * SEG_K, 50
    rng = np.random.default_rng(1)
    dst = np.full(e, n - 1, np.int32)
    msg = rng.normal(size=(e, 128)).astype(np.float32)
    out = np.asarray(sorted_segment_sum_pallas(
        jnp.asarray(msg), jnp.asarray(dst), dst, n, interpret=True))
    np.testing.assert_allclose(out[n - 1], msg.sum(axis=0), rtol=1e-4,
                               atol=1e-4)
    assert np.abs(out[: n - 1]).max() == 0.0


def test_every_edge_distinct_segment():
    """Degree-1 everywhere: runs of length 1, max compaction width."""
    e = 2 * SEG_K
    n = 3 * e
    dst = (np.arange(e) * 3).astype(np.int32)
    rng = np.random.default_rng(2)
    msg = rng.normal(size=(e, 128)).astype(np.float32)
    out = np.asarray(sorted_segment_sum_pallas(
        jnp.asarray(msg), jnp.asarray(dst), dst, n, interpret=True))
    np.testing.assert_allclose(out[dst], msg, rtol=1e-5, atol=1e-5)


def test_shape_validation():
    msg, dst = _case(SEG_K, 100)
    with pytest.raises(ValueError, match="not a multiple"):
        sorted_segment_sum_pallas(jnp.asarray(msg[:100]),
                                  jnp.asarray(dst[:100]), dst[:100], 100,
                                  interpret=True)
    with pytest.raises(ValueError, match="feature dim"):
        sorted_segment_sum_pallas(jnp.asarray(msg[:, :100]),
                                  jnp.asarray(dst), dst, 100, interpret=True)


def test_layer_with_explicit_pallas_impl(tiny_graph):
    """rgcn_layer_segment(impl='pallas') must match the dense oracle,
    including the 64-dim (lane-padded) aggregate-first path."""
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.ops.rgcn_dense import rgcn_layer_dense
    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment

    rng = np.random.default_rng(3)
    n, r, e = 70, 2, 1500
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=SEG_K)

    key = jax.random.PRNGKey(4)
    ks = jax.random.split(key, 3)
    params = {
        "w_rel": jax.random.normal(ks[0], (r, 64, 128)) * 0.1,
        "w_root": jax.random.normal(ks[1], (64, 128)) * 0.1,
        "bias": jax.random.normal(ks[2], (128,)) * 0.1,
    }
    x = jax.random.normal(jax.random.PRNGKey(5), (n, 64))

    out_pallas = rgcn_layer_segment(params, x, graph, impl="pallas")
    out_dense = rgcn_layer_dense(params, x, jnp.asarray(src),
                                 jnp.asarray(dst), jnp.asarray(rel), n, r)
    np.testing.assert_allclose(np.asarray(out_pallas), np.asarray(out_dense),
                               rtol=1e-4, atol=1e-4)


# ---------------------------------------------------------------------------
# dense_sorted_segment_sum: batch-dynamic sorted ids (sampled-path backward)
# ---------------------------------------------------------------------------

import pytest


@pytest.mark.parametrize("ln,n,dtype", [
    (1000, 700, "float32"),       # L not a multiple of K, N not either
    (4096, 512, "float32"),       # N == one tile exactly
    (2048, 3000, "bfloat16"),     # sparse ids (empty tiles)
    (513, 100, "bfloat16"),       # L = K + 1
    (100, 5000, "float32"),       # L << N (mostly empty tiles)
])
def test_dense_sorted_segment_sum_matches_xla(ln, n, dtype):
    from primekg_rgcn_tpu.ops.pallas.segment_sum import \
        dense_sorted_segment_sum

    rng = np.random.default_rng(ln + n)
    # include sentinel ids == n (must drop) and duplicates
    ids = np.sort(rng.integers(0, n + 1, ln)).astype(np.int32)
    msg = rng.standard_normal((ln, 64)).astype(np.float32)
    msg_j = jnp.asarray(msg).astype(dtype)

    out = dense_sorted_segment_sum(msg_j, jnp.asarray(ids), n)
    assert out.shape == (n, 64) and out.dtype == jnp.float32

    keep = ids < n
    ref = jax.ops.segment_sum(
        np.asarray(msg_j.astype(jnp.float32))[keep], ids[keep],
        num_segments=n)
    tol = 1e-5 if dtype == "float32" else 1e-6  # f32 split / exact bf16 acc
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=tol * 64)


def test_dense_sorted_segment_sum_one_giant_run():
    from primekg_rgcn_tpu.ops.pallas.segment_sum import \
        dense_sorted_segment_sum

    ln, n = 2048, 900
    msg = jnp.ones((ln, 64), jnp.bfloat16)
    ids = jnp.full((ln,), 7, jnp.int32)
    out = dense_sorted_segment_sum(msg, ids, n)
    ref = np.zeros((n, 64), np.float32)
    ref[7] = ln
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-6)
