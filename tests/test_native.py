"""Native C++ graph-builder tests: bit-identical output vs the numpy path."""

import numpy as np
import pytest

from primekg_rgcn_tpu import native
from primekg_rgcn_tpu.data.graph import build_rel_graph

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="no C++ toolchain")


def _random_edges(seed=0, n=200, r=3, e=3000, invalid=True):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    if invalid:
        # Sprinkle out-of-range ids that both paths must drop.
        bad = rng.choice(e, e // 50, replace=False)
        src[bad[: len(bad) // 2]] = n + 7
        dst[bad[len(bad) // 2:]] = -3
    return src, dst, rel, n, r


def test_native_matches_numpy_builder():
    src, dst, rel, n, r = _random_edges()
    g_np = build_rel_graph(src, dst, rel, n, r, use_native="never")
    g_cc = build_rel_graph(src, dst, rel, n, r, use_native="always")

    assert g_np.rel_offsets == g_cc.rel_offsets
    assert g_np.num_edges == g_cc.num_edges
    np.testing.assert_array_equal(np.asarray(g_np.src), np.asarray(g_cc.src))
    np.testing.assert_array_equal(np.asarray(g_np.dst), np.asarray(g_cc.dst))
    np.testing.assert_array_equal(np.asarray(g_np.t_src),
                                  np.asarray(g_cc.t_src))
    np.testing.assert_array_equal(np.asarray(g_np.t_dst),
                                  np.asarray(g_cc.t_dst))
    np.testing.assert_allclose(np.asarray(g_np.inv_in_deg),
                               np.asarray(g_cc.inv_in_deg))


def test_native_capacity_error():
    src, dst, rel, n, r = _random_edges(invalid=False)
    with pytest.raises(ValueError):
        build_rel_graph(src, dst, rel, n, r, use_native="always",
                        bucket_capacities=(1, 1, 1))


def test_native_rmat_statistics():
    g = native.rmat_native(num_nodes=2000, num_edges=50000, num_relations=4,
                           seed=3)
    assert g is not None
    assert g["src"].max() < 2000 and g["src"].min() >= 0
    assert g["dst"].max() < 2000
    assert np.bincount(g["rel"], minlength=4).min() > 0
    # Power-law degree skew.
    deg = np.bincount(g["dst"], minlength=2000)
    assert deg.max() > 10 * deg.mean()


def test_native_rmat_deterministic():
    a = native.rmat_native(1000, 10000, 3, seed=9)
    b = native.rmat_native(1000, 10000, 3, seed=9)
    np.testing.assert_array_equal(a["src"], b["src"])
    np.testing.assert_array_equal(a["dst"], b["dst"])
