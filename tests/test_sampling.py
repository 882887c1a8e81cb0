"""Neighbor-sampling tests. The anchor: truncate-mode sampling with fanout >=
max in-degree must reproduce the full-graph encoder EXACTLY on the seeds."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from primekg_rgcn_tpu.config import ModelConfig
from primekg_rgcn_tpu.data.graph import build_rel_graph
from primekg_rgcn_tpu.data.sampling import build_csr_cache, sample_batch
from primekg_rgcn_tpu.models.rgcn import (
    encoder_apply,
    encoder_apply_sampled,
    init_params,
)


def _setup(seed=0, n=60, r=3, e=500):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    csr = build_csr_cache(graph)
    max_deg = int(max(np.asarray(c).max() for c in csr.row_count))
    return graph, cfg, params, csr, max_deg


def test_csr_cache_consistency():
    graph, _, _, csr, _ = _setup()
    # Every CSR row slice must hold exactly that node's in-neighbors.
    src_h, dst_h = np.asarray(graph.src), np.asarray(graph.dst)
    for r in range(graph.num_relations):
        s, e = graph.bucket_slice(r)
        starts = np.asarray(csr.row_start[r])
        counts = np.asarray(csr.row_count[r])
        col = np.asarray(csr.col[r])
        for v in [0, 5, 17, graph.num_nodes - 1]:
            expected = sorted(src_h[s:e][dst_h[s:e] == v].tolist())
            got = sorted(col[starts[v]:starts[v] + counts[v]].tolist())
            assert got == expected
        assert counts[graph.num_nodes] == 0  # sentinel row empty


def test_full_fanout_truncate_equals_full_graph():
    graph, cfg, params, csr, max_deg = _setup()
    seeds = jnp.asarray(np.arange(20, dtype=np.int32))
    batch = sample_batch(jax.random.PRNGKey(0), csr, seeds,
                         fanouts=[max_deg, max_deg], mode="truncate")
    out_sampled = encoder_apply_sampled(params, batch, cfg)
    out_full = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out_sampled),
                               np.asarray(out_full)[:20],
                               rtol=1e-4, atol=1e-5)


def test_uniform_sampling_is_unbiased_estimate():
    """Average of many uniform-sampled encodings approaches the full-graph
    encoding for a single-layer readout."""
    graph, cfg, params, csr, max_deg = _setup(e=800)
    seeds = jnp.asarray(np.arange(10, dtype=np.int32))

    full = encoder_apply(params, graph, cfg)[:10]

    outs = []
    key = jax.random.PRNGKey(1)
    for i in range(64):
        key, k = jax.random.split(key)
        batch = sample_batch(k, csr, seeds, fanouts=[max_deg, 4],
                             mode="uniform")
        outs.append(np.asarray(encoder_apply_sampled(params, batch, cfg)))
    mean = np.mean(outs, axis=0)
    # Layer-2 full fanout + layer-1 sampled: the *expectation* matches; with
    # 64 draws we ask for a loose statistical tolerance.
    err = np.abs(mean - np.asarray(full)).max()
    scale = np.abs(np.asarray(full)).max()
    assert err < 0.25 * scale, (err, scale)


def test_sampled_shapes_static_and_jittable():
    graph, cfg, params, csr, _ = _setup()
    seeds = jnp.asarray(np.arange(16, dtype=np.int32))

    @jax.jit
    def run(params, key):
        batch = sample_batch(key, csr, seeds, fanouts=[5, 3], mode="uniform")
        return encoder_apply_sampled(params, batch, cfg)

    o1 = run(params, jax.random.PRNGKey(0))
    o2 = run(params, jax.random.PRNGKey(1))
    assert o1.shape == (16, cfg.hidden_dim)
    assert not np.allclose(np.asarray(o1), np.asarray(o2))  # different draws


def test_zero_degree_and_sentinel_seeds():
    graph, cfg, params, csr, _ = _setup()
    # Seed list padded with the sentinel id must yield exact zeros there.
    seeds = jnp.asarray([0, 1, graph.num_nodes, graph.num_nodes],
                        dtype=jnp.int32)
    batch = sample_batch(jax.random.PRNGKey(0), csr, seeds, fanouts=[4, 4],
                         mode="truncate")
    out = np.asarray(encoder_apply_sampled(params, batch, cfg))
    assert np.abs(out[2:]).max() == 0.0
    assert np.abs(out[:2]).max() > 0.0


def test_sampled_training_step_learns():
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer

    graph, cfg, params, csr, _ = _setup(e=800)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    opt = make_optimizer(tcfg)
    step = build_sampled_train_step(csr, cfg, tcfg, opt, fanouts=[5, 3])

    rng = np.random.default_rng(0)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    losses = []
    key = jax.random.PRNGKey(0)
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    for i in range(15):
        key, k = jax.random.split(key)
        idx = rng.integers(0, len(edges), tcfg.batch_size)
        state, (loss, acc) = step(state, jnp.asarray(edges[idx]), k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


# -- combined-neighborhood layout (relation-sparse graphs) --------------------

def _setup_sparse(seed=0, n=80, r=12, e=700):
    """Many relations, few edges each: avg present relations per node << R."""
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.0)
    params = init_params(jax.random.PRNGKey(seed), cfg)
    from primekg_rgcn_tpu.data.sampling import build_combined_csr

    ccsr = build_combined_csr(graph)
    max_total = int(np.asarray(ccsr.deg_total).max())
    return graph, cfg, params, ccsr, max_total


def test_combined_full_budget_truncate_equals_full_graph():
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    graph, cfg, params, ccsr, max_total = _setup_sparse()
    seeds = jnp.asarray(np.arange(25, dtype=np.int32))
    batch = sample_batch_combined(jax.random.PRNGKey(0), ccsr, seeds,
                                  budgets=[max_total, max_total],
                                  mode="truncate")
    out_sampled = encoder_apply_sampled(params, batch, cfg)
    out_full = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out_sampled),
                               np.asarray(out_full)[:25],
                               rtol=1e-4, atol=1e-5)


def test_ident_mode_matches_dedup():
    """allow_ident=True (near-saturated innermost frontier -> gather
    straight from the table, no dedup) must produce the same picks, the
    same forward embeddings, and the same gradients as the deduplicated
    path — identity is a memory/throughput layout, not a semantics
    change."""
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    graph, cfg, params, ccsr, _ = _setup_sparse()
    seeds = jnp.asarray(np.arange(30, dtype=np.int32))
    key = jax.random.PRNGKey(7)
    b_id = sample_batch_combined(key, ccsr, seeds, (8, 8),
                                 allow_ident=True)
    b_no = sample_batch_combined(key, ccsr, seeds, (8, 8))
    assert b_id.blocks[0].ident and not b_no.blocks[0].ident
    assert b_id.frontier is None
    # Same RNG -> same sampled multiset; ident keeps global ids while the
    # dedup block remaps through its unique table.
    uniq = np.asarray(b_no.frontier)
    np.testing.assert_array_equal(
        np.asarray(b_id.blocks[0].src_local),
        uniq[np.asarray(b_no.blocks[0].src_local)])
    np.testing.assert_array_equal(np.asarray(b_id.blocks[0].rel_tag),
                                  np.asarray(b_no.blocks[0].rel_tag))
    np.testing.assert_array_equal(np.asarray(b_id.blocks[0].slot_w),
                                  np.asarray(b_no.blocks[0].slot_w))

    def loss(p, b):
        emb = encoder_apply_sampled(p, b, cfg)
        return (emb * emb).sum()

    np.testing.assert_allclose(float(loss(params, b_id)),
                               float(loss(params, b_no)),
                               rtol=1e-6)
    g_id = jax.grad(lambda p: loss(p, b_id))(params)
    g_no = jax.grad(lambda p: loss(p, b_no))(params)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6),
        g_id, g_no)


def test_dedup_gather_bwd_kernel_path(monkeypatch):
    """dedup_gather/table_gather_sorted backwards route through the dense
    Pallas kernel above the size threshold — force the threshold down and
    check gradients stay identical to the XLA segment-sum path."""
    import primekg_rgcn_tpu.data.sampling as S

    graph, cfg, params, ccsr, _ = _setup_sparse()
    seeds = jnp.asarray(np.arange(16, dtype=np.int32))
    b = S.sample_batch_combined(jax.random.PRNGKey(3), ccsr, seeds, (5, 4))

    def loss(p):
        emb = encoder_apply_sampled(p, b, cfg)
        return (emb * emb).sum()

    g_xla = jax.grad(loss)(params)
    monkeypatch.setattr(S, "_DENSE_SEG_MIN_SEGMENTS", 1)
    g_ker = jax.grad(loss)(params)
    jax.tree_util.tree_map(
        lambda a, c: np.testing.assert_allclose(
            np.asarray(a), np.asarray(c), rtol=1e-5, atol=1e-6),
        g_xla, g_ker)


def test_rowwise_impl_agrees_and_guards(monkeypatch):
    """The rowwise reduction (sorted per-row tags) must agree with the
    default einsum path; a block sampled FOR einsum (tag sort skipped)
    must be rejected by the order-dependent impls with a clear error."""
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    graph, cfg, params, ccsr, _ = _setup_sparse()
    seeds = jnp.asarray(np.arange(20, dtype=np.int32))
    key = jax.random.PRNGKey(11)

    b_e = sample_batch_combined(key, ccsr, seeds, (6, 5))
    out_e = np.asarray(encoder_apply_sampled(params, b_e, cfg))

    monkeypatch.setenv("PRIMEKG_COMBINED_AGG", "rowwise")
    b_r = sample_batch_combined(key, ccsr, seeds, (6, 5))
    assert b_r.blocks[0].tags_sorted and not b_e.blocks[0].tags_sorted
    out_r = np.asarray(encoder_apply_sampled(params, b_r, cfg))
    np.testing.assert_allclose(out_r, out_e, rtol=1e-4, atol=1e-5)

    # Cross-impl misuse: einsum-sampled block into the rowwise reduction.
    import pytest
    with pytest.raises(ValueError, match="PRIMEKG_COMBINED_AGG"):
        encoder_apply_sampled(params, b_e, cfg)


def test_sparse_emb_adafactor_table():
    """table_opt='adafactor': factored second moment ([N] + [D] state, not
    2x [N, D]) drives the table adaptively in the sparse-emb step — and
    actually learns where plain SGD's Xavier-over-N gradient scale stalls."""
    import optax

    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.loop import TrainState
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step

    graph, cfg, params, ccsr, _ = _setup_sparse()
    tcfg = TrainConfig(batch_size=32, lr=0.05)
    step = build_sampled_train_step(ccsr, cfg, tcfg, optax.adam(1e-2),
                                    fanouts=(5, 4), sparse_emb=True,
                                    table_opt="adafactor")
    state = step.init_state(params)
    # Factored: some state leaf must be [N]-shaped (v_row), none [N, D]x2.
    leaves = jax.tree_util.tree_leaves(state.opt_state[1])
    n = cfg.num_nodes
    assert any(lf.shape == (n,) for lf in leaves if hasattr(lf, "shape"))
    big = [lf for lf in leaves
           if getattr(lf, "shape", ()) == (n, cfg.embedding_dim)]
    assert len(big) == 0, "second moment must be factored, not dense"

    # Snapshot before stepping: the step donates its input state, so the
    # original param buffers are deleted after the first call.
    emb0 = np.array(params["encoder"]["node_emb"])

    rng = np.random.default_rng(0)
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph
    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(120):
        key, k = jax.random.split(key)
        idx = rng.integers(0, len(edges), tcfg.batch_size)
        state, (loss, _) = step(state, jnp.asarray(edges[idx]), k)
        losses.append(float(loss))
    assert np.mean(losses[-10:]) < np.mean(losses[:10]) - 0.01, (
        losses[:10], losses[-10:])
    # The table itself moved (not just the rest params).
    d = np.abs(np.asarray(state.params["encoder"]["node_emb"]) - emb0).max()
    assert d > 1e-4

    import pytest
    with pytest.raises(ValueError, match="requires sparse_emb"):
        build_sampled_train_step(ccsr, cfg, tcfg, optax.adam(1e-2),
                                 fanouts=(5, 4), table_opt="adafactor")


def test_sampled_trainer_adafactor_resume(tmp_path):
    """SampledTrainer with table_opt='adafactor': the tuple opt_state
    (rest adam state, factored table state) must round-trip through the
    checkpoint save/resume path."""
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph
    from primekg_rgcn_tpu.train.sampled import SampledTrainer

    graph, cfg, params, ccsr, _ = _setup_sparse()
    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    tcfg = TrainConfig(batch_size=64, lr=0.05, epochs=2, optimizer="adam",
                       grad_clip=0.0)
    t = SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:100],
                       tmp_path / "out", fanouts=(5, 4), sparse_emb=True,
                       table_opt="adafactor")
    hist = t.train()
    assert len(hist["val_losses"]) == 2

    t2 = SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:100],
                        tmp_path / "out2", fanouts=(5, 4), sparse_emb=True,
                        table_opt="adafactor")
    ck = sorted((tmp_path / "out" / "models").glob("*.msgpack"))
    assert ck
    t2.resume(str(ck[-1])[:-len(".msgpack")])
    # Factored table state restored with its structure intact.
    leaves = jax.tree_util.tree_leaves(t2.state.opt_state[1])
    assert any(getattr(lf, "shape", None) == (cfg.num_nodes,)
               for lf in leaves)


def test_combined_uniform_is_unbiased_estimate():
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    graph, cfg, params, ccsr, _ = _setup_sparse()
    seeds = jnp.asarray(np.arange(12, dtype=np.int32))
    full = np.asarray(encoder_apply(params, graph, cfg))[:12]

    @jax.jit
    def one(key):
        b = sample_batch_combined(key, ccsr, seeds, budgets=[24, 24],
                                  mode="uniform")
        return encoder_apply_sampled(params, b, cfg)

    keys = jax.random.split(jax.random.PRNGKey(3), 300)
    avg = np.mean([np.asarray(one(k)) for k in keys], axis=0)
    # ReLU between layers makes the 2-layer composition only approximately
    # unbiased (like every sampled GNN); the estimate must still sit close.
    err = np.abs(avg - full).max() / (np.abs(full).max() + 1e-9)
    assert err < 0.25, f"relative deviation {err:.3f}"


def test_resolve_sampler_auto_layout():
    from primekg_rgcn_tpu.data.sampling import CombinedCsr, CsrCache
    from primekg_rgcn_tpu.train.sampled import resolve_sampler

    dense_graph, *_ = _setup()          # 3 relations, dense per-relation
    sparse_graph, *_ = _setup_sparse()  # 12 relations, sparse
    csr_d, fan_d, comb_d = resolve_sampler(dense_graph, (4, 4), "auto")
    assert isinstance(csr_d, CsrCache) and not comb_d and fan_d == (4, 4)
    csr_s, budgets, comb_s = resolve_sampler(sparse_graph, (4, 4), "auto")
    assert isinstance(csr_s, CombinedCsr) and comb_s
    assert all(b % 8 == 0 and b >= 4 for b in budgets)


def test_combined_training_step_learns():
    from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step
    from primekg_rgcn_tpu.config import TrainConfig

    rng = np.random.default_rng(1)
    n, r, e = 80, 12, 700
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8)
    tcfg = TrainConfig(batch_size=64, lr=5e-2)
    opt = make_optimizer(tcfg)
    params = init_params(jax.random.PRNGKey(0), cfg)
    step = build_sampled_train_step(graph, cfg, tcfg, opt, fanouts=(6, 6),
                                    layout="combined")
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    edges = jnp.asarray(np.stack([src, dst, rel], 1).astype(np.int32))
    key = jax.random.PRNGKey(0)
    losses = []
    for i in range(30):
        key, k = jax.random.split(key)
        bi = jax.random.randint(k, (64,), 0, e)
        state, (loss, acc) = step(state, jnp.take(edges, bi, axis=0), k)
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_sampled_dp_step_learns_and_scales_batch():
    """Data-parallel sampled step over the 8-device mesh: runs, learns, and
    each device consumes only its B/n seed slice (per-relation layout)."""
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step_dp

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs multi-device platform")

    graph, cfg, params, csr, _ = _setup(e=800)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    opt = make_optimizer(tcfg)
    mesh = make_mesh(len(jax.devices()))
    step = build_sampled_train_step_dp(csr, cfg, tcfg, opt, mesh,
                                       fanouts=[5, 3])

    rng = np.random.default_rng(0)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    losses = []
    key = jax.random.PRNGKey(0)
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    for i in range(15):
        key, k = jax.random.split(key)
        idx = rng.integers(0, len(edges), tcfg.batch_size)
        state, (loss, acc) = step(state, jnp.asarray(edges[idx]), k)
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_sampled_dp_step_combined_layout_runs():
    """DP sampled step with the combined (relation-sparse) layout."""
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step_dp

    if len(jax.devices()) < 2:
        import pytest
        pytest.skip("needs multi-device platform")

    graph, cfg, params, ccsr, _ = _setup_sparse()
    tcfg = TrainConfig(batch_size=32, lr=1e-2)
    opt = make_optimizer(tcfg)
    mesh = make_mesh(len(jax.devices()))
    step = build_sampled_train_step_dp(ccsr, cfg, tcfg, opt, mesh,
                                       fanouts=[4, 3])

    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    rng = np.random.default_rng(1)
    state = TrainState(params, opt.init(params), jnp.zeros((), jnp.int32))
    key = jax.random.PRNGKey(2)
    for i in range(3):
        key, k = jax.random.split(key)
        idx = rng.integers(0, len(edges), tcfg.batch_size)
        state, (loss, acc) = step(state, jnp.asarray(edges[idx]), k)
        assert np.isfinite(float(loss))


@pytest.mark.parametrize("opt_kw", [
    dict(optimizer="adam", grad_clip=1.0),
    dict(optimizer="adamw", weight_decay=1e-4, grad_clip=0.5),
])
def test_sampled_zero1_matches_dp_exactly(opt_kw):
    """ZeRO-1 (embedding optimizer state sharded over the mesh) must
    reproduce the unsharded DP update: same RNG draws, grads psummed the
    same way, per-slice Adam == full-table Adam (elementwise; weight decay
    included — it only reads the slice's own params), global-norm clip
    computed on the full pytree before splitting."""
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.loop import TrainState, make_optimizer
    from primekg_rgcn_tpu.train.sampled import (
        build_sampled_train_step_dp,
        build_sampled_train_step_zero1,
    )

    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")

    graph, cfg, params, csr, _ = _setup(e=800)
    tcfg = TrainConfig(batch_size=64, lr=1e-2, **opt_kw)
    opt = make_optimizer(tcfg)
    mesh = make_mesh(len(jax.devices()))
    step_dp = build_sampled_train_step_dp(csr, cfg, tcfg, opt, mesh,
                                          fanouts=[5, 3])
    init_z1, step_z1 = build_sampled_train_step_zero1(csr, cfg, tcfg, mesh,
                                                      fanouts=[5, 3])

    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    rng = np.random.default_rng(3)
    s1 = TrainState(jax.tree_util.tree_map(jnp.copy, params),
                    opt.init(params), jnp.zeros((), jnp.int32))
    s2 = init_z1(jax.tree_util.tree_map(jnp.copy, params))
    key = jax.random.PRNGKey(5)
    for i in range(4):
        key, k = jax.random.split(key)
        idx = rng.integers(0, len(edges), tcfg.batch_size)
        batch = jnp.asarray(edges[idx])
        s1, (l1, _) = step_dp(s1, batch, k)
        s2, (l2, _) = step_z1(s2, batch, k)
        assert float(l1) == pytest.approx(float(l2), rel=1e-6)
    for p1, p2 in zip(jax.tree_util.tree_leaves(s1.params),
                      jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(p1), np.asarray(p2),
                                   rtol=2e-5, atol=2e-6)


def test_sampled_trainer_resume_continues_history(tmp_path):
    """SampledTrainer.resume restores state/epoch/history (incl. ZeRO-1's
    nested optimizer-state pytree) and continues where it stopped."""
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.sampled import SampledTrainer

    graph, cfg, params, csr, _ = _setup(e=800)
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)[:400]
    n_dev = len(jax.devices())

    tcfg2 = TrainConfig(batch_size=64, lr=1e-2, epochs=2)
    t1 = SampledTrainer(cfg, tcfg2, graph, graph, edges[:320], edges[320:],
                        tmp_path / "run1", fanouts=(5, 3),
                        n_devices=n_dev if n_dev > 1 else None,
                        zero1=n_dev > 1)
    t1.train()
    assert len(t1.history["train_losses"]) == 2

    tcfg3 = TrainConfig(batch_size=64, lr=1e-2, epochs=3)
    t2 = SampledTrainer(cfg, tcfg3, graph, graph, edges[:320], edges[320:],
                        tmp_path / "run2", fanouts=(5, 3),
                        n_devices=n_dev if n_dev > 1 else None,
                        zero1=n_dev > 1)
    t2.resume(tmp_path / "run1" / "models" / "final_model")
    assert t2.start_epoch == 2
    t2.train()
    # 2 restored + 1 new epoch of history.
    assert len(t2.history["train_losses"]) == 3


def test_zero1_checkpoint_loads_without_template(tmp_path):
    """checkpoint.load must restore a ZeRO-1 checkpoint (non-default
    opt_state structure) with example_state=None — the evaluate/analyze
    path — falling back to template-free restore for params."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train import checkpoint as ckpt_lib
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step_zero1

    graph, cfg, params, csr, _ = _setup(e=800)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    mesh = make_mesh(len(jax.devices()))
    init_z1, step = build_sampled_train_step_zero1(csr, cfg, tcfg, mesh,
                                                   fanouts=[5, 3])
    st = init_z1(params)
    ckpt_lib.save(tmp_path / "z1", {
        "epoch": 1, "state": st, "best_val_loss": 1.0, "best_val_acc": 0.0,
        "history": {}, "model_config": cfg.to_dict(),
        "train_config": tcfg.to_dict()})
    payload = ckpt_lib.load(tmp_path / "z1")
    restored = payload["state"].params
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("layout", ["combined", "per-relation"])
def test_sparse_emb_step_matches_dense(layout):
    """sparse_emb=True (frontier-row grads + unique-row scatter SGD) must
    reproduce the dense step exactly: same RNG streams, same math, only the
    dense [N, D] table gradient/update is structurally eliminated."""
    import optax

    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.loop import TrainState
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step

    rng = np.random.default_rng(7)
    n, r, e = 60, 10, 500
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.3)
    tcfg = TrainConfig(batch_size=32, lr=1e-2)
    opt = optax.sgd(tcfg.lr)
    params = init_params(jax.random.PRNGKey(0), cfg)
    edges = jnp.asarray(np.stack([src, dst, rel], 1).astype(np.int32))

    finals = []
    for sparse in (False, True):
        step = build_sampled_train_step(graph, cfg, tcfg, opt,
                                        fanouts=(5, 5), layout=layout,
                                        sparse_emb=sparse)
        # The step donates its state; give each run its own copy.
        p0 = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True),
                                    params)
        st = TrainState(p0, opt.init(p0), jnp.zeros((), jnp.int32))
        key = jax.random.PRNGKey(4)
        for i in range(4):
            key, k, kb = jax.random.split(key, 3)
            bi = jax.random.randint(kb, (32,), 0, e)
            st, (loss, _) = step(st, edges[bi], k)
        assert np.isfinite(float(loss))
        finals.append(st)
    dense, sparse_st = finals
    for a, b in zip(jax.tree_util.tree_leaves(dense.params),
                    jax.tree_util.tree_leaves(sparse_st.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)


def test_zero3_matches_zero1():
    """Fully-sharded-table step == ZeRO-1 step (same RNG streams, global
    mean, clip) up to reduction order: the psum_scatter fetch + transpose
    exchange must be semantically invisible."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.sampled import (
        build_sampled_train_step_zero1, build_sampled_train_step_zero3)

    rng = np.random.default_rng(1)
    n, r, e = 90, 12, 800
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.3)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    edges = jnp.asarray(np.stack([src, dst, rel], 1).astype(np.int32))
    mesh = make_mesh(len(jax.devices()))

    init1, step1 = build_sampled_train_step_zero1(
        graph, cfg, tcfg, mesh, fanouts=(5, 4))
    init3, step3, to_full, _ = build_sampled_train_step_zero3(
        graph, cfg, tcfg, mesh, fanouts=(5, 4))

    def run(init, step, to_full_fn):
        p0 = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True),
                                    params)
        st = init(p0)
        key = jax.random.PRNGKey(9)
        for _ in range(4):
            key, k, kb = jax.random.split(key, 3)
            bi = jax.random.randint(kb, (64,), 0, e)
            st, (loss, _) = step(st, edges[bi], k)
        assert np.isfinite(float(loss))
        emb = st.params["encoder"]["node_emb"]
        if to_full_fn is not None:
            emb = to_full_fn(emb)
        return emb, st.params["decoder"]["rel_emb"], \
            st.params["encoder"]["conv1"]["w_root"]

    outs1 = run(init1, step1, None)
    outs3 = run(init3, step3, to_full)
    for a, b in zip(outs1, outs3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6)


def test_zero3_trainer_roundtrip(tmp_path):
    """SampledTrainer zero3: train -> checkpoint stores the FULL table
    (one-step eval contract) -> resume re-shards and continues."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train import checkpoint as ckpt_lib
    from primekg_rgcn_tpu.train.sampled import SampledTrainer

    rng = np.random.default_rng(3)
    n, r, e = 70, 10, 600
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    tcfg = TrainConfig(batch_size=64, lr=1e-2, epochs=2)
    n_dev = len(jax.devices())
    t = SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:64],
                       tmp_path / "out", fanouts=(4, 3), n_devices=n_dev,
                       zero3=True)
    t.train()
    # The saved table must be full-shape (evaluate/analyze load it as-is).
    payload = ckpt_lib.load(tmp_path / "out" / "models" / "final_model")
    assert payload["state"].params["encoder"]["node_emb"].shape == (n, 8)
    # Resume continues with the sharded leaf restored.
    tcfg2 = TrainConfig(batch_size=64, lr=1e-2, epochs=3)
    t2 = SampledTrainer(cfg, tcfg2, graph, graph, edges, edges[:64],
                        tmp_path / "out2", fanouts=(4, 3), n_devices=n_dev,
                        zero3=True)
    t2.resume(tmp_path / "out" / "models" / "final_model")
    hist = t2.train()
    assert len(hist["train_losses"]) == 3
    assert t2.state.params["encoder"]["node_emb"].ndim == 3


def test_sampled_eval_epoch_masks_padding():
    """build_sampled_eval_epoch: exact mask-weighted totals — an epoch over
    k edges equals the same epoch with extra padding rows."""
    import optax  # noqa: F401

    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.sampled import build_sampled_eval_epoch

    graph, cfg, params, ccsr, _ = _setup_sparse()
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)[:100]
    # batch 32 over 100 edges -> 4 steps with 28 masked slots in the last.
    tcfg = TrainConfig(batch_size=32)
    ev = build_sampled_eval_epoch(ccsr, edges, cfg, tcfg, fanouts=(6, 4),
                                  mode="truncate")
    loss, acc = ev(params, jax.random.PRNGKey(0))
    assert np.isfinite(float(loss)) and 0.0 <= float(acc) <= 1.0
    # Determinism: same key -> identical result.
    loss2, acc2 = ev(params, jax.random.PRNGKey(0))
    assert float(loss) == float(loss2) and float(acc) == float(acc2)


def test_zero3_val_sampled_trainer(tmp_path):
    """SampledTrainer(zero3, val_sampled): validation runs the sharded
    sampled eval twin — no full table materializes — and produces finite
    history."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.sampled import SampledTrainer

    rng = np.random.default_rng(5)
    n, r, e = 70, 10, 600
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    tcfg = TrainConfig(batch_size=64, lr=1e-2, epochs=2)
    t = SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:100],
                       tmp_path / "out", fanouts=(4, 3),
                       n_devices=len(jax.devices()), zero3=True,
                       val_sampled=True)
    hist = t.train()
    assert len(hist["val_losses"]) == 2
    assert np.isfinite(hist["val_losses"]).all()


def test_combined_csr_edge_annotations():
    """Slim layout: ONE packed int32[E, 2] record per edge — src id in
    column 0, (rel << 16 | f16 bits of the (dst, rel) in-degree) in column
    1; the separate col/rel/edge_deg arrays are empty."""
    from primekg_rgcn_tpu.data.sampling import build_combined_csr

    graph, *_ = _setup_sparse(e=900)
    ccsr = build_combined_csr(graph, slim=True)
    assert ccsr.packed.dtype == jnp.int32
    assert ccsr.packed.shape[1] == 2
    assert ccsr.col.shape[0] == 0 and ccsr.rel.shape[0] == 0
    assert ccsr.edge_deg.shape[0] == 0 and ccsr.deg_rel_flat.shape[0] == 0
    row_start = np.asarray(ccsr.row_start)
    e_true = int(row_start[-1])
    from primekg_rgcn_tpu.data.sampling import _window_pad
    assert ccsr.packed.shape[0] == e_true + _window_pad(e_true)
    assert ccsr.packed.shape[0] % 64 == 0  # whole 64-record granules
    pad = np.asarray(ccsr.packed)[e_true:]
    assert (pad[:, 0] == ccsr.num_nodes).all()  # sentinel src
    assert (pad[:, 1] >> 16 == ccsr.num_relations - 1).all()
    assert (pad[:, 1] & 0xFFFF == 0).all()      # zero degree => weight 0
    packed = np.asarray(ccsr.packed)[:e_true]
    rel = (packed[:, 1] >> 16).astype(np.int64)
    deg = (packed[:, 1] & 0xFFFF).astype(
        np.uint16).view(np.float16).astype(np.float64)
    col = packed[:, 0]
    assert (col >= 0).all() and (col < ccsr.num_nodes).all()
    assert (rel >= 0).all() and (rel < ccsr.num_relations).all()
    n = ccsr.num_nodes
    # Reconstruct dst per edge from row_start, then check run counts.
    dst = np.repeat(np.arange(n + 1), np.diff(row_start).clip(0))
    key = dst * ccsr.num_relations + rel
    _, inv, counts = np.unique(key, return_inverse=True, return_counts=True)
    np.testing.assert_array_equal(deg, counts[inv].astype(np.float16))
    # Fallback (unpacked slim) when a (dst, rel) in-degree overflows f16
    # (hub with >= 60000 in-edges): arrays come back separate, f32 degree.
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    e_hub = 70_000
    rng = np.random.default_rng(3)
    hub = build_rel_graph(rng.integers(0, 50, e_hub),
                          np.zeros(e_hub, np.int64),
                          np.zeros(e_hub, np.int64), 50, 2)
    fb = build_combined_csr(hub, slim=True)
    assert fb.packed.shape[0] == 0
    assert fb.rel.shape[0] > 0 and fb.edge_deg.shape[0] > 0
    assert fb.edge_deg.dtype == jnp.float32


def test_combined_csr_layouts_agree():
    """Fat (auto at small scale) and slim layouts must produce identical
    sampled batches and identical trained losses — the layout is a memory
    choice, not a semantic one (VERDICT r2 item 5: the config-5 slimmings
    are now scale-gated)."""
    from primekg_rgcn_tpu.data.sampling import (
        build_combined_csr, sample_batch_combined)

    graph, *_ = _setup_sparse(e=900)
    fat = build_combined_csr(graph)        # auto -> fat at this scale
    slim = build_combined_csr(graph, slim=True)
    assert fat.deg_rel_flat.shape[0] > 0 and fat.edge_deg.shape[0] == 0
    assert fat.rel.dtype == jnp.int32

    seeds = jnp.asarray(np.arange(24, dtype=np.int32))
    key = jax.random.PRNGKey(5)
    bf = sample_batch_combined(key, fat, seeds, (6, 4))
    bs = sample_batch_combined(key, slim, seeds, (6, 4))
    np.testing.assert_array_equal(np.asarray(bf.frontier),
                                  np.asarray(bs.frontier))
    for blk_f, blk_s in zip(bf.blocks, bs.blocks):
        np.testing.assert_array_equal(np.asarray(blk_f.src_local),
                                      np.asarray(blk_s.src_local))
        np.testing.assert_array_equal(np.asarray(blk_f.rel_tag),
                                      np.asarray(blk_s.rel_tag))
        np.testing.assert_allclose(np.asarray(blk_f.slot_w),
                                   np.asarray(blk_s.slot_w),
                                   rtol=1e-3, atol=1e-6)


def test_sampled_trainer_early_stopping(tmp_path, monkeypatch):
    """SampledTrainer honors the windowed early-stop rule (reference quirk:
    stop when nothing in the window beats its first element)."""
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.sampled import SampledTrainer

    graph, cfg, params, csr, _ = _setup(e=500)
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)
    tcfg = TrainConfig(batch_size=64, lr=1e-3, epochs=20, early_stopping=3)
    t = SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:64],
                       tmp_path / "out", fanouts=(4, 3))
    # Force a non-improving val loss so the window triggers immediately.
    t.eval_fn = lambda p, k: (1.0, 0.5)
    hist = t.train()
    assert len(hist["val_losses"]) == 4  # window 3 + the first epoch


def test_zero3_hierarchical_matches_flat():
    """zero3 on a 2-D (dp, tp) mesh — table on the tp (ICI) axis, batch
    additionally split over dp (DCN) — must reproduce the flat 1-D run
    exactly: same per-device RNG enumeration, one extra slice-grad psum."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.parallel.mesh import make_mesh, make_mesh_2d
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step_zero3

    rng = np.random.default_rng(1)
    n, r, e = 90, 12, 800
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.3)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    edges = jnp.asarray(np.stack([src, dst, rel], 1).astype(np.int32))

    init_f, step_f, full_f, _ = build_sampled_train_step_zero3(
        graph, cfg, tcfg, make_mesh(8), fanouts=(5, 4))
    init_h, step_h, full_h, _ = build_sampled_train_step_zero3(
        graph, cfg, tcfg, make_mesh_2d(2, 4), fanouts=(5, 4), dp_axis="dp")

    def run(init, step, to_full):
        p0 = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True),
                                    params)
        st = init(p0)
        key = jax.random.PRNGKey(9)
        for _ in range(4):
            key, k, kb = jax.random.split(key, 3)
            bi = jax.random.randint(kb, (64,), 0, e)
            st, (loss, _) = step(st, edges[bi], k)
        assert np.isfinite(float(loss))
        return (to_full(st.params["encoder"]["node_emb"]),
                st.params["decoder"]["rel_emb"])

    ef, rf = run(init_f, step_f, full_f)
    eh, rh = run(init_h, step_h, full_h)
    np.testing.assert_allclose(np.asarray(ef), np.asarray(eh),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rh),
                               rtol=3e-5, atol=3e-6)

    # The sharded eval twin must run under the 2-D mesh too.
    st = init_h(jax.tree_util.tree_map(
        lambda a: jnp.array(a, copy=True), params))
    pos_mask = np.zeros((64, 4), np.int32)
    pos_mask[:50, :3] = np.asarray(edges[:50])
    pos_mask[:50, 3] = 1
    trio = np.asarray(step_h.eval_batch(st.params, jnp.asarray(pos_mask),
                                        jax.random.PRNGKey(1)))
    assert trio[2] == 100.0  # 50 valid positives + 50 negatives
    assert np.isfinite(trio).all()


def test_sharding_flags_do_not_degrade_silently(tmp_path):
    """zero1/zero3/dp_pods without a mesh, sparse_emb with one, and dp_pods
    without zero3 must all raise instead of silently training a different
    program than requested."""
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.sampled import SampledTrainer

    graph, cfg, params, csr, _ = _setup(e=300)
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)

    def make(**kw):
        tcfg = kw.pop("tcfg", TrainConfig(batch_size=32, lr=1e-2, epochs=1))
        return SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:32],
                              tmp_path / "o", fanouts=(3, 3), **kw)

    with pytest.raises(ValueError, match="multi-device"):
        make(zero3=True)
    with pytest.raises(ValueError, match="multi-device"):
        make(zero1=True, n_devices=1)
    with pytest.raises(ValueError, match="zero3"):
        make(dp_pods=2, n_devices=len(jax.devices()))
    if len(jax.devices()) > 1:
        with pytest.raises(ValueError, match="single-chip"):
            make(sparse_emb=True, n_devices=len(jax.devices()),
                 tcfg=TrainConfig(batch_size=32, lr=1e-2, epochs=1,
                                  optimizer="sgd", grad_clip=0.0))
        # table_opt on a sharded layout that carries its own update rule
        # (zero1/dp) must error, not silently train the dense rule.
        with pytest.raises(ValueError, match="table_opt"):
            make(zero1=True, table_opt="adafactor",
                 n_devices=len(jax.devices()),
                 tcfg=TrainConfig(batch_size=32, lr=1e-2, epochs=1,
                                  grad_clip=0.0))


def test_factored_slice_update_matches_dense_optax():
    """The zero3 per-slice adafactor rule (factored_slice_update) must
    equal optax.adafactor on the dense UNPADDED table for any row slicing:
    the [D] column stat and the block-RMS clip are psum'd across slices,
    pad rows are masked out of every statistic."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from functools import partial

    import optax
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.sampled import (
        factored_slice_init, factored_slice_update)

    n, d, n_tp, lr = 90, 8, 8, 1e-2
    n_loc = -(-n // n_tp)                     # 12, pad 6 rows
    mesh = make_mesh(n_tp)
    rng = np.random.default_rng(3)
    table = jnp.asarray(rng.normal(0, 0.1, (n, d)).astype(np.float32))

    dense_tx = optax.adafactor(learning_rate=lr, min_dim_size_to_factor=2,
                               multiply_by_parameter_scale=False)
    dense_state = dense_tx.init(table)

    state_dm = jax.tree_util.tree_map(
        lambda a: jnp.broadcast_to(a, (n_tp,) + a.shape),
        factored_slice_init(n_loc, d))

    @partial(shard_map, mesh=mesh, in_specs=(P("data"), P("data")),
             out_specs=(P("data"), P("data")), check_vma=True)
    def slice_update(g_dm, st_dm):
        st = jax.tree_util.tree_map(lambda a: a[0], st_dm)
        my = jax.lax.axis_index("data")
        row_valid = ((my * n_loc + jnp.arange(n_loc)) < n).astype(
            jnp.float32)
        upd, st = factored_slice_update(
            g_dm[0] if g_dm.ndim == 3 else g_dm, st,
            axis_name="data", row_valid=row_valid, n_valid=n, lr=lr)
        return upd, jax.tree_util.tree_map(lambda a: a[None], st)

    sharded_table = table
    for step in range(3):
        g = jnp.asarray(rng.normal(0, 1e-3, (n, d)).astype(np.float32))
        # Grads with structure: zero some rows (like untouched table rows).
        g = g.at[step::3].set(0.0)

        upd_dense, dense_state = dense_tx.update(g, dense_state, table)
        table = optax.apply_updates(table, upd_dense)

        g_pad = jnp.concatenate(
            [g, jnp.zeros((n_tp * n_loc - n, d), jnp.float32)], axis=0)
        upd_sh, state_dm = slice_update(g_pad, state_dm)
        sharded_table = sharded_table + upd_sh[:n]

        np.testing.assert_allclose(np.asarray(upd_sh[:n]),
                                   np.asarray(upd_dense),
                                   rtol=2e-5, atol=1e-10)
    np.testing.assert_allclose(np.asarray(sharded_table), np.asarray(table),
                               rtol=2e-5, atol=1e-9)


def test_zero3_adafactor_hierarchical_matches_flat():
    """--table_opt adafactor under zero3: mesh-size-INVARIANT by design
    (cross-slice stats are psum'd), so the hierarchical (2, 4) mesh must
    reproduce the flat 8-device run; state is factored [n_loc] + [D]."""
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 devices")
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.parallel.mesh import make_mesh, make_mesh_2d
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step_zero3

    rng = np.random.default_rng(1)
    n, r, e = 90, 12, 800
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.3)
    tcfg = TrainConfig(batch_size=64, lr=1e-2, grad_clip=0.0)
    params = init_params(jax.random.PRNGKey(0), cfg)
    edges = jnp.asarray(np.stack([src, dst, rel], 1).astype(np.int32))

    init_f, step_f, full_f, _ = build_sampled_train_step_zero3(
        graph, cfg, tcfg, make_mesh(8), fanouts=(5, 4),
        table_opt="adafactor")
    init_h, step_h, full_h, _ = build_sampled_train_step_zero3(
        graph, cfg, tcfg, make_mesh_2d(2, 4), fanouts=(5, 4), dp_axis="dp",
        table_opt="adafactor")

    def run(init, step, to_full, n_tp):
        p0 = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True),
                                    params)
        st = init(p0)
        # Factored state: [n_tp, D] column stat + [n_tp, n_loc] row stat,
        # NOT two table-sized moments.
        emb_state = st.opt_state[1]
        assert emb_state["v_row"].shape == (n_tp, 8)
        assert emb_state["v_col"].shape[0] == n_tp
        key = jax.random.PRNGKey(9)
        for _ in range(4):
            key, k, kb = jax.random.split(key, 3)
            bi = jax.random.randint(kb, (64,), 0, e)
            st, (loss, _) = step(st, edges[bi], k)
        assert np.isfinite(float(loss))
        return (to_full(st.params["encoder"]["node_emb"]),
                st.params["decoder"]["rel_emb"])

    ef, rf = run(init_f, step_f, full_f, 8)
    eh, rh = run(init_h, step_h, full_h, 4)
    assert not np.allclose(np.asarray(ef), np.asarray(params["encoder"]
                                                      ["node_emb"]))
    np.testing.assert_allclose(np.asarray(ef), np.asarray(eh),
                               rtol=3e-5, atol=3e-6)
    np.testing.assert_allclose(np.asarray(rf), np.asarray(rh),
                               rtol=3e-5, atol=3e-6)


def test_zero3_table_opt_validation():
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step_zero3

    graph, cfg, params, csr, _ = _setup(e=300)
    with pytest.raises(ValueError, match="grad_clip"):
        build_sampled_train_step_zero3(
            graph, cfg, TrainConfig(batch_size=64, grad_clip=1.0),
            make_mesh(8), fanouts=(4, 3), table_opt="adafactor")
    with pytest.raises(ValueError, match="table_opt"):
        build_sampled_train_step_zero3(
            graph, cfg, TrainConfig(batch_size=64, grad_clip=0.0),
            make_mesh(8), fanouts=(4, 3), table_opt="rmsprop")


def test_factored_rows_update_matches_dense_optax():
    """Sparse-gradient adafactor (factored_rows_update) == optax.adafactor
    on the scattered dense gradient, at partial frontier coverage, with
    sentinel (fill == N) slots carrying garbage gradients that must drop."""
    import optax

    from primekg_rgcn_tpu.train.sampled import (
        factored_rows_update, factored_slice_init)

    n, d, cap, lr = 90, 8, 24, 5e-2
    rng = np.random.default_rng(7)
    table_s = jnp.asarray(rng.normal(0, 0.1, (n, d)).astype(np.float32))
    table_d = table_s
    dense_tx = optax.adafactor(learning_rate=lr, min_dim_size_to_factor=2,
                               multiply_by_parameter_scale=False)
    dense_state = dense_tx.init(table_d)
    state = factored_slice_init(n, d)

    up = jax.jit(lambda g, f, t, s: factored_rows_update(g, f, t, s, lr=lr))
    for step in range(4):
        k = 16 + step  # touched-row count varies per step
        rows = np.sort(rng.choice(n, size=k, replace=False)).astype(np.int32)
        frontier = np.full(cap, n, np.int32)
        frontier[:k] = rows
        g_rows = rng.normal(0, 1e-2, (cap, d)).astype(np.float32)
        g_rows[k:] = 5.0  # garbage at sentinel slots: must be dropped

        g_dense = jnp.zeros((n, d), jnp.float32).at[jnp.asarray(rows)].set(
            jnp.asarray(g_rows[:k]))
        upd_d, dense_state = dense_tx.update(g_dense, dense_state, table_d)
        table_d = optax.apply_updates(table_d, upd_d)

        table_s, state = up(jnp.asarray(g_rows), jnp.asarray(frontier),
                            table_s, state)

        np.testing.assert_allclose(np.asarray(table_s), np.asarray(table_d),
                                   rtol=2e-5, atol=1e-9)
    # The state stats match the dense run's factored stats too.
    fs = dense_state[0]  # FactoredState of scale_by_factored_rms
    np.testing.assert_allclose(np.asarray(state["v_row"]),
                               np.asarray(jax.tree_util.tree_leaves(
                                   fs.v_row)[0]), rtol=2e-5, atol=1e-32)
    np.testing.assert_allclose(np.asarray(state["v_col"]),
                               np.asarray(jax.tree_util.tree_leaves(
                                   fs.v_col)[0]), rtol=2e-5, atol=1e-32)


def test_full_fanout_truncate_equals_full_graph_basis():
    """Basis-decomposition weights (num_bases < R) flow through the sampled
    block aggregation via the same materialize_fn as the full-graph layer:
    truncate mode at max fanout must still reproduce the full encode."""
    graph, _, _, csr, max_deg = _setup()
    cfg = ModelConfig(num_nodes=60, num_relations=3, embedding_dim=8,
                      hidden_dim=8, dropout=0.0, num_bases=2)
    params = init_params(jax.random.PRNGKey(3), cfg)
    assert "basis" in params["encoder"]["conv1"]
    seeds = jnp.asarray(np.arange(20, dtype=np.int32))
    batch = sample_batch(jax.random.PRNGKey(0), csr, seeds,
                         fanouts=[max_deg, max_deg], mode="truncate")
    out_sampled = encoder_apply_sampled(params, batch, cfg)
    out_full = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out_sampled),
                               np.asarray(out_full)[:20],
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("sparse_emb,table_opt", [(False, "sgd"),
                                                  (True, "adafactor")])
def test_chunked_scan_matches_per_step(sparse_emb, table_opt):
    """step.chunk (lax.scan over K steps, one dispatch) is bit-identical to
    K sequential step() calls: chunk_keys reproduces the trainer's exact
    ``key, k = split(key)`` chain, so losses and final params match."""
    import jax.tree_util as jtu

    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.loop import make_optimizer
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step

    graph, cfg, params, _, _ = _setup()
    tc = TrainConfig(epochs=1, batch_size=16, lr=0.01,
                     optimizer="sgd" if table_opt == "sgd" else "adam",
                     grad_clip=0.0, weight_decay=0.0)
    step = build_sampled_train_step(graph, cfg, tc, make_optimizer(tc),
                                    fanouts=(4, 3), sparse_emb=sparse_emb,
                                    table_opt=table_opt)
    rng = np.random.default_rng(0)
    edges = np.stack([rng.integers(0, 60, 96), rng.integers(0, 60, 96),
                      rng.integers(0, 3, 96)], 1).astype(np.int32)
    copy = lambda p: jtu.tree_map(lambda x: jnp.array(x, copy=True), p)

    key = jax.random.PRNGKey(7)
    st = step.init_state(copy(params))
    losses = []
    for s in range(6):
        key, k = jax.random.split(key)
        st, (loss, _) = step(st, jnp.asarray(edges[s * 16:(s + 1) * 16]), k)
        losses.append(float(loss))

    key2 = jax.random.PRNGKey(7)
    st2 = step.init_state(copy(params))
    key2, ks = step.chunk_keys(key2, 6)
    st2, (ls, _) = step.chunk(st2, jnp.asarray(edges).reshape(6, 16, 3), ks)

    assert bool(jnp.all(key == key2))
    np.testing.assert_array_equal(np.asarray(ls), np.asarray(losses,
                                                             np.float32))
    for a, b in zip(jtu.tree_leaves(st.params), jtu.tree_leaves(st2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_trainer_chunking_matches_per_step(tmp_path):
    """SampledTrainer.train() with scan chunking (default) reproduces the
    per-step loop's exact history — including the remainder steps past the
    last whole chunk and the wrap-padded final partial batch."""
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.train.sampled import SampledTrainer

    graph, cfg, _, _, _ = _setup(e=500)
    from primekg_rgcn_tpu.data.graph import edge_arrays_from_graph

    src, dst, rel = edge_arrays_from_graph(graph)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)[:210]  # 4 batches
    # steps_per_scan=1 disables chunking; =2 chunks 3 whole batches into one
    # scan pair + 1 whole remainder + the partial wrap-padded batch.
    hists = []
    for k in (1, 2):
        tcfg = TrainConfig(batch_size=64, lr=1e-3, epochs=2,
                           steps_per_scan=k)
        t = SampledTrainer(cfg, tcfg, graph, graph, edges, edges[:64],
                           tmp_path / f"out{k}", fanouts=(4, 3))
        hists.append(t.train())
    np.testing.assert_array_equal(hists[0]["train_losses"],
                                  hists[1]["train_losses"])
    np.testing.assert_array_equal(hists[0]["val_losses"],
                                  hists[1]["val_losses"])


def test_combined_block_full_budget_equals_full_graph():
    """block mode with F >= max total degree picks the single whole-row
    block (weight 1/deg_r) — exactly the full-graph encode on the seeds."""
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    graph, cfg, params, ccsr, max_total = _setup_sparse()
    seeds = jnp.asarray(np.arange(25, dtype=np.int32))
    batch = sample_batch_combined(jax.random.PRNGKey(0), ccsr, seeds,
                                  budgets=[max_total, max_total],
                                  mode="block")
    out_sampled = encoder_apply_sampled(params, batch, cfg)
    out_full = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out_sampled),
                               np.asarray(out_full)[:25],
                               rtol=1e-4, atol=1e-5)


def test_combined_block_is_unbiased_estimate():
    """Aligned-random-block picks: every edge's inclusion probability is
    1/ceil(deg/F), so weight ceil(deg/F)/deg_r keeps the per-relation-mean
    estimator unbiased at any budget."""
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    graph, cfg, params, ccsr, _ = _setup_sparse()
    seeds = jnp.asarray(np.arange(12, dtype=np.int32))
    full = np.asarray(encoder_apply(params, graph, cfg))[:12]

    @jax.jit
    def one(key):
        b = sample_batch_combined(key, ccsr, seeds, budgets=[24, 24],
                                  mode="block")
        return encoder_apply_sampled(params, b, cfg)

    keys = jax.random.split(jax.random.PRNGKey(3), 300)
    avg = np.mean([np.asarray(one(k)) for k in keys], axis=0)
    err = np.abs(avg - full).max() / (np.abs(full).max() + 1e-9)
    assert err < 0.25, f"relative deviation {err:.3f}"


def test_combined_block_single_layer_mean_exact_expectation():
    """ONE layer (no ReLU composition): the block estimator's expectation
    over all ceil(deg/F) choices equals the exact per-relation mean
    aggregation — checked by enumerating every block choice via many keys
    on a tiny deterministic graph."""
    from primekg_rgcn_tpu.data.sampling import (
        _sample_layer_combined, build_combined_csr)

    rng = np.random.default_rng(5)
    n, r, e = 30, 4, 220
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    ccsr = build_combined_csr(graph)
    x = jnp.asarray(rng.normal(size=(n + 1, 3)).astype(np.float32))
    x = x.at[n].set(0.0)
    frontier = jnp.arange(n, dtype=jnp.int32)

    # Exact per-(node, rel) mean sum_r mean_r(v) with x as features.
    exact = np.zeros((n, 3), np.float32)
    for rr in range(r):
        m_rr = rel == rr
        cnt = np.bincount(dst[m_rr], minlength=n).astype(np.float32)
        s = np.zeros((n, 3), np.float32)
        np.add.at(s, dst[m_rr], np.asarray(x)[src[m_rr]])
        exact += s / np.maximum(cnt, 1.0)[:, None]

    F = 4

    @jax.jit
    def one(key):
        _, uniq, blk = _sample_layer_combined(key, ccsr, frontier, F,
                                              "block")
        # Recover global pick ids via the dedup table (sentinel -> x[n]=0)
        gids = jnp.take(uniq, blk.src_local, axis=0,
                        mode="fill", fill_value=n)
        rows = jnp.take(x, gids, axis=0)
        return jnp.einsum("mf,mfd->md", blk.slot_w, rows)

    trials = 600
    keys = jax.random.split(jax.random.PRNGKey(9), trials)
    est = np.mean([np.asarray(one(k)) for k in keys], axis=0)
    np.testing.assert_allclose(est, exact, rtol=0.0, atol=0.35)


def test_block_mode_rejects_per_relation_layout():
    graph, _, _, csr, _ = _setup()
    with pytest.raises(ValueError, match="combined layout"):
        sample_batch(jax.random.PRNGKey(0), csr,
                     jnp.arange(8, dtype=jnp.int32), fanouts=(4, 3),
                     mode="block")


def test_block_window_fetch_matches_gather(monkeypatch):
    """The contiguous-DMA window fetch (Pallas, PRIMEKG_WINDOW_FETCH=1,
    interpreted on CPU) must produce bit-identical sampled blocks to the
    per-slot XLA gather path on a slim (packed) CSR."""
    from primekg_rgcn_tpu.data.sampling import (
        build_combined_csr, sample_batch_combined)

    graph, cfg, params, _, _ = _setup_sparse(e=900)
    ccsr = build_combined_csr(graph, slim=True)
    assert ccsr.packed.shape[0] > 0
    seeds = jnp.asarray(np.arange(20, dtype=np.int32))
    key = jax.random.PRNGKey(11)

    monkeypatch.setenv("PRIMEKG_WINDOW_FETCH", "0")
    b_gather = sample_batch_combined(key, ccsr, seeds, (6, 5), mode="block")
    monkeypatch.setenv("PRIMEKG_WINDOW_FETCH", "1")
    b_window = sample_batch_combined(key, ccsr, seeds, (6, 5), mode="block")

    for blk_g, blk_w in zip(b_gather.blocks, b_window.blocks):
        np.testing.assert_array_equal(np.asarray(blk_g.src_local),
                                      np.asarray(blk_w.src_local))
        np.testing.assert_array_equal(np.asarray(blk_g.rel_tag),
                                      np.asarray(blk_w.rel_tag))
        np.testing.assert_array_equal(np.asarray(blk_g.slot_w),
                                      np.asarray(blk_w.slot_w))
    out_g = encoder_apply_sampled(params, b_gather, cfg)
    out_w = encoder_apply_sampled(params, b_window, cfg)
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_w))


def test_block_pairs_form_matches_row_form(monkeypatch):
    """Granule-pairs packed CSR (build_combined_csr window_pairs=True and
    csr_to_pairs_form) yields bit-identical sampled blocks to the row-form
    CSR. Production block mode stores the pairs form so NO device-side
    narrow-dim reshape exists: XLA lowers reshape([100M, 2] -> [G, 128])
    through a lane-padded tiled copy — 51.2 GB, a compile-time OOM at
    config-5 scale (docs/KERNELS.md Round 4)."""
    from primekg_rgcn_tpu.data.sampling import (
        build_combined_csr, csr_to_pairs_form, packed_is_pairs,
        sample_batch_combined)

    graph, cfg, params, _, _ = _setup_sparse(e=900)
    row = build_combined_csr(graph, slim=True)
    built = build_combined_csr(graph, slim=True, window_pairs=True)
    conv = csr_to_pairs_form(row)
    assert packed_is_pairs(built.packed) and packed_is_pairs(conv.packed)
    assert not packed_is_pairs(row.packed)
    np.testing.assert_array_equal(np.asarray(built.packed),
                                  np.asarray(conv.packed))

    seeds = jnp.asarray(np.arange(20, dtype=np.int32))
    key = jax.random.PRNGKey(11)
    monkeypatch.setenv("PRIMEKG_WINDOW_FETCH", "1")
    b_row = sample_batch_combined(key, row, seeds, (6, 5), mode="block")
    # The pairs form takes the window path even where the fetch defaults
    # off (CPU): it is the only layout the pairs view can serve.
    monkeypatch.delenv("PRIMEKG_WINDOW_FETCH")
    b_pair = sample_batch_combined(key, built, seeds, (6, 5), mode="block")
    for blk_r, blk_p in zip(b_row.blocks, b_pair.blocks):
        np.testing.assert_array_equal(np.asarray(blk_r.src_local),
                                      np.asarray(blk_p.src_local))
        np.testing.assert_array_equal(np.asarray(blk_r.rel_tag),
                                      np.asarray(blk_p.rel_tag))
        np.testing.assert_array_equal(np.asarray(blk_r.slot_w),
                                      np.asarray(blk_p.slot_w))
    out_r = encoder_apply_sampled(params, b_row, cfg)
    out_p = encoder_apply_sampled(params, b_pair, cfg)
    np.testing.assert_array_equal(np.asarray(out_r), np.asarray(out_p))

    # Per-slot-gather modes cannot read the pairs form: loud error.
    with pytest.raises(ValueError, match="granule-pairs"):
        sample_batch_combined(key, built, seeds, (6, 5), mode="uniform")


def test_resolve_sampler_block_mode_builds_pairs_form(monkeypatch):
    """The step builders' resolve_sampler(mode='block') hands every layer
    the pairs-form CSR (and converts an existing row-form one), so the
    integrated trainer path never reshapes the packed table on device."""
    from primekg_rgcn_tpu.data.sampling import packed_is_pairs
    from primekg_rgcn_tpu.train.sampled import resolve_sampler

    monkeypatch.setenv("PRIMEKG_WINDOW_FETCH", "1")
    graph, _, _, row_csr, _ = _setup_sparse(e=900)
    # slim=True analogue: _setup_sparse's auto CSR is fat at this scale,
    # so force the packed layout through a slim build.
    from primekg_rgcn_tpu.data.sampling import build_combined_csr

    row = build_combined_csr(graph, slim=True)
    out_csr, _, use_combined = resolve_sampler(row, (6, 5), mode="block")
    assert use_combined and packed_is_pairs(out_csr.packed)
    # uniform mode leaves row form untouched.
    out_u, _, _ = resolve_sampler(row, (6, 5), mode="uniform")
    assert not packed_is_pairs(out_u.packed)


def test_zero3_block_mode_matches_zero1():
    """Block sampling composes with the sharded layouts: zero3 == zero1
    under mode='block' (the window picks ride the same dedup frontier and
    collectives as uniform mode)."""
    if len(jax.devices()) < 2:
        pytest.skip("needs multi-device platform")
    from primekg_rgcn_tpu.config import TrainConfig
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.sampled import (
        build_sampled_train_step_zero1, build_sampled_train_step_zero3)

    rng = np.random.default_rng(1)
    n, r, e = 80, 16, 700  # relation-sparse: resolves to the combined CSR
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.3)
    tcfg = TrainConfig(batch_size=64, lr=1e-2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    edges = jnp.asarray(np.stack([src, dst, rel], 1).astype(np.int32))
    mesh = make_mesh(len(jax.devices()))

    init1, step1 = build_sampled_train_step_zero1(
        graph, cfg, tcfg, mesh, fanouts=(5, 4), mode="block")
    init3, step3, to_full, _ = build_sampled_train_step_zero3(
        graph, cfg, tcfg, mesh, fanouts=(5, 4), mode="block")

    def run(init, step, to_full_fn):
        p0 = jax.tree_util.tree_map(lambda a: jnp.array(a, copy=True),
                                    params)
        st = init(p0)
        key = jax.random.PRNGKey(9)
        for _ in range(3):
            key, k, kb = jax.random.split(key, 3)
            bi = jax.random.randint(kb, (64,), 0, e)
            st, (loss, _) = step(st, edges[bi], k)
        assert np.isfinite(float(loss))
        emb = st.params["encoder"]["node_emb"]
        if to_full_fn is not None:
            emb = to_full_fn(emb)
        return emb, st.params["decoder"]["rel_emb"]

    outs1 = run(init1, step1, None)
    outs3 = run(init3, step3, to_full)
    for a, b in zip(outs1, outs3):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=3e-5, atol=3e-6)


def test_parse_sample_mode():
    from primekg_rgcn_tpu.data.sampling import parse_sample_mode

    assert parse_sample_mode("uniform") == ("uniform", 1)
    assert parse_sample_mode("block") == ("block", 1)
    assert parse_sample_mode("block4") == ("block", 4)
    assert parse_sample_mode("block12") == ("block", 12)
    with pytest.raises(ValueError, match="unknown sampling mode"):
        parse_sample_mode("blockx")
    with pytest.raises(ValueError):
        parse_sample_mode("block0")


def test_combined_multiwindow_block_is_unbiased_estimate():
    """blockN: N independent aligned F/N-edge sub-windows per node, each
    an unbiased block estimator at window size F/N, averaged via weights
    divided by N — the mean must converge to the full encode like the
    single-window mode (docs/KERNELS.md Round 5: recovers the per-step
    relation coverage that one merged-CSR window loses)."""
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    graph, cfg, params, ccsr, _ = _setup_sparse()
    seeds = jnp.asarray(np.arange(12, dtype=np.int32))
    full = np.asarray(encoder_apply(params, graph, cfg))[:12]

    @jax.jit
    def one(key):
        b = sample_batch_combined(key, ccsr, seeds, budgets=[24, 24],
                                  mode="block4")
        return encoder_apply_sampled(params, b, cfg)

    keys = jax.random.split(jax.random.PRNGKey(5), 300)
    avg = np.mean([np.asarray(one(k)) for k in keys], axis=0)
    err = np.abs(avg - full).max() / (np.abs(full).max() + 1e-9)
    assert err < 0.25, f"relative deviation {err:.3f}"


def test_combined_multiwindow_full_budget_exact():
    """block2 with sub-window size >= max degree: both windows pick the
    whole neighborhood at half weight — exactly the full-graph encode."""
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    graph, cfg, params, ccsr, max_total = _setup_sparse()
    seeds = jnp.asarray(np.arange(25, dtype=np.int32))
    batch = sample_batch_combined(jax.random.PRNGKey(0), ccsr, seeds,
                                  budgets=[2 * max_total, 2 * max_total],
                                  mode="block2")
    out_sampled = encoder_apply_sampled(params, batch, cfg)
    out_full = encoder_apply(params, graph, cfg)
    np.testing.assert_allclose(np.asarray(out_sampled),
                               np.asarray(out_full)[:25],
                               rtol=1e-4, atol=1e-5)


def test_multiwindow_rejects_indivisible_budget():
    from primekg_rgcn_tpu.data.sampling import sample_batch_combined

    _, _, _, ccsr, _ = _setup_sparse()
    with pytest.raises(ValueError, match="divide the layer budget"):
        sample_batch_combined(jax.random.PRNGKey(0), ccsr,
                              jnp.arange(8, dtype=jnp.int32),
                              budgets=[25, 25], mode="block4")


def test_multiwindow_window_fetch_matches_gather(monkeypatch):
    """blockN through the contiguous-DMA window fetch (one DMA per
    sub-window) must produce bit-identical blocks to the per-slot gather."""
    from primekg_rgcn_tpu.data.sampling import (
        build_combined_csr, sample_batch_combined)

    graph, cfg, params, _, _ = _setup_sparse(e=900)
    ccsr = build_combined_csr(graph, slim=True)
    assert ccsr.packed.shape[0] > 0
    seeds = jnp.asarray(np.arange(20, dtype=np.int32))
    key = jax.random.PRNGKey(13)

    monkeypatch.setenv("PRIMEKG_WINDOW_FETCH", "0")
    b_gather = sample_batch_combined(key, ccsr, seeds, (6, 4), mode="block2")
    monkeypatch.setenv("PRIMEKG_WINDOW_FETCH", "1")
    b_window = sample_batch_combined(key, ccsr, seeds, (6, 4), mode="block2")

    for blk_g, blk_w in zip(b_gather.blocks, b_window.blocks):
        np.testing.assert_array_equal(np.asarray(blk_g.src_local),
                                      np.asarray(blk_w.src_local))
        np.testing.assert_array_equal(np.asarray(blk_g.rel_tag),
                                      np.asarray(blk_w.rel_tag))
        np.testing.assert_array_equal(np.asarray(blk_g.slot_w),
                                      np.asarray(blk_w.slot_w))
    out_g = encoder_apply_sampled(params, b_gather, cfg)
    out_w = encoder_apply_sampled(params, b_window, cfg)
    np.testing.assert_array_equal(np.asarray(out_g), np.asarray(out_w))
