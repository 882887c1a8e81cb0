"""Two-process multi-host drill: the zero3 sampled step across REAL process
boundaries (XLA CPU cross-process collectives over Gloo), with exact parity
against the same run on a single-process mesh.

This is the strongest multi-host validation available without a pod: the
frontier-row psum_scatter fetch, its all-gather transpose, the slice-local
adam update, and the loss psums all cross a process boundary, exercising
the same jax.distributed code path (`train/cli.py --distributed`) a real
multi-host pod uses.

Usage (run BOTH, e.g. via tests/test_multihost.py or by hand):
    python scripts/multihost_drill.py <process_id> <num_processes> <outdir>
Single-process reference for the parity check:
    python scripts/multihost_drill.py solo 1 <outdir>
"""

import os
import sys


def main():
    role, nproc, outdir = sys.argv[1], int(sys.argv[2]), sys.argv[3]
    solo = role == "solo"
    pid = 0 if solo else int(role)
    # 2 local devices per process -> a 4-device global mesh either way.
    os.environ["PRIMEKG_FORCE_CPU"] = "1"
    os.environ["XLA_FLAGS"] = (
        "--xla_force_host_platform_device_count="
        + ("4" if solo else "2"))
    from primekg_rgcn_tpu.utils.telemetry import apply_platform_env

    apply_platform_env()
    import jax

    if not solo:
        from primekg_rgcn_tpu.train.multichip import (
            maybe_initialize_distributed,
        )

        maybe_initialize_distributed(
            os.environ.get("DRILL_COORD", "localhost:23456"), nproc, pid)
    assert jax.device_count() == 4, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from primekg_rgcn_tpu.config import ModelConfig, TrainConfig
    from primekg_rgcn_tpu.data.graph import build_rel_graph
    from primekg_rgcn_tpu.models.rgcn import init_params
    from primekg_rgcn_tpu.parallel.mesh import make_mesh
    from primekg_rgcn_tpu.train.sampled import build_sampled_train_step_zero3

    rng = np.random.default_rng(7)
    n, r, e = 80, 10, 600
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    rel = rng.integers(0, r, e)
    graph = build_rel_graph(src, dst, rel, n, r, bucket_pad_multiple=64)
    cfg = ModelConfig(num_nodes=n, num_relations=r, embedding_dim=8,
                      hidden_dim=8, dropout=0.3)
    tcfg = TrainConfig(batch_size=32, lr=1e-2)
    params = init_params(jax.random.PRNGKey(0), cfg)
    edges = np.stack([src, dst, rel], 1).astype(np.int32)

    mesh = make_mesh(4)
    init_state, step, to_full, _ = build_sampled_train_step_zero3(
        graph, cfg, tcfg, mesh, fanouts=(4, 3))
    state = init_state(params)
    key = jax.random.PRNGKey(3)
    for i in range(3):
        key, k, kb = jax.random.split(key, 3)
        bi = np.asarray(jax.random.randint(kb, (32,), 0, e))
        state, (loss, acc) = step(state, jnp.asarray(edges[bi]), k)
    loss = float(loss)
    assert np.isfinite(loss), loss

    emb_dm = state.params["encoder"]["node_emb"]
    # Assemble the final table from each process's addressable shards
    # (multi-host arrays are only partially addressable per process).
    rows = {}
    for s in emb_dm.addressable_shards:
        rows[int(s.index[0].start or 0)] = np.asarray(s.data)
    np.savez(os.path.join(outdir, f"drill_p{pid}_{'solo' if solo else 'mh'}"),
             loss=loss, **{str(k): v for k, v in rows.items()})

    # Checkpoint from a multi-process state: every process calls save (the
    # host snapshot all-gathers the partially-addressable leaves), only
    # process 0 writes; then it loads the file back and checks the table.
    from primekg_rgcn_tpu.train import checkpoint as ckpt_lib

    ck = os.path.join(outdir, f"ck_{'solo' if solo else 'mh'}")
    ckpt_lib.save(ck, {
        "epoch": 1, "state": state, "best_val_loss": loss,
        "best_val_acc": 0.0, "history": {}, "model_config": cfg.to_dict(),
        "train_config": tcfg.to_dict()})
    if pid == 0:
        back = ckpt_lib.load(ck, raw=True)
        emb_back = np.asarray(back["state"].params["encoder"]["node_emb"])
        for start, val in rows.items():
            np.testing.assert_array_equal(emb_back[start], val[0])
    print(f"[{'solo' if solo else f'p{pid}'}] loss={loss:.6f} "
          f"shards={sorted(rows)} ckpt=ok", flush=True)


if __name__ == "__main__":
    main()
