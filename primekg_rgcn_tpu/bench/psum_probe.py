"""Probe: cost of shard_map collectives on the hosted single-chip backend.

Motivation (docs/KERNELS.md "Backend measurement caveats"): the edge-sharded
full train step measured 1.2-2.8 s on the hosted v5e while the same
encoder's fwd+grad inside shard_map is 28 ms — something outside the
encoder dominates. Hypothesis: collectives on the tunneled 1-chip backend
are host-mediated rather than compiled away, so the step's ~15-20 psums
(grad-combination pcast transposes, loss/count scalars) each cost tens of
milliseconds. This probe measures (a) a plain jit elementwise op, (b) one
psum in shard_map, (c) 11 chained psums, (d) psum of a small pytree with 12
leaves (the grads shape), all on a 1-device mesh.

Run on the real chip: python -m primekg_rgcn_tpu.bench.psum_probe
"""

import time
from functools import partial

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from primekg_rgcn_tpu.parallel.mesh import make_mesh

    print("backend:", jax.default_backend())
    mesh = make_mesh(1)
    x = jnp.ones((31000, 64), jnp.float32)

    def bench(fn, tag, reps=20):
        out = fn(x)
        float(np.asarray(out).ravel()[0])
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        float(np.asarray(out).ravel()[0])
        print(f"{tag}: {(time.perf_counter() - t0) / reps * 1e3:.2f} ms",
              flush=True)

    bench(jax.jit(lambda a: a * 2 + 1), "plain jit elementwise")

    f1 = jax.jit(partial(shard_map, mesh=mesh, in_specs=P(), out_specs=P(),
                         check_vma=True)(
        lambda a: jax.lax.psum(
            jax.lax.pcast(a, "data", to="varying"), "data")))
    bench(f1, "shard_map 1 psum [31K,64]")

    def many(a):
        a = jax.lax.pcast(a, "data", to="varying")
        for _ in range(10):
            a = jax.lax.psum(a, "data") * 0.5
            a = jax.lax.pcast(a, "data", to="varying")
        return jax.lax.psum(a, "data")

    f2 = jax.jit(partial(shard_map, mesh=mesh, in_specs=P(), out_specs=P(),
                         check_vma=True)(many))
    bench(f2, "shard_map 11 chained psums")

    def pytree_psum(a):
        leaves = [jax.lax.pcast(a[:100, :8] + i, "data", to="varying")
                  for i in range(12)]
        return sum(jnp.sum(jax.lax.psum(l, "data")) for l in leaves)

    f3 = jax.jit(partial(shard_map, mesh=mesh, in_specs=P(), out_specs=P(),
                         check_vma=True)(pytree_psum))
    bench(f3, "shard_map 12-leaf psum (grads shape)")


if __name__ == "__main__":
    main()
