# Component-level timing of the 42ms train step.
import time, functools, numpy as np, jax, jax.numpy as jnp
from primekg_rgcn_tpu.config import ModelConfig
from primekg_rgcn_tpu.data.graph import build_rel_graph
from primekg_rgcn_tpu.data.synthetic import bidirect, primekg_like
from primekg_rgcn_tpu.models.rgcn import init_params, encoder_apply
from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment, make_gather_segment_sum

raw = primekg_like(seed=0, scale=1.0)
src, dst, rel = bidirect(raw["src"], raw["dst"], raw["rel"])
graph = build_rel_graph(src, dst, rel, raw["num_nodes"], 3)
n = raw["num_nodes"]
cfg = ModelConfig(num_nodes=n, num_relations=3)
params = init_params(jax.random.PRNGKey(0), cfg)

def timeit(name, f, *a):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(20): r = f(*a)
    jax.block_until_ready(r)
    print(f"{name}: {(time.perf_counter()-t0)/20*1000:.2f} ms")

# whole encoder
enc = jax.jit(lambda p: encoder_apply(p, graph, cfg))
timeit("enc fwd", enc, params)
g = jax.jit(jax.grad(lambda p: jnp.sum(encoder_apply(p, graph, cfg)**2)))
timeit("enc fwd+bwd", g, params)

# layer1 only (64->128 aggregate-first)
l1 = jax.jit(lambda p, x: rgcn_layer_segment(p["encoder"]["conv1"], x, graph))
x64 = jnp.asarray(np.random.default_rng(0).normal(size=(n, 64)).astype(np.float32))
timeit("layer1 fwd", l1, params, x64)
g1 = jax.jit(jax.grad(lambda x: jnp.sum(rgcn_layer_segment(params["encoder"]["conv1"], x, graph)**2)))
timeit("layer1 bwd(x)", g1, x64)

# layer2 only (128->128)
x128 = jnp.asarray(np.random.default_rng(0).normal(size=(n, 128)).astype(np.float32))
l2 = jax.jit(lambda x: rgcn_layer_segment(params["encoder"]["conv2"], x, graph))
timeit("layer2 fwd", l2, x128)

# pure gather cost at both widths
x64p = jnp.concatenate([x64, jnp.zeros((1,64))],0)
x128p = jnp.concatenate([x128, jnp.zeros((1,128))],0)
gt64 = jax.jit(lambda x: sum(jnp.take(jnp.pad(x,((0,0),(0,64))), graph.src[graph.rel_offsets[r]:graph.rel_offsets[r+1]], axis=0).sum() for r in range(3)))
timeit("gathers 3 buckets (64->128 padded)", gt64, x64p)
gt128 = jax.jit(lambda x: sum(jnp.take(x, graph.src[graph.rel_offsets[r]:graph.rel_offsets[r+1]], axis=0).sum() for r in range(3)))
timeit("gathers 3 buckets (128)", gt128, x128p)
