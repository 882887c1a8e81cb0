"""AOT model export for serving (jax.export / StableHLO).

Production pattern: the encoder is deterministic at inference, so serving
never needs the graph or the RGCN layers — encode ONCE at export time and
ship a self-contained top-K scorer over the frozen entity embeddings. The
artifact is a single serialized StableHLO program (embeddings + relation
table baked in as constants) loadable WITHOUT any model code, Python
pytrees, or checkpoint format knowledge — `load_predictor` returns a plain
callable. Works on any JAX backend (export is platform-checked; we export
for the host platform by default).

The reference's closest surface is the in-process ``predict_all_tails``
method (reference: src/models/rgcn.py:362-395); there is no deployable
artifact story there.
"""

from __future__ import annotations

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np


def export_topk_predictor(params, graph, model_cfg, path, *,
                          batch_size: int = 32, topk: int = 10,
                          layer_fn=None) -> Path:
    """Encode the graph, freeze embeddings, export a top-K scorer.

    The exported program has fixed shapes (StableHLO is static): it maps
    ``(heads int32[batch_size], rels int32[batch_size]) ->
    (scores f32[batch_size, topk], tails int32[batch_size, topk])``.
    Pad short query batches with any valid id and ignore those rows.
    """
    from primekg_rgcn_tpu.models.rgcn import encoder_apply
    from primekg_rgcn_tpu.ops.rgcn_segment import rgcn_layer_segment

    node_emb = encoder_apply(params, graph, model_cfg, train=False,
                             layer_fn=layer_fn or rgcn_layer_segment)
    node_emb = jnp.asarray(node_emb)
    rel_emb = jnp.asarray(params["decoder"]["rel_emb"])

    def predict(heads, rels):
        q = jnp.take(node_emb, heads, axis=0) * jnp.take(rel_emb, rels,
                                                         axis=0)
        scores = q @ node_emb.T
        return jax.lax.top_k(scores, topk)

    from jax import export as jexport

    spec = jax.ShapeDtypeStruct((batch_size,), jnp.int32)
    # Lower for both CPU and TPU so one artifact serves development hosts
    # and production chips alike.
    exp = jexport.export(jax.jit(predict),
                         platforms=("cpu", "tpu"))(spec, spec)
    path = Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_bytes(exp.serialize())
    return path


def load_predictor(path):
    """Deserialize an exported predictor into a plain callable.

    No framework code beyond jax itself is needed — the returned function
    closes over the StableHLO program (embeddings included).
    """
    from jax import export as jexport

    exp = jexport.deserialize(Path(path).read_bytes())

    def predict(heads, rels):
        scores, tails = exp.call(np.asarray(heads, np.int32),
                                 np.asarray(rels, np.int32))
        return np.asarray(scores), np.asarray(tails)

    return predict
