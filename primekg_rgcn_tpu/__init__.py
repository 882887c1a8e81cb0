"""primekg_rgcn_tpu — a TPU-native relational message-passing framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
PrimeKG-RGCN-LinkPrediction pipeline (PyTorch + PyG, see /root/reference):

- ``data``      — vectorized PrimeKG preprocessing, static-shape relation-bucketed
                  graph format, synthetic generators, artifact IO compatible with
                  the reference's ``.pt`` contract (reference: src/preprocess.py).
- ``ops``       — dense oracle + XLA segment-sum + Pallas SpMM implementations of
                  the relation-typed message passing that the reference delegates
                  to PyG's RGCNConv (reference: src/models/rgcn.py:72-85).
- ``models``    — RGCN encoder / DistMult decoder / link-prediction model as pure
                  functional pytrees (reference: src/models/rgcn.py).
- ``train``     — jit-compiled full-epoch training with negative sampling, optax,
                  checkpointing (reference: src/train.py).
- ``parallel``  — jax.sharding Mesh + shard_map edge-partitioned execution with
                  psum gradient/aggregation collectives (no analogue in the
                  single-device reference).
- ``evaluate``  — vectorized on-device classification + ranking metrics and the
                  results.json contract (reference: src/evaluate.py).
- ``analyze``   — the post-hoc analysis suite (reference: src/error_analysis.py,
                  case_studies.py, visualize_embeddings.py, explain_predictions.py,
                  medical_validation.py, compare_methods.py, analyze_failures.py,
                  run_full_analysis.py).
"""

__version__ = "0.1.0"
