#!/bin/bash
# Round-5 serialized chip queue (ONE process may touch the axon tunnel at a
# time — see memory: two concurrent chip processes wedge it silently).
# Each bench is under `timeout` so a hosted-frontend stall cannot absorb the
# rest of the queue; a timed-out row just logs and the queue continues.
cd /root/repo
set -x
# 1. VERDICT item 1 (speed side): fanout 8/5 on the 10M-node config-5 graph.
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-8-5 --out bench_report.json
# 2. VERDICT item 2: the stalled Pallas window-fetch bake-off, via the
#    integrated suite row (reliable path; no standalone 800 MB upload).
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-block-pallas-15-10 --out bench_report.json
# 3. VERDICT item 6: config-3 step decomposition.
timeout 2400 python -m primekg_rgcn_tpu.bench.config3_probe \
  --out bench_report.json
# 4. VERDICT item 7: refresh the rows that now publish normalized metrics
#    + floor fields.
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs rmat-large eval-ranking primekg-default primekg-full \
  --out bench_report.json
# 5. Confirm the north-star line carries the new floor fields on chip.
timeout 1200 python bench.py
# 6. VERDICT item 1 (quality side): fanout-8/5 run at reference scale 1.0,
#    protocol identical to runs/af_ref_lr3 (seed 42, adafactor, lr 1e-3).
python -m primekg_rgcn_tpu.train.cli --synthetic --synthetic_scale 1.0 \
  --seed 42 --sample_fanouts 8 5 --sparse_emb --table_opt adafactor \
  --lr 0.001 --grad_clip 0 --epochs 100 --output_dir runs/af_ref_85
