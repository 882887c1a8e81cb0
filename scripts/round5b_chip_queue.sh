#!/bin/bash
# Round-5 (session 2) chip queue: waits for the ident-crossover sweep to
# release the chip, then measures the historical-cache speed rows and runs
# the reference-scale cache quality qualification (matched protocol to the
# r5 ep100 adafactor record: seed 42, fanout 15/10, sparse adafactor,
# lr 1e-3, no clip, 100 epochs).
cd /root/repo
set -x
while pgrep -f "bench.suite --configs ident-crossover" >/dev/null 2>&1; do
  sleep 20
done
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-full-cache-15-10 --out bench_report.json
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-cache-15-10 --out bench_report.json
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-cache-8-5 --out bench_report.json
python -m primekg_rgcn_tpu.train.cli --synthetic --synthetic_scale 1.0 \
  --seed 42 --sample_fanouts 15 10 --sparse_emb --table_opt adafactor \
  --lr 0.001 --grad_clip 0 --epochs 100 --cache_layer1 \
  --output_dir runs/af_ref_cache
