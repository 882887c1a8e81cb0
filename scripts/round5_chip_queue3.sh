#!/bin/bash
# Round-5 chip queue, part 3: the ident03 regime flip, then the scale-1.0
# fanout-8/5 quality training run (serialized chip access).
cd /root/repo
set -x
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-8-5-ident03 --out bench_report.json
# block4 re-run with the SMEM-chunked window fetch (first attempt was a
# compile-time SMEM OOM on the 800K-starts innermost layer).
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-block4-15-10 --out bench_report.json
python -m primekg_rgcn_tpu.train.cli --synthetic --synthetic_scale 1.0 \
  --seed 42 --sample_fanouts 8 5 --sparse_emb --table_opt adafactor \
  --lr 0.001 --grad_clip 0 --epochs 100 --output_dir runs/af_ref_85
