#!/bin/bash
# Round-5 chip queue, part 2 (serialized; see round5_chip_queue.sh).
cd /root/repo
set -x
# Regime-boundary hypothesis: 8/5 with the identity threshold lowered so
# its ~4.7M-slot innermost stream stays in identity mode.
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-8-5-ident04 --out bench_report.json
# Multi-window block (quality fix) speed check + re-measure the block row
# under the new pallas window default.
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-block4-15-10 --out bench_report.json
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-block-15-10 --out bench_report.json
# config-3 step decomposition (VERDICT item 6).
timeout 2400 python -m primekg_rgcn_tpu.bench.config3_probe \
  --out bench_report.json
# Refresh rows that now publish normalized metrics + floor fields.
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs rmat-large eval-ranking primekg-default primekg-full \
  --out bench_report.json
# North-star line with the new floor fields, on chip.
timeout 1200 python bench.py
