#!/bin/bash
# Round-5 chip queue, part 4 (run after the af_ref_85 training completes):
# refresh the 8/5 row under the new ident default and measure the
# block x low-budget compositions.
cd /root/repo
set -x
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-8-5 --out bench_report.json
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-block-8-5 --out bench_report.json
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-10m-block4-8-5 --out bench_report.json
timeout 2400 python -m primekg_rgcn_tpu.bench.suite \
  --configs sampled-full-8-5 --out bench_report.json
