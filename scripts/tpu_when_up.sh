#!/bin/bash
# Chip-measurement queue: run when the hosted TPU tunnel recovers.
# (The round-2 slimmings changed the sampled-path memory profile; these
# re-measurements update bench_report.json, and psum_probe chases the
# open hosted-backend sharded-step anomaly in ROADMAP item 8.)
cd /root/repo || exit 1
echo "=== headline $(date)"
timeout 1200 python bench.py
echo "=== sampled suite $(date)"
timeout 3600 python -m primekg_rgcn_tpu.bench.suite \
    --configs sampled-10m-15-10 sampled-full-15-10 sampled-15-10
echo "=== psum probe $(date)"
timeout 1200 python -m primekg_rgcn_tpu.bench.psum_probe
echo "=== done $(date)"
