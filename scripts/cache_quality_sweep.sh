#!/bin/bash
# Historical-cache 3-seed quality qualification (r4 block-mode protocol:
# synthetic PrimeKG scale 0.1, 40 epochs, fanout 15/10, 3 seeds
# {42, 7, 123}, identical eval). Both arms run the SAME trainer config
# (sparse_emb + adafactor, the reference-scale protocol) so the only
# delta is the historical cache. Usage: bash scripts/cache_quality_sweep.sh
cd /root/repo
set -x
for seed in 42 7 123; do
  for arm in uniform cache; do
    out=runs/q_cache_${arm}_${seed}
    extra=""
    if [ "$arm" = cache ]; then extra="--cache_layer1"; fi
    timeout 2400 python -m primekg_rgcn_tpu.train.cli --synthetic \
      --synthetic_scale 0.1 --seed $seed --sample_fanouts 15 10 \
      --sparse_emb --table_opt adafactor --lr 0.001 --grad_clip 0 \
      --epochs 40 $extra --output_dir $out
    timeout 1200 python -m primekg_rgcn_tpu.evaluate.cli \
      --model_path $out/models/final_model \
      --data_dir $out/synthetic_data --output_dir $out/eval
  done
done
python - <<'EOF'
import json
rows = {}
for seed in (42, 7, 123):
    for arm in ("uniform", "cache"):
        p = f"runs/q_cache_{arm}_{seed}/eval/results.json"
        try:
            r = json.load(open(p))
        except OSError:
            print("MISSING", p)
            continue
        rows[(arm, seed)] = r
for m, path in (("auc_roc", ("metrics", "classification", "auc_roc")),
                ("f1", ("metrics", "classification", "f1_score")),
                ("mrr", ("metrics", "ranking", "mrr")),
                ("hits@10", ("metrics", "ranking", "hits@10")),
                ("median", ("metrics", "ranking", "median_rank"))):
    line = [m]
    for arm in ("uniform", "cache"):
        vals = [rows[(arm, s)] for s in (42, 7, 123) if (arm, s) in rows]
        def dig(r):
            d = r
            for k in path:
                d = d.get(k, {}) if isinstance(d, dict) else {}
            return d if not isinstance(d, dict) else None
        got = [dig(v) for v in vals]
        got = [g for g in got if isinstance(g, (int, float))]
        line.append(f"{arm}: " + (f"{sum(got)/len(got):.4f}" if got else "?")
                    + " " + str([round(g, 4) for g in got]))
    print(" | ".join(line))
EOF
