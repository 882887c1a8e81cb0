import jax
jax.config.update("jax_platforms", "cpu")
import time
from primekg_rgcn_tpu.analyze.run_full_analysis import AnalysisPipeline

t0 = time.time()
pipe = AnalysisPipeline(
    "runs/synth_full/models/best_model", "runs/synth_full/results_smoke",
    "runs/synth_full/synthetic_data",
    diseases=["synthetic disease 10"],
    explanations=[("synthetic drug 5", "synthetic disease 3")])
results = pipe.run_all(skip=["evaluate"])
print("total %.1fs" % (time.time() - t0))
for k, v in results.items():
    print(k, v)
