from primekg_rgcn_tpu.train.neg_sampling import sample_negatives
from primekg_rgcn_tpu.train.loop import Trainer, TrainState

__all__ = ["sample_negatives", "Trainer", "TrainState"]
