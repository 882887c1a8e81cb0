from primekg_rgcn_tpu.models.rgcn import (
    init_params,
    encoder_apply,
    encoder_apply_sampled,
    encoder_apply_cached,
    model_apply,
    predict,
    predict_all_tails,
    get_embeddings,
    count_params,
)

__all__ = [
    "init_params",
    "encoder_apply",
    "encoder_apply_sampled",
    "encoder_apply_cached",
    "model_apply",
    "predict",
    "predict_all_tails",
    "get_embeddings",
    "count_params",
]
