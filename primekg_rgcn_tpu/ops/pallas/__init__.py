from primekg_rgcn_tpu.ops.pallas.segment_sum import sorted_segment_sum_pallas

__all__ = ["sorted_segment_sum_pallas"]
