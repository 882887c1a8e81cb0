from primekg_rgcn_tpu.analyze.core import AnalysisContext

__all__ = ["AnalysisContext"]
