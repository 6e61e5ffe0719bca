from .hallucinator_kernel import (hallucinate_fused,
                                  hallucinate_fused_from_params)

__all__ = ["hallucinate_fused", "hallucinate_fused_from_params"]
