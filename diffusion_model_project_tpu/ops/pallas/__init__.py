from .groupnorm_silu import fused_groupnorm_act
from .attention import fused_attention

__all__ = ["fused_groupnorm_act", "fused_attention"]
