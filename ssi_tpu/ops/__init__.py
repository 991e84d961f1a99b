from ssi_tpu.ops.attention import attention, xla_attention  # noqa: F401
from ssi_tpu.ops.cross_entropy import cross_entropy_sum_and_count, fused_cross_entropy  # noqa: F401
