"""TPU compute primitives.

Every op ships two implementations:
  * an XLA reference (`*_reference`) — always correct, differentiable, used on
    CPU test meshes and as the numerical oracle;
  * a Pallas TPU kernel — the production path on real chips.

These replace the cuDNN/cutlass/bitsandbytes kernel layer the reference gets
from upstream torch wheels (SURVEY.md §2.1 "Native-dep rows").
"""

from . import attention, decode_attention, mlp, patch_embed, rmsnorm, rope  # noqa: F401
from .attention import flash_attention, mha_reference  # noqa: F401
from .ring_attention import ring_attention, ring_self_attention  # noqa: F401
from .decode_attention import decode_attention as decode_attention_op  # noqa: F401
from .mlp import gelu_mlp, silu_mlp  # noqa: F401
from .patch_embed import patch_embed as patch_embed_op  # noqa: F401
from .rmsnorm import layer_norm, rms_norm  # noqa: F401
from .rope import apply_rope, rope_cos_sin  # noqa: F401
