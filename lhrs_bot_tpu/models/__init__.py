from .constants import (  # noqa: F401
    DEFAULT_IM_END_TOKEN,
    DEFAULT_IM_START_TOKEN,
    DEFAULT_IMAGE_PATCH_TOKEN,
    DEFAULT_IMAGE_TOKEN,
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    NUM_IMAGE_TOKENS,
)
from .build import build_model  # noqa: F401
from .llama import KVCache, LlamaConfig, causal_lm_loss, init_llama_params, llama_apply, llama_decode_step, llama_prefill  # noqa: F401
from .lora import LoraConfig, init_lora_params, merge_lora  # noqa: F401
from .perceiver import PerceiverConfig, init_perceiver_params, perceiver_resample  # noqa: F401
from .splice import SplicedBatch, splice_image_embeddings  # noqa: F401
from .vit import ViTConfig, init_vit_params, vit_encode  # noqa: F401
from .vlm import (  # noqa: F401
    VLMConfig,
    effective_llama_params,
    encode_image,
    init_vlm_params,
    prepare_multimodal_inputs,
    trainable_mask,
    vlm_forward_loss,
)
