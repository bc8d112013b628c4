from .mesh import (  # noqa: F401
    DATA_AXIS,
    MODEL_AXIS,
    data_sharding,
    is_main_process,
    make_mesh,
    process_count,
    process_index,
    replicated,
)
from .partition import (  # noqa: F401
    batch_specs,
    kv_cache_spec,
    llama_param_specs,
    llama_serving_specs,
    shard_llama_for_serving,
    shard_params,
    to_named,
    vlm_param_specs,
)
from .context import (  # noqa: F401
    SEQ_AXIS,
    context_parallel_apply,
    make_cp_mesh,
)
