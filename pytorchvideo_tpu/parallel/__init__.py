from pytorchvideo_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    replicated,
    shard_batch,
)
from pytorchvideo_tpu.parallel.sharding import (  # noqa: F401
    MEGATRON_ATTENTION_RULES,
    infer_param_shardings,
    optimizer_state_shardings,
)
from pytorchvideo_tpu.parallel.collectives import (  # noqa: F401
    all_gather_with_grad,
    cat_all_gather,
)
from pytorchvideo_tpu.parallel.sequence import (  # noqa: F401
    sequence_parallel_attention,
)
