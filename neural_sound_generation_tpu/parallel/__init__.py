from neural_sound_generation_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    mesh_from_args,
    batch_sharding,
    replicated_sharding,
    model_param_shardings,
    shard_batch,
)
from neural_sound_generation_tpu.parallel.distributed import (  # noqa: F401
    HostTopology,
    initialize,
    loader_shard_args,
    topology,
)
from neural_sound_generation_tpu.parallel.sequence import (  # noqa: F401
    halo_conv1d,
    sharded_conv1d,
)
from neural_sound_generation_tpu.parallel.pipeline import (  # noqa: F401
    make_pp_mesh,
    make_pp_prior_train_step,
    make_pp_wavenet_train_step,
    pipeline_blocks,
    pp_opt_state_from_dense,
    pp_opt_state_to_dense,
    pp_prior_partition,
    pp_prior_split,
    pp_prior_unpartition,
    prior_pp_logits,
    stack_layer_params,
    unstack_layer_params,
    wavenet_pp_logits,
    wavenet_stack_params,
    wavenet_unstack_params,
)
