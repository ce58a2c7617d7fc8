from vipers.parallel.mesh import make_mesh, shard_batch, vit_param_sharding, replicate  # noqa: F401
from vipers.parallel.pp import make_pp_train_step, pp_vit_apply  # noqa: F401
from vipers.parallel.sp import make_seq_mesh, sequence_parallel, shard_tokens  # noqa: F401
