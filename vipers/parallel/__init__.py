from vipers.parallel.mesh import make_mesh, shard_batch, vit_param_sharding, replicate  # noqa: F401
