from aha_tpu.parallel.mesh import (
    apply_named_sharding,
    batch_spec,
    make_mesh,
    param_specs,
)

__all__ = ["apply_named_sharding", "batch_spec", "make_mesh", "param_specs"]
