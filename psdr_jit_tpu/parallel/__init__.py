from .mesh import make_device_mesh, render_sharded
from .shard import make_fused_train_step, train_step_example

__all__ = [
    "make_device_mesh", "render_sharded",
    "make_fused_train_step", "train_step_example",
]
