"""Multi-chip execution: device meshes, halo exchange, sharded pipelines."""
from .mesh import make_mesh  # noqa: F401
from .sharded import (  # noqa: F401
    sharded_neighbourhood, sharded_oi_kernel,
)
