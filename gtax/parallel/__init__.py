from gtax.parallel.mesh import (  # noqa: F401
    MeshConfig,
    batch_sharding,
    make_mesh,
    param_sharding,
    replicated,
)
