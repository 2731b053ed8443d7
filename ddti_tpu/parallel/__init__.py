from .mesh import (  # noqa: F401
    batch_sharding,
    make_mesh,
    parse_mesh_spec,
    replicated,
    shard_batch,
    train_state_sharding,
)
from .multihost import (  # noqa: F401
    MultihostSpec,
    initialize_multihost,
    process_local_batch,
    spec_from,
)
