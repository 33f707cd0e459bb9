from .segments import (  # noqa: F401
    chain_motions,
    make_mesh,
    shard_frames,
    sharded_chain_motions,
    sharded_sequence_vo,
)
from .unified import sharded_unified_scan  # noqa: F401
