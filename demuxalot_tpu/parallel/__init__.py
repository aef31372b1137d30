from .mesh import BARCODE_AXIS, call_sharding, init_distributed, make_mesh, replicated
from .sharded import ShardedDemultiplexer

__all__ = [
    "BARCODE_AXIS",
    "ShardedDemultiplexer",
    "call_sharding",
    "init_distributed",
    "make_mesh",
    "replicated",
]
