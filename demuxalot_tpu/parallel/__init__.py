from .mesh import BARCODE_AXIS, call_sharding, init_distributed, make_mesh, replicated
from .sharded import ColumnDataset, ShardedDemultiplexer

__all__ = [
    "BARCODE_AXIS",
    "ColumnDataset",
    "ShardedDemultiplexer",
    "call_sharding",
    "init_distributed",
    "make_mesh",
    "replicated",
]
