from .demux import Demultiplexer, PackedCalls
from .genotypes import ProbabilisticGenotypes

__all__ = ["Demultiplexer", "PackedCalls", "ProbabilisticGenotypes"]
