from .demux import Demultiplexer
from .genotypes import ProbabilisticGenotypes

__all__ = ["Demultiplexer", "ProbabilisticGenotypes"]
