"""Minimal wall-clock timer context manager (reference: demuxalot/utils.py:134-144).

For kernel-level profiling use ``jax.profiler`` traces; this is the host-side
convenience used in examples and benchmarks.
"""
from __future__ import annotations

import time


class Timer:
    def __init__(self, name: str):
        self.name = name
        self.start_time = time.time()

    def __enter__(self):
        return self

    def __exit__(self, *_args):
        self.time_taken = time.time() - self.start_time
        print("Timer {} completed in  {:.3f} seconds".format(self.name, self.time_taken))
