"""Real multi-process distributed execution (VERDICT r3 #4).

dryrun_multiprocess spawns 2 fresh interpreters joined via
jax.distributed.initialize over a loopback coordinator (gloo CPU
collectives) and runs: a DP train step whose gradient all-reduce
crosses the process boundary (asserting rank-identical losses),
per-host input sharding via shard_for_host +
make_array_from_process_local_data, process-keyed SubsetShard
coverage, and webdataset split_by_host partitioning. Reference
equivalent: PL multi-node DDP (/root/reference/main.py:784-785).
"""

import os
import sys

import pytest


def test_dryrun_multiprocess_2x2():
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __graft_entry__ as g

    # 2 processes x 2 virtual CPU devices each; workers run in fresh
    # interpreters with their own env, so the test process's jax state
    # (conftest forces single-process CPU) is irrelevant
    g.dryrun_multiprocess(2, 2, timeout_s=900.0)
