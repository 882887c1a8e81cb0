"""Overlap-structure invariants of the Pallas halo exchange schedule.

The kernel body is generated from ``halo_schedule(n)`` (ops/pallas/halo.py),
so asserting the event ordering on the schedule list locks the
double-buffered structure: every remote transfer must be issued before any
completion wait, with the local-slot copy in between (VERDICT.md round-1
item 6). Numerical parity with ``lax.all_to_all`` is covered separately in
tests/test_node_shard.py.
"""

import numpy as np
import pytest

from primekg_rgcn_tpu.ops.pallas.halo import halo_schedule


@pytest.mark.parametrize("n", [2, 4, 8])
def test_all_starts_precede_all_waits(n):
    ev = halo_schedule(n)
    kinds = [k for k, _ in ev]
    last_start = max(i for i, k in enumerate(kinds) if k == "start")
    first_wait = min(i for i, k in enumerate(kinds) if k == "wait")
    assert last_start < first_wait, (
        "a wait fences an unissued transfer: no overlap")


@pytest.mark.parametrize("n", [2, 4, 8])
def test_local_copy_overlaps_transfers(n):
    ev = halo_schedule(n)
    kinds = [k for k, _ in ev]
    i = kinds.index("local_copy")
    assert "start" in kinds[:i] and "wait" in kinds[i:], (
        "local copy must run while remote DMAs are in flight")


@pytest.mark.parametrize("n", [2, 3, 4, 8])
def test_every_transfer_started_once_and_waited_once(n):
    ev = halo_schedule(n)
    starts = sorted(i for k, i in ev if k == "start")
    waits = sorted(i for k, i in ev if k == "wait")
    assert starts == list(range(n - 1)) == waits


@pytest.mark.parametrize("n", [2, 3, 4, 8])
def test_staggered_ring_has_no_semaphore_collisions(n):
    """At transfer slot i, receiver r's semaphore is signaled by exactly one
    sender: senders d target peer (d+1+i) % n, so slot (r, i) belongs to
    d = (r-1-i) % n alone."""
    for i in range(n - 1):
        targets = [(d + 1 + i) % n for d in range(n)]
        assert sorted(targets) == list(range(n)), "peer collision in slot"
        assert all(t != d for d, t in enumerate(targets)), "self-send"
