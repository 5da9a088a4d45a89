"""Pin-vs-spill policy for iterative state (round-2 verdict caveat #5).

The iterative graph ops (connected components, PageRank, BFS, ancestor
closure) must hold their edge/label state ACROSS rounds — re-executing the
upstream DAG every round would multiply the whole pipeline's cost by the
round count.  The default is ``Dataset.materialize()``: object-store
resident, spillable by Ray, zero extra I/O.  At 100 TB the stricter answer
is to take the state out of the object store entirely: set
``KGBH_ITER_SPILL_DIR`` and every ``pin()`` call writes the blocks to
partitioned Parquet under that directory and returns a lazy read view —
each round then streams the state from disk instead of pinning
corpus-scale blocks, and a killed job can resume its rounds from the
on-disk state.

Both paths produce identical data (tested: tests/test_cc_conll_registry.py
runs the distributed CC adversarial chain under the spill env and asserts
equality).  Spill directories are content-independent scratch (caller owns
cleanup of the root, like any scratch dir).
"""

from __future__ import annotations

import os
import tempfile

SPILL_ENV = "KGBH_ITER_SPILL_DIR"


def pin(ds, tag: str = "iter"):
    """Stabilize an iterative-state Dataset for multi-round reuse.

    Default: ``materialize()`` (object store, Ray-spillable).  With
    ``KGBH_ITER_SPILL_DIR`` set: write Parquet there, return a read view —
    out-of-core iterative state.  Empty datasets (no files written) fall
    back to the in-memory path; they are by definition tiny."""
    root = os.environ.get(SPILL_ENV)
    if not root:
        return ds.materialize()
    import ray.data as rd

    os.makedirs(root, exist_ok=True)
    out = tempfile.mkdtemp(prefix=f"{tag}-", dir=root)
    ds.write_parquet(out)
    files = [f for f in os.listdir(out) if f.endswith(".parquet")]
    if not files:
        return ds.materialize()
    return rd.read_parquet(out)
