"""Multi-host plumbing (tpumix/parallel/distributed.py + BatchIterator
sharding) on the single-process 8-device CPU simulation mesh.

The reference has nothing distributed to mirror (SURVEY.md §5.8); these pin
tpumix's own multi-process contracts: work-split math, the host-local ->
global-array batch path, and loader sharding invariants.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tpumix.data.prefetch import BatchIterator
from tpumix.parallel import (
    batch_sharding,
    global_batch,
    initialize,
    make_mesh,
    process_count,
    process_index,
    shard_batch,
    shard_range,
)


class TestInitialize:
    def test_single_process_noop(self):
        # pinned session = 1 process; initialize must not raise or hang
        assert initialize() is False
        assert process_count() == 1
        assert process_index() == 0


class TestShardRange:
    def test_exact_partition(self):
        for n in (0, 1, 7, 8, 23):
            for count in (1, 2, 3, 8):
                spans = [shard_range(n, i, count) for i in range(count)]
                # contiguous, disjoint, exhaustive
                assert spans[0][0] == 0 and spans[-1][1] == n
                for (a, b), (c, d) in zip(spans, spans[1:]):
                    assert b == c
                sizes = [hi - lo for lo, hi in spans]
                assert max(sizes) - min(sizes) <= 1

    def test_bad_index_raises(self):
        with pytest.raises(ValueError):
            shard_range(10, 3, 2)


class TestGlobalBatch:
    def test_single_process_equals_shard_batch(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device simulation mesh")
        mesh = make_mesh((8,), ("dp",))
        x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
        g = global_batch({"x": x}, mesh)["x"]
        ref = shard_batch({"x": x}, mesh)["x"]
        assert g.sharding == batch_sharding(mesh, 2)
        np.testing.assert_array_equal(np.asarray(g), np.asarray(ref))

    def test_feeds_pjit_step(self):
        if len(jax.devices()) < 8:
            pytest.skip("needs the 8-device simulation mesh")
        mesh = make_mesh((8,), ("dp",))
        x = np.ones((16, 4), np.float32)
        g = global_batch((x,), mesh)[0]
        out = jax.jit(lambda a: jnp.sum(a * 2.0))(g)
        assert float(out) == 128.0


class TestShardedBatchIterator:
    def _ds(self, n=24):
        class DS:
            def __len__(self):
                return n

            def __getitem__(self, i):
                return (np.full((3,), i, np.float32), np.float32(i))

        return DS()

    def test_shards_partition_epoch(self):
        ds = self._ds(24)
        seen = []
        for idx in range(3):
            it = BatchIterator(ds, batch_size=2, seed=7, num_shards=3, shard_index=idx)
            assert len(it) == 4  # 24/3 items -> 4 batches of 2 per shard
            for stems, label in it:
                assert stems.shape == (2, 3)
                seen.extend(label.tolist())
        assert sorted(int(v) for v in seen) == list(range(24))

    def test_same_seed_same_global_order(self):
        ds = self._ds(12)
        a = [l.tolist() for _, l in BatchIterator(ds, 2, seed=3, num_shards=2, shard_index=0)]
        b = [l.tolist() for _, l in BatchIterator(ds, 2, seed=3, num_shards=2, shard_index=0)]
        # fresh iterators over fresh constructions are deterministic
        assert a == b

    def test_uneven_dataset_keeps_shards_equal_length(self):
        ds = self._ds(25)  # 25 items over 2 shards -> 12 each, 1 dropped
        lens = {
            idx: sum(1 for _ in BatchIterator(ds, 3, seed=0, num_shards=2, shard_index=idx))
            for idx in range(2)
        }
        assert lens[0] == lens[1] == 4

    def test_bad_shard_index(self):
        with pytest.raises(ValueError):
            BatchIterator(self._ds(), 2, num_shards=2, shard_index=2)


def test_two_process_bootstrap(tmp_path):
    """REAL multi-process bring-up: two local processes coordinate through
    jax.distributed via tpumix.parallel.initialize.  This is the regression
    test for the round-2 bug where the guard's jax.process_count() call
    initialised the XLA backend first and made bootstrap impossible."""
    import subprocess
    import sys

    script = r"""
import sys
from tpumix.parallel import initialize, process_count, process_index, shard_range
import jax

active = initialize(coordinator_address="127.0.0.1:7723",
                    num_processes=2, process_id=int(sys.argv[1]))
assert active is True
assert process_count() == 2
lo, hi = shard_range(10)
print(f"RESULT {process_index()} {lo} {hi}", flush=True)
"""
    import os as _os

    env = {**_os.environ, "JAX_PLATFORMS": "cpu"}
    env.pop("XLA_FLAGS", None)
    # the session sitecustomize registers (and touches) the remote-TPU
    # backend when this var is set — the child must come up untouched for
    # jax.distributed.initialize to be allowed to run
    env.pop("PALLAS_AXON_POOL_IPS", None)
    procs = [
        subprocess.Popen([sys.executable, "-c", script, str(i)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail("distributed bootstrap deadlocked")
        outs.append(out)
        assert p.returncode == 0, out
    results = sorted(
        line for out in outs for line in out.splitlines() if line.startswith("RESULT")
    )
    assert results == ["RESULT 0 0 5", "RESULT 1 5 10"], results
