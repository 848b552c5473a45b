"""Multi-host data-path semantics, simulated without multiple processes.

The reference never tests its distributed path (SURVEY §4). Here the
per-host sharding contract is unit-tested directly: N simulated hosts each
build their own EnlargedSampler(rank=h) + local loader, and together they
must produce (a) a disjoint, complete, deterministic cover of the global
index stream per epoch, (b) identical re-shuffles on set_epoch across
restarts (the deterministic-resume guarantee of SURVEY §5.3), and (c)
per-host batches that concatenate to the global batch the sharded step
expects (parallel/mesh.local_batch_size)."""

from __future__ import annotations

import numpy as np
import pytest

from trainner_redux_tpu.data.data_sampler import EnlargedSampler


def _host_streams(n_hosts: int, n_samples: int, ratio: int, epoch: int):
    streams = []
    for h in range(n_hosts):
        s = EnlargedSampler(n_samples, num_replicas=n_hosts, rank=h, ratio=ratio)
        s.set_epoch(epoch)
        streams.append(list(iter(s)))
    return streams


@pytest.mark.parametrize("n_hosts", [2, 4, 8])
def test_per_host_shards_cover_globally(n_hosts):
    n_samples, ratio = 37, 4
    streams = _host_streams(n_hosts, n_samples, ratio, epoch=0)
    lens = {len(s) for s in streams}
    assert len(lens) == 1, "hosts must draw equal-length streams"
    # together the host streams are exactly the global permutation stream
    # (virtual indices: datasets resolve idx % len, sampler keeps the raw
    # permutation so repeated visits draw distinct crops)
    total = int(np.ceil(n_samples * ratio / n_hosts)) * n_hosts
    g = np.random.default_rng(0)
    global_stream = g.permutation(total).tolist()
    interleaved = []
    per = len(streams[0])
    for i in range(per):
        for h in range(n_hosts):
            interleaved.append(streams[h][i])
    assert sorted(interleaved) == sorted(global_stream)
    # round-robin disjointness: position i of host h is global index i*H+h
    for h in range(n_hosts):
        assert streams[h] == global_stream[h::n_hosts]


def test_epoch_reshuffle_is_deterministic():
    a = _host_streams(4, 100, 2, epoch=3)
    b = _host_streams(4, 100, 2, epoch=3)
    c = _host_streams(4, 100, 2, epoch=4)
    assert a == b, "same epoch must reshuffle identically across restarts"
    assert a != c, "different epochs must reshuffle"


def test_local_batch_concatenates_to_global():
    """local_batch_size splits the global batch evenly per host; a virtual
    8-device mesh's data axis consumes exactly the concatenation."""
    import jax

    from trainner_redux_tpu.parallel.mesh import (
        batch_sharding,
        local_batch_size,
        make_mesh,
    )

    devices = jax.devices()
    if len(devices) < 8:
        pytest.skip("needs the 8-device virtual platform (tests/conftest.py)")
    mesh = make_mesh({"data": 8})
    global_batch = 16
    # single-process test platform: process_count() == 1
    local = local_batch_size(global_batch, mesh)
    assert local == global_batch // jax.process_count()
    batch = np.arange(global_batch * 4, dtype=np.float32).reshape(global_batch, 4)
    arr = jax.device_put(jax.numpy.asarray(batch), batch_sharding(mesh))
    assert len({s.device for s in arr.addressable_shards}) == 8
    # each device holds a contiguous global_batch/8 slice, in order
    for shard in arr.addressable_shards:
        start = shard.index[0].start or 0
        np.testing.assert_array_equal(np.asarray(shard.data), batch[start : start + 2])


def test_uneven_global_batch_rejected(monkeypatch):
    """On a 4-host setup a global batch of 7 must be refused."""
    import jax

    from trainner_redux_tpu.parallel import mesh as mesh_mod

    m = mesh_mod.make_mesh({"data": min(2, len(jax.devices()))})
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    with pytest.raises(ValueError, match="divisible"):
        mesh_mod.local_batch_size(7, m)
    assert mesh_mod.local_batch_size(8, m) == 2
