"""Layout invariance: sharded runs must match single-device runs bit-for-bit.

The analogue of the reference's flagship "parallelism invariance" guarantee
(reference docs/src/distributed.md:39-44, test/test_parallelism_invariance.jl):
the output of a run is identical for any machines x threads configuration.
Here: identical for any replica-mesh device count, because RNG streams derive
from global replica indices and cross-device combines only add exact zeros.
"""

import jax
import numpy as np
import pytest

from pigeons_tpu import Inputs, PT, SliceSampler, toy_mvn_target
from pigeons_tpu.parallel import replica_mesh


def run(mesh, explorer=None, n_chains=8, n_rounds=4, dim=3):
    pt = PT(
        Inputs(
            target=toy_mvn_target(dim),
            n_chains=n_chains,
            n_rounds=n_rounds,
            seed=5,
            explorer=explorer,
            show_report=False,
            mesh=mesh,
        )
    )
    pt.run()
    return pt


@pytest.mark.parametrize("n_devices", [2, 4, 8])
def test_bitwise_layout_invariance(n_devices):
    serial = run(None)
    mesh = replica_mesh(jax.devices()[:n_devices])
    sharded = run(mesh)

    assert np.array_equal(serial.sample_array(), sharded.sample_array())
    np.testing.assert_array_equal(
        np.asarray(serial.chain_of), np.asarray(sharded.chain_of)
    )
    np.testing.assert_array_equal(
        np.sort(np.asarray(serial.states), axis=0),
        np.sort(np.asarray(sharded.states), axis=0),
    )
    assert serial.n_round_trips == sharded.n_round_trips
    assert serial.n_tempered_restarts == sharded.n_tempered_restarts
    assert serial.reports[-1].log_z_estimate == sharded.reports[-1].log_z_estimate
    np.testing.assert_array_equal(serial.reduced.accept_mean, sharded.reduced.accept_mean)
    np.testing.assert_array_equal(serial.reduced.energy_ac1, sharded.reduced.energy_ac1)


def test_bitwise_invariance_slice_sampler():
    serial = run(None, explorer=SliceSampler(n_passes=1))
    sharded = run(replica_mesh(jax.devices()[:4]), explorer=SliceSampler(n_passes=1))
    assert np.array_equal(serial.sample_array(), sharded.sample_array())
    assert serial.reports[-1].log_z_estimate == sharded.reports[-1].log_z_estimate


def test_indivisible_chain_count_rejected():
    mesh = replica_mesh(jax.devices()[:4])
    with pytest.raises(ValueError, match="divisible"):
        run(mesh, n_chains=6)


def _run_replicates(mesh, n_replicates=4):
    pt = PT(
        Inputs(
            target=toy_mvn_target(3),
            n_chains=4,
            n_rounds=4,
            seed=9,
            n_replicates=n_replicates,
            explorer=SliceSampler(n_passes=1),
            show_report=False,
            mesh=mesh,
        )
    )
    pt.run()
    return pt


@pytest.mark.parametrize("n_devices", [2, 4])
def test_replicate_axis_sharding_bitwise(n_devices):
    """R independent ladders sharded over the mesh match the unsharded batch
    bit-for-bit (no collectives: each device runs whole ladders)."""
    serial = _run_replicates(None)
    sharded = _run_replicates(replica_mesh(jax.devices()[:n_devices]))
    assert np.array_equal(serial.sample_array(), sharded.sample_array())
    assert serial.n_round_trips == sharded.n_round_trips
    np.testing.assert_array_equal(
        serial.reduced.accept_mean, sharded.reduced.accept_mean
    )
    assert serial.reports[-1].log_z_estimate == sharded.reports[-1].log_z_estimate


def test_indivisible_replicate_count_rejected():
    mesh = replica_mesh(jax.devices()[:4])
    with pytest.raises(ValueError, match="divisible"):
        _run_replicates(mesh, n_replicates=6)


@pytest.mark.slow
def test_pallas_explorer_under_chain_sharded_mesh():
    """The batched Pallas explorer runs inside shard_map, and the kernel's
    counter-based RNG is a pure function of each lane's GLOBAL replica-index
    seed — never the device index or block layout — so the chain-sharded run
    is bitwise identical to its single-device twin (the reference's
    parallelism invariance, docs/src/distributed.md:39-44, now including the
    fast path)."""
    from pigeons_tpu import SliceSamplerPallas

    def go(mesh):
        pt = PT(
            Inputs(
                target=toy_mvn_target(2),
                n_chains=8,
                n_rounds=6,
                seed=11,
                explorer=SliceSamplerPallas(interpret=True, n_passes=1),
                show_report=False,
                mesh=mesh,
            )
        )
        pt.run()
        return pt

    sharded = go(replica_mesh(jax.devices()[:4]))
    assert np.isfinite(sharded.reports[-1].log_z_estimate)
    assert np.abs(sharded.mean()).max() < 0.35
    single = go(None)
    assert np.array_equal(single.sample_array(), sharded.sample_array())
    assert single.n_round_trips == sharded.n_round_trips
    assert (
        single.reports[-1].log_z_estimate == sharded.reports[-1].log_z_estimate
    )


@pytest.mark.slow
def test_pallas_explorer_replicate_sharded_mesh():
    """Replicate-axis sharding + the batched Pallas explorer: per-lane seeds
    derive from each replicate's OWN master-key stream, so the sharded run is
    bitwise identical to the unsharded flat-batch run."""
    from pigeons_tpu import SliceSamplerPallas

    def go(mesh):
        pt = PT(
            Inputs(
                target=toy_mvn_target(2),
                n_chains=4,
                n_rounds=5,
                seed=13,
                n_replicates=4,
                explorer=SliceSamplerPallas(interpret=True, n_passes=1),
                show_report=False,
                mesh=mesh,
            )
        )
        pt.run()
        return pt

    pt = go(replica_mesh(jax.devices()[:2]))
    assert pt.sample_array().shape[0] == 2**5 * 4
    assert np.abs(pt.mean()).max() < 0.35
    serial = go(None)
    assert np.array_equal(serial.sample_array(), pt.sample_array())
    assert serial.n_round_trips == pt.n_round_trips
