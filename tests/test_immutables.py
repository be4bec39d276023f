"""Hash-deduplicated checkpoint storage of large shared data (reference
``src/utils/Immutable.jl``: big datasets serialize once per run, checkpoints
reference them by content hash)."""

import glob
import os

import jax.numpy as jnp
import numpy as np

import pigeons_tpu as pg
from pigeons_tpu.models import StandardNormalReference, Target


class BigDataTarget(Target):
    """Picklable target embedding a large dataset (module-level so stdlib
    pickle can serialize it into the checkpoint)."""

    def __init__(self, data: np.ndarray):
        self.data = data
        self.dim = 2

    def log_density(self, x):
        xbar = jnp.float32(self.data.mean())
        return -0.5 * jnp.sum((x - xbar) ** 2)

    def default_reference(self):
        return StandardNormalReference(self.dim, sigma=2.0).as_reference()


def test_large_data_written_once_across_rounds(tmp_path):
    data = np.random.default_rng(0).normal(size=(3000, 20))  # ~480 KB

    pt = pg.pigeons(
        target=BigDataTarget(data),
        n_chains=3,
        n_rounds=4,
        checkpoint=True,
        checkpoint_folder=str(tmp_path / "run"),
        show_report=False,
    )
    imm = glob.glob(os.path.join(pt.exec_folder, "immutables", "*.npy"))
    assert len(imm) == 1  # one content hash, written once for all 4 rounds
    metas = glob.glob(os.path.join(pt.exec_folder, "round=*", "checkpoint", "meta.pkl"))
    assert len(metas) == 4
    for m in metas:
        assert os.path.getsize(m) < data.nbytes / 2

    # resume reconstructs the deduped data and extends the run
    pt2 = pg.pigeons(pt.exec_folder)
    assert pt2.round_idx == 4
    assert np.allclose(pt2.inputs.target.data, data)


def test_peak_memory_reported():
    pt = pg.pigeons(
        target=pg.toy_mvn_target(2), n_chains=2, n_rounds=2, show_report=False
    )
    assert pt.reports[-1].peak_memory_bytes >= 0
