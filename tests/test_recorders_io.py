"""Extended traces, disk recorder, process_sample, and plots
(reference test/test_traces.jl, test_recorders.jl)."""

import os

import matplotlib
import numpy as np

matplotlib.use("Agg")

from pigeons_tpu import pigeons, toy_mvn_target
from pigeons_tpu.checkpoint import process_sample
from pigeons_tpu.inputs import RECORD_DEFAULT
from pigeons_tpu.plots import plot_cumulative_barrier, plot_index_process, plot_local_barrier


def run(tmp_path, **kw):
    base = dict(
        target=toy_mvn_target(2), n_chains=4, n_rounds=4, seed=1, show_report=False,
        checkpoint=True, checkpoint_folder=str(tmp_path / "run"),
    )
    base.update(kw)
    return pigeons(**base)


def test_extended_traces(tmp_path):
    pt = run(tmp_path, extended_traces=True)
    ext = pt.extended_sample_array()
    assert ext.shape == (16, 4, 3)
    # the target chain's column matches the pooled target trace
    target_col = ext[:, 3, :]
    np.testing.assert_array_equal(target_col, pt.sample_array())


def test_disk_recorder_and_process_sample(tmp_path):
    pt = run(tmp_path, record=RECORD_DEFAULT + ("disk",))
    rows = list(process_sample(pt.exec_folder))
    assert len(rows) == 2 + 4 + 8 + 16
    last = np.stack([r[2] for r in rows if r[0] == 4])
    np.testing.assert_array_equal(last, pt.sample_array())
    # single-round streaming
    r3 = list(process_sample(pt.exec_folder, round_idx=3))
    assert len(r3) == 8


def test_plots(tmp_path):
    pt = run(tmp_path, record=RECORD_DEFAULT + ("index_process",))
    assert plot_index_process(pt) is not None
    assert plot_local_barrier(pt) is not None
    assert plot_cumulative_barrier(pt) is not None
