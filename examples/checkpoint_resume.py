"""Checkpoint and resume.

With ``checkpoint=True`` every round writes a checkpoint under the run's
exec folder (results/all/<timestamp>, results/latest symlink) with a
``.finished`` marker; ``load_pt`` resumes from the latest complete round —
bitwise-identically, even on a different device layout (elastic resume).

Run:  python examples/checkpoint_resume.py
"""

import pathlib
import sys

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.expanduser("~/.cache/jax_pigeons"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np

from pigeons_tpu import Inputs, PT, toy_mvn_target
from pigeons_tpu.checkpoint import increment_n_rounds, load_pt

pt = PT(
    Inputs(
        target=toy_mvn_target(10), n_chains=6, n_rounds=6, seed=1,
        checkpoint=True, show_report=False,
    )
)
pt.run()
folder = pt.exec_folder
print("checkpointed run folder:", folder)

# resume the finished run and extend it by two more rounds
resumed = increment_n_rounds(folder, 2)
resumed.run()
print("extended to round", resumed.round_idx,
      "mean[:3]:", resumed.mean()[:3])

# true resume determinism: load the ROUND-4 checkpoint, recompute rounds 5-6
# from it, and require bitwise agreement with the uninterrupted run — the
# resumed process re-derives every RNG stream from (seed, round, scan,
# replica), so recomputation matches, not just deserialization
again = load_pt(folder, round_idx=4)
while again.round_idx < 6:
    again.run_round()
assert np.array_equal(pt.sample_array(), again.sample_array())
print("bitwise recompute-from-round-4 resume: OK")
