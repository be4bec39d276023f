"""Per-host entry point for cluster jobs (generated submission scripts run
this on every host; reference ``.launch_script.jl`` analogue,
``src/submission/submission_utils.jl:160-196``)."""

from __future__ import annotations

import argparse
import pickle


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("--inputs", required=True)
    parser.add_argument("--exec-folder", required=True)
    parser.add_argument("--n-hosts", type=int, default=1)
    parser.add_argument("--coordinator", default=None)
    parser.add_argument("--process-id", type=int, default=None)
    args = parser.parse_args()

    with open(args.inputs, "rb") as f:
        inputs = pickle.load(f)
    inputs.checkpoint = True
    inputs.checkpoint_folder = args.exec_folder

    from pigeons_tpu.submission import MultiHostLauncher

    launcher = MultiHostLauncher(
        coordinator_address=args.coordinator,
        num_processes=args.n_hosts if args.coordinator else None,
        process_id=args.process_id,
    )
    launcher.submit(inputs)


if __name__ == "__main__":
    main()
