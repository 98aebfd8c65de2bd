#!/usr/bin/env python
"""Serial TPU measurement batch in ONE process (fresh-process backend init
through the axon tunnel costs ~400 s — batch everything; memory note in
~/.claude). Order: official bench first (cleanest HBM state), then the
degenerate-input contract, hardware parity validation, per-kernel/train
breakdown, and the round-4 experiments.

Usage: timeout 3500 python tools/run_tpu_batch.py [phase ...]
Phases: bench zeros validate breakdown exp
"""

import os
import runpy
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(path, env=None, argv=()):
    t0 = time.time()
    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    old_argv = sys.argv
    sys.argv = [path, *argv]
    print(f"\n===== {path} env={env or {}} =====", flush=True)
    try:
        runpy.run_path(os.path.join(REPO, path), run_name="__main__")
    except SystemExit as e:
        if e.code not in (0, None):
            print(f"!! {path} exited {e.code}", flush=True)
    except Exception as e:
        import traceback
        traceback.print_exc()
        print(f"!! {path} failed: {type(e).__name__}: {e}", flush=True)
    finally:
        sys.argv = old_argv
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
    print(f"===== {path} done in {time.time() - t0:.0f}s =====", flush=True)


def main():
    which = sys.argv[1:] or ["bench", "zeros", "validate", "breakdown",
                             "exp"]
    if "grouped" in which:
        # grouped kernels are opt-in (GKGNET_GROUPED=1) after losing the
        # model-level bench; this harness remains their validation path
        run("tools/exp_grouped_check.py")
    if "bench" in which:
        run("bench.py")
    if "zeros" in which:
        run("bench.py", env={"BENCH_INPUT": "zeros", "BENCH_MODE": "eval",
                             "BENCH_SKIP_TRAIN": "1",
                             "BENCH_SKIP_LOADER": "1"})
    if "trainbench" in which:
        run("bench.py", env={"BENCH_MODE": "train"})
    if "validate" in which:
        run("tools/tpu_validate.py")
    if "breakdown" in which:
        run("tools/profile_breakdown.py", env={"BD_MODE": "both"})
    if "exp" in which:
        run("tools/exp_round4.py")
    if "exp5" in which:
        run("tools/exp_round5_dense.py",
            env={"EXP5": os.environ.get("EXP5", "profile")})
if __name__ == "__main__":
    main()
