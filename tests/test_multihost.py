"""Real multi-process coverage (VERDICT r3 weak #5): 2 `jax.distributed`
CPU processes through the train/test CLIs on the synthetic mini dataset.
Exercises the paths `process_count()==1` tests never reach: the seed
broadcast, `make_array_from_process_local_data` batch assembly, and the
interleaved-shard `process_allgather` eval reassembly
(tools/test.py:121-131, tools/train.py run_eval) — the TPU-world
equivalent of the reference's multi_gpu_test + ordered collect
(apis/test.py:260-387)."""

import json
import os
import pickle
import socket
import subprocess
import sys

import numpy as np
import pytest

from test_cli import MINI_CONFIG, workspace  # noqa: F401  (fixture reuse)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _launch(cmd, rank, nproc, port, devices=2):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    full = cmd + ["--multihost", "--coordinator", f"127.0.0.1:{port}",
                  "--num-processes", str(nproc), "--process-id", str(rank)]
    return subprocess.Popen(full, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True, env=env,
                            cwd=REPO)


def _wait_all(procs, timeout=840):
    outs = []
    for p in procs:
        try:
            out, err = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append((p.returncode, out, err))
    return outs


def _run_single(cmd, devices=4):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices}"
    return subprocess.run(cmd, capture_output=True, text=True, timeout=840,
                          env=env, cwd=REPO)


@pytest.mark.slow
def test_multihost_eval_reassembly_order_exact(workspace):  # noqa: F811
    """2-process tools/test.py: every rank scores its interleaved shard
    (r::world); the allgather reassembly must produce the same per-image
    score rows, in the same order, as a single-process run — a misordered
    reassembly scores DIFFERENT images per row and diverges wildly."""
    root, cfg_path, _ = workspace
    single = str(root / "scores_single.pkl")
    res = _run_single([sys.executable, "tools/test.py", str(cfg_path),
                       "--out", single, "--batch", "4",
                       "--cfg-options", "mesh.data=4"])
    assert res.returncode == 0, res.stderr[-4000:]

    port = _free_port()
    procs = [
        _launch([sys.executable, "tools/test.py", str(cfg_path),
                 "--out", str(root / f"scores_mh{r}.pkl"), "--batch", "4",
                 "--cfg-options", "mesh.data=4"],
                r, 2, port)
        for r in range(2)
    ]
    outs = _wait_all(procs)
    for rc, out, err in outs:
        assert rc == 0, err[-4000:]

    with open(single, "rb") as f:
        ref = pickle.load(f)
    got = []
    for r in range(2):
        with open(root / f"scores_mh{r}.pkl", "rb") as f:
            got.append(pickle.load(f))
    # both ranks hold the SAME reassembled global result
    np.testing.assert_array_equal(got[0], got[1])
    assert got[0].shape == ref.shape == (8, 80)
    # Order-exactness, robust to near-tie kNN edge flips: the random-init
    # model emits saturated 0/1 sigmoids, and the 1-vs-2-process compile
    # reorders fp32 reductions enough to flip a few near-tied neighbor
    # selections (the documented fp32 non-contract, docs/PERF.md) — a
    # handful of per-class flips within a row is legitimate; scoring a
    # DIFFERENT IMAGE per row (the bug this test exists for) is not.
    # Each reassembled row must therefore agree overwhelmingly with ITS
    # OWN reference row and at least as well as with any other row.
    agree = np.stack([
        np.isclose(got[0][:, None, :], ref[None, :, :],
                   atol=5e-3, rtol=5e-3).mean(axis=2)
    ])[0]                                                  # (8, 8)
    diag = np.diag(agree)
    assert (diag >= 0.9).all(), f"row self-agreement too low: {diag}"
    assert (diag[:, None] >= agree - 1e-12).all(), (
        f"a row matches a different image better than its own:\n{agree}")


@pytest.mark.slow
def test_multihost_train_one_epoch(workspace):  # noqa: F811
    """2-process tools/train.py: seed broadcast +
    make_array_from_process_local_data global-batch assembly + in-train
    eval reassembly all run for real; both ranks finish and rank 0 logs a
    val mAP."""
    root, cfg_path, _ = workspace
    work_dir = root / "work_mh"
    port = _free_port()
    procs = [
        _launch([sys.executable, "tools/train.py", str(cfg_path),
                 "--work-dir", str(work_dir), "--seed", "0",
                 "--cfg-options", "mesh.data=4"],
                r, 2, port)
        for r in range(2)
    ]
    outs = _wait_all(procs)
    for rc, out, err in outs:
        assert rc == 0, err[-4000:]
    logs = [f for f in os.listdir(work_dir) if f.endswith(".log.json")]
    assert logs
    with open(os.path.join(work_dir, sorted(logs)[-1])) as f:
        recs = [json.loads(line) for line in f]
    maps = [r["mAP"] for r in recs if r.get("mode") == "val" and "mAP" in r]
    assert maps and all(np.isfinite(m) for m in maps)
