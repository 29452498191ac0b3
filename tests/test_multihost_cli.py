"""--multihost through the REAL CLIs: 2-process jax.distributed cluster
running scripts/train.py then scripts/eval.py --mul_eval as actual
subprocesses (the exact user surface), asserting process-0 owns all
artifacts and the merged mul_eval CSV is row-identical to a
single-process eval of the same checkpoint."""
import csv
import json
import os
import socket
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _run_cli(script, args, n_processes, devices_per_process, timeout=900):
    """Launch scripts/<script> as n real processes joined through
    SPACAP_COORDINATOR (hermetic CPU: the axon sitecustomize is dropped
    from PYTHONPATH so JAX_PLATFORMS=cpu holds)."""
    port = _free_port()
    procs = []
    for pid in range(n_processes):
        env = dict(os.environ)
        env.update(
            PYTHONPATH=REPO,
            JAX_PLATFORMS="cpu",
            XLA_FLAGS=(f"--xla_force_host_platform_device_count="
                       f"{devices_per_process}"),
        )
        env.pop("JAX_PLATFORM_NAME", None)
        if n_processes > 1:
            env.update(SPACAP_COORDINATOR=f"localhost:{port}",
                       SPACAP_NUM_PROCESSES=str(n_processes),
                       SPACAP_PROCESS_ID=str(pid))
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "scripts", script)] + args,
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        ))
    logs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        logs.append(out)
    for pid, (p, log) in enumerate(zip(procs, logs)):
        assert p.returncode == 0, f"{script} proc {pid} failed:\n{log[-4000:]}"
    return logs


@pytest.fixture(scope="module")
def run_dir(tmp_path_factory):
    from spacap3d_tpu.data.synthetic import write_synthetic_dataset

    root = str(tmp_path_factory.mktemp("mh_cli"))
    anns, sids = write_synthetic_dataset(root, num_scenes=3, seed=7)
    train = [a for a in anns if a["scene_id"] == sids[0]]
    val = [a for a in anns if a["scene_id"] in sids[1:]]
    with open(os.path.join(root, "ScanRefer_filtered_train.json"), "w") as f:
        json.dump(train, f)
    with open(os.path.join(root, "ScanRefer_filtered_val.json"), "w") as f:
        json.dump(val, f)

    out_dir = os.path.join(root, "outputs")
    # global batch 8 = 2 processes x 4 devices (train.py validates both)
    _run_cli("train.py", [
        "--multihost", "--data_root", root, "--output_dir", out_dir,
        "--arch_preset", "tiny", "--num_points", "1024",
        "--num_proposals", "16", "--batch_size", "8", "--epoch", "1",
        "--val_step", "100", "--verbose", "1", "--num_workers", "1",
        "--tag", "mh",
    ], n_processes=2, devices_per_process=4)
    return root, out_dir


def test_train_multihost_process0_owns_artifacts(run_dir):
    root, out_dir = run_dir
    runs = os.listdir(out_dir)
    assert len(runs) == 1, runs  # both processes agreed on one stamp
    run_root = os.path.join(out_dir, runs[0])
    for f in ("config.json", "info.json", "log.txt", "model_last.ckpt",
              "best.txt"):
        assert os.path.exists(os.path.join(run_root, f)), f


def test_mul_eval_multihost_rows_equal_single_process(run_dir):
    root, out_dir = run_dir
    run = os.listdir(out_dir)[0]
    common = ["--folder", run, "--data_root", root, "--output_dir", out_dir,
              "--batch_size", "2", "--num_workers", "1",
              "--checkpoint", "model_last.ckpt", "--mul_eval",
              "--num_seeds", "2"]
    _run_cli("eval.py", ["--multihost", "--eval_tag", "mh"] + common,
             n_processes=2, devices_per_process=4)
    _run_cli("eval.py", ["--eval_tag", "sp"] + common,
             n_processes=1, devices_per_process=8)
    run_root = os.path.join(out_dir, run)
    with open(os.path.join(run_root, "mh_results.csv")) as f:
        mh = list(csv.DictReader(f))
    with open(os.path.join(run_root, "sp_results.csv")) as f:
        sp = list(csv.DictReader(f))
    assert len(mh) == 2 and [r["seed"] for r in mh] == ["0", "1"]
    # seed-sharded 2-process grid == single-process run, column for column
    assert mh == sp


def test_eval_rejects_tp_with_multihost(run_dir, monkeypatch):
    root, out_dir = run_dir
    run = os.listdir(out_dir)[0]
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import eval as eval_cli

    monkeypatch.setenv("SPACAP_NUM_PROCESSES", "2")  # simulated cluster env

    class _FakeInit:
        @staticmethod
        def fake(*a, **k):
            return 0, 2

    from spacap3d_tpu.parallel import multihost
    monkeypatch.setattr(multihost, "initialize_from_env", _FakeInit.fake)
    with pytest.raises(SystemExit, match="single-process"):
        eval_cli.main(["--multihost", "--tp", "2", "--folder", run,
                       "--data_root", root, "--output_dir", out_dir,
                       "--batch_size", "2", "--num_workers", "1",
                       "--checkpoint", "model_last.ckpt", "--mul_eval",
                       "--num_seeds", "2", "--eval_tag", "x"])
