"""Multi-host (pod-scale) training: 2-process CPU cluster integration.

The reference is single-process (SURVEY.md section 2.9). This build scales
out via jax.distributed + make_array_from_process_local_data
(parallel/distributed.py): every process loads a disjoint slice of each
global batch and joins one SPMD program.

The integration test spawns TWO real OS processes, each with 4 virtual CPU
devices, that drive the FULL training CLI (run.py) against a shared fake
dataset through a localhost coordinator — data pipeline, mesh, jitted
steps, Orbax best-model save, and the allgather'd eval metrics all run
multi-process. The final test loss must agree across ranks and match the
single-process oracle.

Fast unit tests cover the DataLoader process_shard contract without any
distributed runtime.
"""

import os
import subprocess

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


# --------------------------------------------------------------------------
# DataLoader process_shard contract (pure host logic, no jax.distributed)
# --------------------------------------------------------------------------

def _make_loader(tmp_path, batch_size, process_shard=None, n=10):
    from d2r_tpu.data.dataset import (DataLoader, MSDDataset, MSDProcessor,
                                      write_fake_dataset)
    paths = write_fake_dataset(str(tmp_path / "ds"), n=n, image_size=32)
    proc = MSDProcessor({k: paths[k] for k in ("train", "dev", "test")},
                        "no-such-vocab", vocab_size=128)
    ds = MSDDataset(proc, paths["img_dir"], max_seq=8, mode="train",
                    image_size=32, num_vision_tokens=5)
    return DataLoader(ds, batch_size, shuffle=True, num_workers=2,
                      seed=7, process_shard=process_shard)


def test_process_shard_slices_are_disjoint_and_complete(tmp_path):
    """Rank slices concatenate to exactly the single-process batches —
    same samples, same order, same wrap-pad valid mask."""
    full = _make_loader(tmp_path, batch_size=4)
    r0 = _make_loader(tmp_path, batch_size=4, process_shard=(0, 2))
    r1 = _make_loader(tmp_path, batch_size=4, process_shard=(1, 2))

    for bf, b0, b1 in zip(iter(full), iter(r0), iter(r1)):
        for k in bf:
            got = np.concatenate([b0[k], b1[k]], axis=0)
            np.testing.assert_array_equal(got, bf[k], err_msg=k)
            assert b0[k].shape[0] * 2 == bf[k].shape[0], k


def test_process_shard_validation(tmp_path):
    with pytest.raises(ValueError, match="divisible"):
        _make_loader(tmp_path, batch_size=5, process_shard=(0, 2))
    with pytest.raises(ValueError, match="rank"):
        _make_loader(tmp_path, batch_size=4, process_shard=(2, 2))


def test_local_batch_size_divisibility():
    from d2r_tpu.parallel.distributed import local_batch_size
    assert local_batch_size(8) == 8  # single process


# --------------------------------------------------------------------------
# 2-process end-to-end CLI drive
# --------------------------------------------------------------------------

# launch pieces shared with the operator tool (tools/multihost_smoke.py)
from d2r_tpu.parallel.launch import cpu_rank_env, free_port, tiny_train_cmd


def _final_test_loss(stdout: str) -> float:
    lines = stdout.splitlines()
    for i, line in enumerate(lines):
        if "Test Eval results" in line:
            for later in lines[i:]:
                if "loss =" in later:
                    return float(later.split("loss =")[1].strip())
    raise AssertionError(f"no test loss in output:\n{stdout[-3000:]}")


@pytest.mark.slow
def test_two_process_training_matches_single(tmp_path):
    from d2r_tpu.data.dataset import write_fake_dataset
    paths = write_fake_dataset(str(tmp_path / "ds"), n=12, image_size=224)
    port = free_port()
    env = cpu_rank_env(4)

    procs = []
    shared_out = str(tmp_path / "out_multi")  # orbax multihost saves
    for rank in range(2):                     # coordinate on ONE directory
        out = shared_out
        cmd = tiny_train_cmd(paths, out, extra=[
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(rank)])
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    # concurrent drain — sequential communicate() can deadlock the pod if a
    # later rank fills its 64KB pipe while an earlier rank blocks on it in
    # a collective (same fix as tools/multihost_smoke.py)
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(len(procs)) as pool:
        outs = list(pool.map(lambda p: p.communicate(timeout=1500)[0], procs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"

    # rank 0 logs; rank 1 runs the same program silently
    multi_loss = _final_test_loss(outs[0])
    assert "Test Eval results" not in outs[1]

    # single-process oracle on the identical dataset/config (1 device —
    # dp exactness across device counts is proven in test_dp_semantics)
    oracle = subprocess.run(
        tiny_train_cmd(paths, str(tmp_path / "out_single")),
        env=dict(env, XLA_FLAGS="--xla_force_host_platform_device_count=1"),
        cwd=REPO, text=True, capture_output=True, timeout=1500)
    assert oracle.returncode == 0, oracle.stdout[-4000:] + oracle.stderr[-2000:]
    single_loss = _final_test_loss(oracle.stdout + oracle.stderr)

    np.testing.assert_allclose(multi_loss, single_loss, rtol=2e-4)


@pytest.mark.slow
def test_two_process_dp_tp_training_matches_single(tmp_path):
    """Pod-scale TENSOR parallelism: 2 processes x 2 local devices joining
    one (data=2, model=2) mesh — the model axis spans BOTH processes, so
    tower matmul all-reduces cross the process boundary (the round-3 suite
    proved dp-only multihost; this pins tp composed with jax.distributed).
    The final test loss must match a single-process dp2 x tp2 oracle on the
    identical dataset/config."""
    from d2r_tpu.data.dataset import write_fake_dataset
    from concurrent.futures import ThreadPoolExecutor

    paths = write_fake_dataset(str(tmp_path / "ds"), n=12, image_size=224)
    port = free_port()
    env = cpu_rank_env(2)  # 2 local devices/process -> 4 global
    mesh_flags = ["--mesh_data", "2", "--mesh_model", "2"]

    procs = []
    for rank in range(2):
        cmd = tiny_train_cmd(paths, str(tmp_path / "out_multi"), extra=[
            "--coordinator_address", f"127.0.0.1:{port}",
            "--num_processes", "2", "--process_id", str(rank)] + mesh_flags)
        procs.append(subprocess.Popen(
            cmd, env=env, cwd=REPO, text=True,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
    with ThreadPoolExecutor(len(procs)) as pool:
        outs = list(pool.map(lambda p: p.communicate(timeout=1500)[0], procs))
    for rank, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
    multi_loss = _final_test_loss(outs[0])

    oracle = subprocess.run(
        tiny_train_cmd(paths, str(tmp_path / "out_single"),
                       extra=mesh_flags),
        env=dict(env, XLA_FLAGS="--xla_force_host_platform_device_count=4"),
        cwd=REPO, text=True, capture_output=True, timeout=1500)
    assert oracle.returncode == 0, oracle.stdout[-4000:] + oracle.stderr[-2000:]
    single_loss = _final_test_loss(oracle.stdout + oracle.stderr)

    np.testing.assert_allclose(multi_loss, single_loss, rtol=2e-4)


@pytest.mark.slow
def test_two_process_auto_resume_restores_without_retraining(tmp_path):
    """Multi-host --auto_resume mechanics: the collective resume save from a
    2-process run restores on a fresh 2-process cluster (rank-0 meta +
    orbax restore into the mesh-sharded template), training is skipped
    (all epochs completed), and the best-model test loss is IDENTICAL."""
    from d2r_tpu.data.dataset import write_fake_dataset
    from concurrent.futures import ThreadPoolExecutor

    paths = write_fake_dataset(str(tmp_path / "ds"), n=12, image_size=224)
    env = cpu_rank_env(4)
    shared_out = str(tmp_path / "out_resume")

    def run_pod():
        port = free_port()
        procs = []
        for rank in range(2):
            cmd = tiny_train_cmd(paths, shared_out, extra=[
                "--coordinator_address", f"127.0.0.1:{port}",
                "--num_processes", "2", "--process_id", str(rank),
                "--auto_resume"])
            procs.append(subprocess.Popen(
                cmd, env=env, cwd=REPO, text=True,
                stdout=subprocess.PIPE, stderr=subprocess.STDOUT))
        with ThreadPoolExecutor(len(procs)) as pool:
            outs = list(pool.map(lambda p: p.communicate(timeout=1500)[0],
                                 procs))
        for rank, (p, out) in enumerate(zip(procs, outs)):
            assert p.returncode == 0, f"rank {rank} failed:\n{out[-4000:]}"
        return outs

    first = run_pod()
    loss_a = _final_test_loss(first[0])
    assert "Auto-resume" not in first[0]  # nothing to resume yet

    second = run_pod()
    assert "Auto-resume" in second[0]
    # all epochs were already complete: no train-window logging happens
    assert "Running training" in second[0]
    assert "epoch 1 step" not in second[0].split("Auto-resume")[1]
    loss_b = _final_test_loss(second[0])
    assert loss_b == loss_a  # pure restore -> bit-identical test loss
