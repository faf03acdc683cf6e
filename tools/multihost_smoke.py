"""Multi-host smoke launcher: spawn an N-process localhost "pod" and drive
the FULL training CLI through the jax.distributed runtime.

The reference is single-process (SURVEY.md section 2.9); this build scales
out one process per host (parallel/distributed.py). This tool is the
operator-facing version of tests/test_multihost.py (both share the launch
helpers in d2r_tpu/parallel/launch.py): it fabricates a tiny dataset, picks
a free coordinator port, launches ``--num_processes`` copies of ``run.py``
(each with ``--local_devices`` virtual CPU chips), and checks that every
rank exits 0 and rank 0 reports a finite test loss.

Usage (CPU, any machine):

    python tools/multihost_smoke.py --num_processes 2 --local_devices 4

On a real Cloud TPU pod slice you do not need this launcher — run the CLI
on every host with ``--num_processes -1`` (auto-detect) instead.
"""

from __future__ import annotations

import argparse
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from d2r_tpu.parallel.launch import cpu_rank_env, free_port, tiny_train_cmd


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--num_processes", type=int, default=2)
    ap.add_argument("--local_devices", type=int, default=4,
                    help="virtual CPU devices per process")
    ap.add_argument("--batch_size", type=int, default=8,
                    help="GLOBAL batch size (must be divisible by "
                         "num_processes)")
    ap.add_argument("--mesh_model", type=int, default=1,
                    help=">1 = tensor-parallel axis (dp x tp across the "
                         "process boundary, exercises per-axis warmup)")
    ap.add_argument("--timeout", type=int, default=1500)
    args = ap.parse_args(argv)

    tmp = tempfile.mkdtemp(prefix="d2r_multihost_smoke_")
    from d2r_tpu.data.dataset import write_fake_dataset
    paths = write_fake_dataset(os.path.join(tmp, "ds"), n=12, image_size=224)
    port = free_port()
    env = cpu_rank_env(args.local_devices)

    cmd_base = tiny_train_cmd(
        paths, os.path.join(tmp, "out"), batch_size=args.batch_size,
        extra=["--mesh_model", str(args.mesh_model),
               "--coordinator_address", f"127.0.0.1:{port}",
               "--num_processes", str(args.num_processes)])

    procs = [subprocess.Popen(cmd_base + ["--process_id", str(rank)],
                              env=env, cwd=REPO, text=True,
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for rank in range(args.num_processes)]
    # drain ALL pipes concurrently: sequential communicate() deadlocks the
    # pod if a later rank fills its 64KB pipe while an earlier rank waits
    # on it in a collective
    from concurrent.futures import ThreadPoolExecutor
    with ThreadPoolExecutor(len(procs)) as pool:
        outs = list(pool.map(
            lambda p: p.communicate(timeout=args.timeout)[0], procs))

    ok = True
    for rank, (p, out) in enumerate(zip(procs, outs)):
        status = "ok" if p.returncode == 0 else f"FAILED rc={p.returncode}"
        print(f"rank {rank}: {status}")
        if p.returncode != 0:
            ok = False
            print(out[-4000:])
    if ok and "Test Eval results" not in outs[0]:
        ok = False
        print("rank 0 produced no test eval:\n" + outs[0][-4000:])
    print("MULTIHOST SMOKE", "PASS" if ok else "FAIL",
          f"({args.num_processes} processes x {args.local_devices} devices)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
