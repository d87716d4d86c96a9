"""Real multi-process distributed training test.

Round 1 simulated 8 devices inside one process; jax.distributed.initialize
(parallel/mesh.py) was never exercised. This spawns TWO OS processes with 2
CPU devices each, rendezvous over a localhost coordinator port, and runs a
cross-process data-parallel train step + a sharded CheckpointManager round
trip (see tests/distributed_worker.py). Reference equivalent:
tests/distributed/utils.py:12-40 (spawn + file-rendezvous process groups).
"""

import os
import socket
import subprocess
import sys

import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_train_and_checkpoint(tmp_path):
    port = _free_port()
    workers = []
    for pid in range(2):
        env = dict(os.environ)
        env.update(
            XLA_FLAGS="--xla_force_host_platform_device_count=2",
            DIFFNORM_MULTIHOST="1",
            DIFFNORM_COORDINATOR=f"127.0.0.1:{port}",
            DIFFNORM_NUM_PROCESSES="2",
            DIFFNORM_PROCESS_ID=str(pid),
        )
        workers.append(
            subprocess.Popen(
                [sys.executable, os.path.join(os.path.dirname(__file__),
                                              "distributed_worker.py"),
                 str(tmp_path / "ckpt")],
                env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                text=True,
            )
        )
    outs = []
    for pid, w in enumerate(workers):
        try:
            out, _ = w.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for w2 in workers:
                w2.kill()
            raise
        outs.append(out)
        assert w.returncode == 0, f"worker {pid} failed:\n{out}"
    for pid, out in enumerate(outs):
        assert "DISTRIBUTED_OK" in out, f"worker {pid}:\n{out}"
    # both processes computed the SAME global loss (psum agreed)
    lines = [next(l for l in o.splitlines() if "DISTRIBUTED_OK" in l)
             for o in outs]
    assert lines[0] == lines[1], lines
