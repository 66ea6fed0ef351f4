"""2-process multi-host smoke (reference diffusion/utils/dist_utils.py:39-67
env-rendezvous contract): init_distributed under MASTER_ADDR/RANK/WORLD_SIZE,
cross-process broadcast_from_main + sync_global_mean over gloo."""

import os
import subprocess
import sys

_WORKER = """
import os, sys
rank = int(sys.argv[1])
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["MASTER_ADDR"] = "127.0.0.1"
os.environ["MASTER_PORT"] = sys.argv[2]
os.environ["RANK"] = str(rank)
os.environ["WORLD_SIZE"] = "2"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, sys.argv[3])
import numpy as np
from instarevive_tpu.parallel.dist import (broadcast_from_main,
                                           get_dist_info, init_distributed,
                                           sync_global_mean)
init_distributed()
r, w = get_dist_info()
assert (r, w) == (rank, 2), (r, w)
bc = broadcast_from_main({"b": float(rank) + 1.0})
assert float(np.asarray(bc["b"])) == 1.0, bc
mean = sync_global_mean({"loss": float(rank)})
assert abs(float(np.asarray(mean["loss"])) - 0.5) < 1e-6, mean
print("OK", flush=True)
"""


def test_two_process_rendezvous(tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    port = "29613"
    env = {k: v for k, v in os.environ.items()
           if k not in ("PALLAS_AXON_POOL_IPS", "PYTHONPATH", "XLA_FLAGS",
                        "JAX_PLATFORMS")}
    procs = [
        subprocess.Popen(
            [sys.executable, str(script), str(rank), port, repo],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, env=env, text=True,
        )
        for rank in (0, 1)
    ]
    outs = [p.communicate(timeout=180)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
        assert "OK" in out, out
