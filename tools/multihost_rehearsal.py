"""Two-process CPU rehearsal of the multi-host paths.

Runs the same script in two local processes connected through
jax.distributed (coordinator on localhost), each contributing 4 virtual CPU
devices to a global 8-device ("data","model") mesh, and exercises:
  * parallel/distribute.py host-object all-gather / reduce_dict / seed sync,
  * per-process data sharding (ShardedSampler),
  * a global SPMD train step over the multi-host mesh.

Usage: python tools/multihost_rehearsal.py            # spawns both workers
       python tools/multihost_rehearsal.py --worker N # internal
"""

import os
import subprocess
import sys


def worker(process_id: int, num_processes: int = 2) -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    jax.distributed.initialize(
        coordinator_address="127.0.0.1:12355",
        num_processes=num_processes,
        process_id=process_id,
    )
    import numpy as np

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from lhrs_bot_tpu.parallel import distribute as dist

    assert dist.get_world_size() == num_processes
    rank = dist.get_rank()

    # host-object collectives
    gathered = dist.all_gather_object({"rank": rank, "msg": f"hello-{rank}"})
    assert len(gathered) == num_processes, gathered
    assert gathered[0]["rank"] == 0 and gathered[1]["rank"] == 1

    reduced = dist.reduce_dict({"loss": float(rank + 1)})
    assert abs(reduced["loss"] - 1.5) < 1e-6, reduced

    seed = dist.sync_random_seed(1234 if rank == 0 else 999)
    assert seed == 1234, seed

    # data sharding across processes
    from lhrs_bot_tpu.data.loader import ShardedSampler

    s = ShardedSampler(10, rank=rank, world_size=num_processes,
                       shuffle=False)
    local = list(s)
    all_idx = dist.all_gather_object(local)
    flat = sorted(i for part in all_idx for i in part)
    assert set(flat) == set(range(10)), flat

    # global SPMD step over the multi-host mesh
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from jax.experimental import multihost_utils

    from lhrs_bot_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=4, tp=2)  # 8 global devices over 2 processes

    @jax.jit
    def global_sum(x):
        return jnp.sum(x)

    with mesh:
        host_local = np.full((2, 4), float(rank + 1), np.float32)
        arr = multihost_utils.host_local_array_to_global_array(
            host_local, mesh, P("data"))
        total = float(global_sum(arr))
    # rows 0..1 from each process under the "data" axis: 8*1 + 8*2 = 24
    assert abs(total - 24.0) < 1e-6, total

    dist.barrier("done")
    print(f"[worker {rank}] multihost rehearsal OK", flush=True)


def main() -> None:
    if "--worker" in sys.argv:
        worker(int(sys.argv[sys.argv.index("--worker") + 1]))
        return
    procs = [
        subprocess.Popen([sys.executable, os.path.abspath(__file__),
                          "--worker", str(i)])
        for i in range(2)
    ]
    codes = [p.wait(timeout=300) for p in procs]
    if any(codes):
        raise SystemExit(f"rehearsal failed: exit codes {codes}")
    print("multihost rehearsal passed (2 processes x 4 devices)")


if __name__ == "__main__":
    main()
