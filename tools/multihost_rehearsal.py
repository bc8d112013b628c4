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
    port = os.environ.get("LHRS_COORD_PORT", "12355")
    jax.distributed.initialize(
        coordinator_address=f"127.0.0.1:{port}",
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

    # one REAL train step on the tiny VLM over the multi-host mesh
    # (dp=4 × tp=2, each process feeding its host-local half of the batch)
    from ml_collections import ConfigDict

    from lhrs_bot_tpu.models import (IMAGE_TOKEN_INDEX, VLMConfig,
                                     init_vlm_params, trainable_mask)
    from lhrs_bot_tpu.parallel.partition import shard_params
    from lhrs_bot_tpu.train.optimizer import build_optimizer
    from lhrs_bot_tpu.train import make_train_step

    cfg = VLMConfig.tiny_test(stage=1)
    params = init_vlm_params(jax.random.PRNGKey(0), cfg)
    conf = ConfigDict({"optimizer": "adamw", "lr": 1e-3, "wd": 0.0,
                       "max_grad_norm": 0.0})
    tx = build_optimizer(conf, params, trainable_mask(params, cfg))
    step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
    with mesh:
        sharded = shard_params(mesh, params)
        state = tx.init(sharded)
        rng_np = np.random.default_rng(7)
        ids = rng_np.integers(3, 200, size=(2, 8)).astype(np.int32)
        ids[:, 1] = IMAGE_TOKEN_INDEX
        host_batch = {
            "input_ids": ids,
            "labels": ids.copy(),
            "attention_mask": np.ones((2, 8), bool),
            "images": np.zeros(
                (2, cfg.vit.image_size, cfg.vit.image_size, 3), np.uint8),
        }
        batch = jax.tree_util.tree_map(
            lambda x: multihost_utils.host_local_array_to_global_array(
                x, mesh, P("data")), host_batch)
        _, _, metrics = jax.jit(step)(sharded, state, batch)
        loss = float(metrics["total_loss"])
    assert np.isfinite(loss), loss

    # rank-merged eval shard write (main_vqa.py save_result protocol)
    import tempfile

    from main_vqa import save_result

    out_dir = os.environ.get("LHRS_REHEARSAL_DIR",
                             os.path.join(tempfile.gettempdir(),
                                          "lhrs_rehearsal"))
    merged = save_result([{"rank": rank, "answer": f"a{rank}"}],
                         out_dir, rank, dist.get_world_size(),
                         filename="rehearsal_result")
    if rank == 0:
        assert len(merged) == num_processes, merged

    dist.barrier("done")
    print(f"[worker {rank}] multihost rehearsal OK loss={loss:.4f}",
          flush=True)


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
