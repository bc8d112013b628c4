"""Persistent TPU experiment server #2."""
import glob, io, os, time, traceback, contextlib
import numpy as np
import jax
import jax.numpy as jnp
from lhrs_bot_tpu.models.vit import ViTConfig, init_vit_params, vit_encode
from lhrs_bot_tpu.models.perceiver import PerceiverConfig, init_perceiver_params, perceiver_resample

G = dict(globals())
print("init...", flush=True)
vit_cfg = ViTConfig.vit_large(); pool_cfg = PerceiverConfig()
k1, k2 = jax.random.split(jax.random.PRNGKey(0))
cast = lambda t: jax.tree_util.tree_map(lambda x: x.astype(jnp.bfloat16), t)
vp = cast(init_vit_params(k1, vit_cfg)); pp = cast(init_perceiver_params(k2, pool_cfg))
jax.block_until_ready((vp, pp))

def timeit(name, fn, *args, iters=10, batch=None, flops=None):
    red = lambda o: jnp.sum(o[0] if isinstance(o, tuple) else o)
    _ = float(red(fn(*args)))
    t0 = time.perf_counter()
    for _i in range(iters - 1): out = fn(*args)
    s = float(red(fn(*args)))
    dt = (time.perf_counter() - t0) / iters
    msg = f"{name}: {dt*1000:.2f} ms"
    if batch: msg += f" -> {batch/dt:.0f} img/s"
    if flops: msg += f" -> {flops/dt/1e12:.1f} TFLOPS"
    print(msg, flush=True)
    return dt

G.update(dict(vit_cfg=vit_cfg, pool_cfg=pool_cfg, vp=vp, pp=pp, np=np, jax=jax,
              jnp=jnp, vit_encode=vit_encode, perceiver_resample=perceiver_resample,
              time=time, timeit=timeit))
done = set()
print("server ready", flush=True)
while True:
    for cmd in sorted(glob.glob("/tmp/vtest/cmd_*.py")):
        if cmd in done: continue
        done.add(cmd)
        out_path = cmd.replace("cmd_", "out_").replace(".py", ".txt")
        buf = io.StringIO()
        try:
            with open(cmd) as fh: src = fh.read()
            with contextlib.redirect_stdout(buf):
                exec(compile(src, cmd, "exec"), G)
        except Exception:
            buf.write(traceback.format_exc())
        with open(out_path + ".tmp", "w") as fh: fh.write(buf.getvalue())
        os.rename(out_path + ".tmp", out_path)
        print("done", cmd, flush=True)
    time.sleep(0.5)
