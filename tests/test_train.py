"""Training stack: optimizers, schedules, sharded train step, trainer loop,
checkpoint save/resume."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from lhrs_bot_tpu.core.config import ConfigDict
from lhrs_bot_tpu.models import (
    IMAGE_TOKEN_INDEX,
    VLMConfig,
    init_vlm_params,
    trainable_mask,
)
from lhrs_bot_tpu.parallel.mesh import make_mesh
from lhrs_bot_tpu.parallel.partition import shard_params, vlm_param_specs
from lhrs_bot_tpu.train import (
    EpochBasedTrainer,
    IterBasedTrainer,
    MetricStorage,
    adan,
    build_optimizer,
    build_schedule,
    make_train_step,
)


def _tiny_batch(rng, b=2, t=8, with_image=True):
    ids = rng.integers(3, 200, size=(b, t))
    if with_image:
        ids[:, 1] = IMAGE_TOKEN_INDEX
    return {
        "input_ids": ids.astype(np.int32),
        "labels": ids.astype(np.int32),
        "attention_mask": np.ones((b, t), bool),
        "images": np.zeros((b, 28, 28, 3), np.uint8),
    }


class _ToyLoader:
    def __init__(self, n=4, b=2):
        self.batches = [_tiny_batch(np.random.default_rng(i), b) for i in range(n)]

    def __len__(self):
        return len(self.batches)

    def __iter__(self):
        return iter(self.batches)


class TestSchedules:
    def test_cosine_warmup(self):
        cfg = ConfigDict({"lr": 1.0, "schedule": {
            "name": "cosine", "min_lr": 0.1, "warmup_epochs": 10,
            "warmup_method": "linear", "warmup_factor": 0.1}})
        s = build_schedule(cfg, total_iters=100)
        assert float(s(0)) == pytest.approx(0.1, abs=1e-3)
        assert float(s(10)) <= 1.0
        assert float(s(100)) == pytest.approx(0.1, abs=1e-3)
        # monotone decreasing after warmup
        vals = [float(s(i)) for i in range(10, 100, 10)]
        assert all(a >= b for a, b in zip(vals, vals[1:]))

    @pytest.mark.parametrize("name", ["step", "exp", "poly", "inv", "linear",
                                      "fixed", "flat_cosine"])
    def test_family_finite(self, name):
        cfg = ConfigDict({"lr": 0.5, "schedule": {
            "name": name, "multisteps": [5, 10], "gamma": 0.9}})
        s = build_schedule(cfg, total_iters=20)
        vals = [float(s(i)) for i in range(20)]
        assert all(np.isfinite(v) and v >= 0 for v in vals)


def _np_anneal_cos(start, end, factor):
    return end + 0.5 * (start - end) * (1 + np.cos(np.pi * factor))


class TestScheduleGolden:
    """All 11 schedules vs direct numpy transcriptions of the reference
    algorithms (lhrs/CustomTrainer/hook/lr_scheduler_hook.py:148-735)."""

    def _curve(self, cfg_dict, total, n=None):
        s = build_schedule(ConfigDict(cfg_dict), total_iters=total)
        return np.array([float(s(i)) for i in range(n or total)])

    def test_fixed(self):
        got = self._curve({"lr": 0.3, "schedule": {"name": "fixed"}}, 10)
        np.testing.assert_allclose(got, np.full(10, 0.3), rtol=1e-6)

    def test_step(self):
        got = self._curve({"lr": 1.0, "schedule": {
            "name": "step", "multisteps": [3, 6], "gamma": 0.1}}, 9)
        exp = np.array([1, 1, 1, .1, .1, .1, .01, .01, .01])
        np.testing.assert_allclose(got, exp, rtol=1e-5)

    def test_exp(self):
        got = self._curve({"lr": 2.0, "schedule": {
            "name": "exp", "gamma": 0.5}}, 5)
        np.testing.assert_allclose(got, 2.0 * 0.5 ** np.arange(5), rtol=1e-5)

    def test_poly(self):
        total, power = 10, 2.0
        got = self._curve({"lr": 1.0, "schedule": {
            "name": "poly", "power": power}}, total)
        exp = (1 - np.arange(total) / total) ** power
        np.testing.assert_allclose(got, exp, rtol=1e-5)

    def test_inv(self):
        got = self._curve({"lr": 1.0, "schedule": {
            "name": "inv", "gamma": 0.1, "power": 0.75}}, 8)
        exp = (1 + 0.1 * np.arange(8)) ** -0.75
        np.testing.assert_allclose(got, exp, rtol=1e-5)

    def test_cosine(self):
        total, min_lr = 20, 0.1
        got = self._curve({"lr": 1.0, "schedule": {
            "name": "cosine", "min_lr": min_lr}}, total)
        exp = _np_anneal_cos(1.0, min_lr, np.arange(total) / total)
        np.testing.assert_allclose(got, exp, rtol=1e-5)

    def test_flat_cosine(self):
        total = 20
        got = self._curve({"lr": 1.0, "schedule": {
            "name": "flat_cosine", "start_percent": 0.75}}, total)
        flat_until = int(total * 0.75)
        t = np.clip((np.arange(total) - flat_until) / (total - flat_until),
                    0, 1)
        exp = np.where(np.arange(total) < flat_until, 1.0,
                       _np_anneal_cos(1.0, 0.0, t))
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-7)

    def test_linear(self):
        total, min_lr = 10, 0.2
        got = self._curve({"lr": 1.0, "schedule": {
            "name": "linear", "min_lr": min_lr}}, total)
        exp = 1.0 + (min_lr - 1.0) * np.arange(total) / total
        np.testing.assert_allclose(got, exp, rtol=1e-5)

    def test_cosine_restart(self):
        from lhrs_bot_tpu.train.schedule import cosine_restart

        periods, weights = [4, 6], [1.0, 0.5]
        s = cosine_restart(1.0, periods, weights, min_lr=0.0)
        got = np.array([float(s(i)) for i in range(10)])
        exp = np.concatenate([
            _np_anneal_cos(1.0, 0.0, np.arange(4) / 4),
            _np_anneal_cos(0.5, 0.0, np.arange(6) / 6)])
        np.testing.assert_allclose(got, exp, rtol=1e-5, atol=1e-7)

    def test_cyclic_golden(self):
        """Numpy transcription of CyclicLrUpdaterHook.get_lr
        (lr_scheduler_hook.py:496-517)."""
        base, total = 1.0, 40
        tr, times, up_ratio, gamma = (5.0, 1e-3), 2, 0.4, 0.5
        got = self._curve({"lr": base, "schedule": {
            "name": "cyclic", "target_ratio": tr, "cyclic_times": times,
            "step_ratio_up": up_ratio, "gamma": gamma}}, total)

        max_phase = total // times
        iter_up = int(up_ratio * max_phase)
        exp = []
        for it in range(total):
            curr, cycle = it % max_phase, it // max_phase
            scale = gamma ** cycle
            if curr < iter_up:
                end_ratio = 1 - scale + tr[0] * scale
                lr = _np_anneal_cos(base, base * end_ratio, curr / iter_up)
            else:
                start_ratio = 1 - scale + tr[0] * scale
                lr = _np_anneal_cos(base * start_ratio, base * tr[1],
                                    (curr - iter_up) / (max_phase - iter_up))
            exp.append(lr)
        np.testing.assert_allclose(got, np.asarray(exp), rtol=1e-4,
                                   atol=1e-6)

    @pytest.mark.parametrize("three_phase", [False, True])
    def test_one_cycle_golden(self, three_phase):
        """Numpy transcription of OneCycleLrUpdaterHook
        (lr_scheduler_hook.py:607-656)."""
        max_lr, total, pct, div, fdiv = 1.0, 30, 0.3, 25.0, 100.0
        got = self._curve({"lr": max_lr, "schedule": {
            "name": "one_cycle", "max_lr": max_lr, "pct_start": pct,
            "div_factor": div, "final_div_factor": fdiv,
            "three_phase": three_phase}}, total)

        init = max_lr / div
        if three_phase:
            phases = [(pct * total - 1, 1, div),
                      (2 * pct * total - 2, div, 1),
                      (total - 1, 1, 1 / fdiv)]
        else:
            phases = [(pct * total - 1, 1, div),
                      (total - 1, div, 1 / fdiv)]
        exp = []
        for it in range(total):
            start = 0.0
            for end, sr, er in phases:
                if it <= end:
                    p = (it - start) / (end - start)
                    exp.append(_np_anneal_cos(init * sr, init * er, p))
                    break
                start = end
        np.testing.assert_allclose(got, np.asarray(exp), rtol=1e-4,
                                   atol=1e-6)


class TestAdan:
    def test_decreases_quadratic(self):
        params = {"w": jnp.array([2.0, -3.0])}
        tx = adan(0.1)
        state = tx.init(params)

        def loss(p):
            return jnp.sum(p["w"] ** 2)

        for _ in range(300):
            g = jax.grad(loss)(params)
            updates, state = tx.update(g, state, params)
            params = optax.apply_updates(params, updates)
        assert float(loss(params)) < 0.05

    def test_proximal_matches_reference_algorithm(self):
        """no_prox=False golden test vs a direct numpy transcription of
        official Adan (arXiv:2208.06677 Alg.1): p ← (p − lr·d)/(1 + lr·wd)."""
        lr, wd = 0.05, 0.1
        b1, b2, b3, eps = 0.98, 0.92, 0.99, 1e-8
        rng = np.random.default_rng(0)
        p_np = rng.normal(size=(3, 2)).astype(np.float64)
        grads = [rng.normal(size=(3, 2)).astype(np.float64)
                 for _ in range(5)]

        m = v = n = np.zeros_like(p_np)
        prev = None
        expect = p_np.copy()
        for t, g in enumerate(grads, start=1):
            d = np.zeros_like(g) if prev is None else g - prev
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * d
            n = b3 * n + (1 - b3) * (g + (1 - b2) * d) ** 2
            upd = (m / (1 - b1 ** t) + (1 - b2) * v / (1 - b2 ** t)) / (
                np.sqrt(n / (1 - b3 ** t)) + eps)
            expect = (expect - lr * upd) / (1 + lr * wd)
            prev = g

        params = {"w": jnp.asarray(p_np, jnp.float32)}
        tx = adan(lr, weight_decay=wd, no_prox=False)
        state = tx.init(params)
        for g in grads:
            updates, state = tx.update(
                {"w": jnp.asarray(g, jnp.float32)}, state, params)
            params = optax.apply_updates(params, updates)
        np.testing.assert_allclose(np.asarray(params["w"]), expect,
                                   rtol=1e-4, atol=1e-5)

    def test_adanp_and_adan_differ_under_decay(self):
        params = {"w": jnp.ones((4,)) * 2.0}
        g = {"w": jnp.ones((4,))}
        outs = {}
        for no_prox in (True, False):
            tx = adan(0.1, weight_decay=0.5, no_prox=no_prox,
                      mask=lambda p: jax.tree_util.tree_map(
                          lambda _: True, p))
            st = tx.init(params)
            u, _ = tx.update(g, st, params)
            outs[no_prox] = np.asarray(optax.apply_updates(params, u)["w"])
        assert not np.allclose(outs[True], outs[False])


class TestBuildOptimizer:
    def test_frozen_leaves_stay_fixed(self):
        cfg = VLMConfig.tiny_test(stage=1)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        conf = ConfigDict({"optimizer": "adamw", "lr": 1e-2, "wd": 0.0,
                           "max_grad_norm": 1.0})
        tx = build_optimizer(conf, params, trainable_mask(params, cfg))
        state = tx.init(params)
        batch = jax.tree_util.tree_map(jnp.asarray, _tiny_batch(
            np.random.default_rng(0)))
        step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
        new_params, _, metrics = jax.jit(step)(params, state, batch)
        # llama + vit frozen at stage 1
        np.testing.assert_allclose(new_params["llama"]["lm_head"],
                                   params["llama"]["lm_head"])
        np.testing.assert_allclose(new_params["vit"]["patch_proj"],
                                   params["vit"]["patch_proj"])
        # pooler moved
        assert not np.allclose(new_params["pooler"]["query"],
                               params["pooler"]["query"])
        assert np.isfinite(metrics["total_loss"])


class TestShardedStep:
    def test_dp_tp_mesh_step_runs_and_matches_single(self):
        cfg = VLMConfig.tiny_test(stage=1)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        conf = ConfigDict({"optimizer": "adamw", "lr": 1e-3, "wd": 0.0,
                           "max_grad_norm": 0.0})
        tx = build_optimizer(conf, params, trainable_mask(params, cfg))
        batch_np = _tiny_batch(np.random.default_rng(0), b=4)
        step = make_train_step(cfg, tx, compute_dtype=jnp.float32)

        # single-device reference
        p0 = jax.tree_util.tree_map(jnp.asarray, params)
        s0 = tx.init(p0)
        b0 = jax.tree_util.tree_map(jnp.asarray, batch_np)
        ref_params, _, ref_metrics = jax.jit(step)(p0, s0, b0)

        # 2x4 mesh
        mesh = make_mesh(dp=2, tp=4)
        sharded = shard_params(mesh, params)
        st = tx.init(sharded)
        from jax.sharding import NamedSharding, PartitionSpec as P

        bsh = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x),
                                     NamedSharding(mesh, P("data"))),
            batch_np)
        new_params, _, metrics = jax.jit(step)(sharded, st, bsh)
        assert np.isfinite(float(metrics["total_loss"]))
        np.testing.assert_allclose(float(metrics["total_loss"]),
                                   float(ref_metrics["total_loss"]),
                                   rtol=1e-4)
        np.testing.assert_allclose(
            np.asarray(new_params["pooler"]["query"]),
            np.asarray(ref_params["pooler"]["query"]), rtol=1e-3, atol=1e-5)

    def test_lora_stage2_sharded(self):
        cfg = VLMConfig.tiny_test(stage=2, lora=True)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        conf = ConfigDict({"optimizer": "adamw", "lr": 1e-3, "wd": 0.0})
        tx = build_optimizer(conf, params, trainable_mask(params, cfg))
        mesh = make_mesh(dp=2, tp=4)
        sharded = shard_params(mesh, params)
        st = tx.init(sharded)
        from jax.sharding import NamedSharding, PartitionSpec as P

        batch = jax.tree_util.tree_map(
            lambda x: jax.device_put(np.asarray(x),
                                     NamedSharding(mesh, P("data"))),
            _tiny_batch(np.random.default_rng(1), b=4))
        step = make_train_step(cfg, tx, compute_dtype=jnp.float32)
        new_params, _, metrics = jax.jit(step)(sharded, st, batch)
        assert np.isfinite(float(metrics["total_loss"]))
        # lora B moved, base frozen
        assert not np.allclose(np.asarray(new_params["lora"]["wq"]["b"]), 0.0)
        np.testing.assert_allclose(np.asarray(new_params["llama"]["layers"]["wq"]),
                                   np.asarray(params["llama"]["layers"]["wq"]))


class TestTrainerLoop:
    def _make_trainer(self, tmp_path, max_iters=4):
        cfg = VLMConfig.tiny_test(stage=1)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        conf = ConfigDict({"optimizer": "adamw", "lr": 1e-3, "wd": 0.0})
        tx = build_optimizer(conf, params, trainable_mask(params, cfg))
        return IterBasedTrainer(
            cfg, params, tx, _ToyLoader(),
            max_iters=max_iters, work_dir=str(tmp_path),
            compute_dtype=jnp.float32, log_period=2, ckpt_period=2,
        )

    def test_loop_runs_and_checkpoints(self, tmp_path):
        t = self._make_trainer(tmp_path)
        t.train()
        assert t.cur_iter == 4
        assert "total_loss" in t.metric_storage.keys()
        ckpts = os.listdir(os.path.join(str(tmp_path), "checkpoints"))
        assert any(c.startswith("checkpoint_") for c in ckpts)

    def test_resume_restores_iter_and_params(self, tmp_path):
        t = self._make_trainer(tmp_path, max_iters=2)
        t.train()
        w_after = np.asarray(t.params["pooler"]["query"])

        t2 = self._make_trainer(tmp_path, max_iters=4)
        assert t2.resume()
        assert t2.cur_iter == 2
        np.testing.assert_allclose(
            np.asarray(t2.params["pooler"]["query"]), w_after, atol=1e-6)
        t2.train()
        assert t2.cur_iter == 4


class TestMetricStorage:
    def test_smooth_and_latest(self):
        ms = MetricStorage(window_size=2)
        ms.update(0, loss=4.0)
        ms.update(1, loss=2.0)
        ms.update(2, loss=0.0)
        assert ms.values_maybe_smooth()["loss"] == pytest.approx(1.0)
        ms.update(0, smooth=False, lr=0.5)
        assert ms.values_maybe_smooth()["lr"] == 0.5
        state = ms.state_dict()
        ms2 = MetricStorage()
        ms2.load_state_dict(state)
        assert ms2["loss"].global_avg == pytest.approx(2.0)


class TestZeroSharding:
    def test_replicated_param_moments_shard_over_data(self, tmp_path):
        from jax.sharding import PartitionSpec as P

        cfg = VLMConfig.tiny_test(stage=1)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        conf = ConfigDict({"optimizer": "adamw", "lr": 1e-3, "wd": 0.0})
        tx = build_optimizer(conf, params, trainable_mask(params, cfg))
        mesh = make_mesh(dp=2, tp=4)
        t = IterBasedTrainer(
            cfg, params, tx, _ToyLoader(), max_iters=2, mesh=mesh,
            work_dir=str(tmp_path), compute_dtype=jnp.float32, ckpt_period=2)

        def find_query_moment(state):
            # locate a pooler-query-shaped leaf in the optimizer state
            shape = t.params["pooler"]["query"].shape
            for leaf in jax.tree_util.tree_leaves(state):
                if hasattr(leaf, "shape") and leaf.shape == shape:
                    return leaf
            return None

        mom = find_query_moment(t.opt_state)
        assert mom is not None
        spec = mom.sharding.spec
        assert "data" in str(spec), spec  # ZeRO: sharded over data axis

        t.train()
        # resume restores the same placement
        t2 = IterBasedTrainer(
            cfg, init_vlm_params(jax.random.PRNGKey(1), cfg), tx,
            _ToyLoader(), max_iters=4, mesh=mesh, work_dir=str(tmp_path),
            compute_dtype=jnp.float32, ckpt_period=100)
        assert t2.resume()
        mom2 = find_query_moment(t2.opt_state)
        assert "data" in str(mom2.sharding.spec)
        t2.train()
        assert t2.cur_iter == 4


class TestMaskedOptimizerMemory:
    def test_no_moments_for_frozen_params(self):
        """Stage 1 freezes ViT+LLM: optimizer state must not contain
        llama-weight-shaped moment arrays (the 3x-params memory trap)."""
        cfg = VLMConfig.tiny_test(stage=1)
        params = init_vlm_params(jax.random.PRNGKey(0), cfg)
        conf = ConfigDict({"optimizer": "adamw", "lr": 1e-3, "wd": 0.01})
        tx = build_optimizer(conf, params, trainable_mask(params, cfg))
        state = tx.init(params)
        llama_wq_shape = params["llama"]["layers"]["wq"].shape
        vit_shape = params["vit"]["layers"]["w_fc"].shape
        pool_shape = params["pooler"]["layers"]["w_fc"].shape
        shapes = [tuple(l.shape) for l in jax.tree_util.tree_leaves(state)
                  if hasattr(l, "shape")]
        assert tuple(llama_wq_shape) not in shapes
        assert tuple(vit_shape) not in shapes
        assert tuple(pool_shape) in shapes  # pooler trains → moments exist
