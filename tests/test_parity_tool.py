"""CI subset of the full-scale parity oracle (VERDICT r2 task #2).

Runs tools/make_fake_reference_ckpt.py + tools/parity_full_scale.py at
reduced shapes through the REAL tool entry points (subprocess, CPU backend)
and asserts the cross-framework numerics hold: same checkpoint through the
torch/HF reference-assembled pipeline and our serving path must produce
near-identical prefill logits and a matching greedy prefix. The full-7B
run of the same tool is executed on the chip and recorded in
PARITY_r03.json.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def parity_report(tmp_path_factory):
    ckpt = str(tmp_path_factory.mktemp("fake_ckpt"))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "make_fake_reference_ckpt.py"),
         "--output", ckpt,
         "--llama-layers", "2", "--llama-width", "256",
         "--llama-ffn", "512", "--llama-heads", "4",
         "--vocab", "1000", "--resized-vocab", "1000",
         "--vit-layers", "4", "--vit-width", "128", "--vit-ffn", "256",
         "--vit-heads", "4", "--image-size", "56",
         "--pooler-layers", "2", "--num-query", "12", "--lora-r", "8"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert gen.returncode == 0, gen.stderr[-2000:]
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "parity_full_scale.py"),
         "--ckpt", ckpt, "--cpu", "--ctx", "64", "--new-tokens", "8",
         "--configs", "bf16,int8,f32"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900)
    assert run.returncode == 0, run.stderr[-2000:]
    line = run.stdout.strip().splitlines()[-1]
    return json.loads(line)


class TestParityTool:
    def test_bf16_logits_close(self, parity_report):
        bf16 = parity_report["bf16_int8cache"]
        # bf16 (ours) vs f32 (torch) at reduced scale: ~1% relative L2
        assert bf16["logit_rel_l2"] < 0.05, bf16
        assert bf16["top1_match"], bf16
        assert bf16["top5_overlap"] >= 4, bf16

    def test_bf16_greedy_prefix(self, parity_report):
        bf16 = parity_report["bf16_int8cache"]
        # with random weights the argmax margin is small; bf16-vs-f32
        # rounding may flip a late low-margin token, but the leading
        # tokens must agree
        assert bf16["greedy_agree_prefix"] >= 3, bf16

    def test_int8_within_tolerance(self, parity_report):
        q = parity_report["int8_w8a8_int8cache"]
        # int8 weight quantization adds ~1% on top of bf16
        assert q["logit_rel_l2"] < 0.08, q
        assert q["top1_match"], q

    def test_f32_cross_implementation_exact(self, parity_report):
        """f32 (ours) vs f32 (torch): accumulation noise is near zero, so
        the greedy tokens must agree EXACTLY even though the random
        checkpoint's logit margins are flat — this is the config that
        catches convention/layout bugs that bf16 noise would mask."""
        f32 = parity_report["f32_cpu"]
        assert f32["logit_rel_l2"] < 1e-3, f32
        assert f32["top1_match"], f32
        assert f32["greedy_agree_prefix"] == f32["greedy_total"], f32

    def test_context_is_spliced(self, parity_report):
        # the oracle must run at a spliced (image-expanded) context
        assert parity_report["ctx"] > 12  # > num_query alone


@pytest.fixture(scope="module")
def stat_report(tmp_path_factory):
    """Statistical deployed-precision mode at reduced scale: margin-profile
    checkpoint, teacher-forced logits for ours-bf16/ours-f32/torch-bf16."""
    ckpt = str(tmp_path_factory.mktemp("fake_margin_ckpt"))
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    gen = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "make_fake_reference_ckpt.py"),
         "--output", ckpt, "--profile", "margin",
         "--llama-layers", "4", "--llama-width", "256",
         "--llama-ffn", "512", "--llama-heads", "4",
         "--vocab", "1000", "--resized-vocab", "1000",
         "--vit-layers", "4", "--vit-width", "128", "--vit-ffn", "256",
         "--vit-heads", "4", "--image-size", "56",
         "--pooler-layers", "2", "--num-query", "12", "--lora-r", "8"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=300)
    assert gen.returncode == 0, gen.stderr[-2000:]
    run = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools",
                                      "parity_full_scale.py"),
         "--ckpt", ckpt, "--cpu", "--statistical", "8",
         "--new-tokens", "6", "--stat-text-min", "12",
         "--stat-text-max", "32",
         "--configs", "bf16,f32,torch_bf16,w4a8"],
        capture_output=True, text=True, cwd=REPO, env=env, timeout=900)
    assert run.returncode == 0, run.stderr[-2000:]
    line = run.stdout.strip().splitlines()[-1]
    return json.loads(line)["statistical"]


class TestStatisticalParity:
    def test_margin_profile_is_realistic(self, stat_report):
        """The margin checkpoint must produce a SPREAD of margins — both
        confident and contested positions — else agreement statistics
        carry no information."""
        pct = stat_report["bf16_vs_f32"]["ref_margin_pct"]
        assert pct["p90"] > 2.0, pct        # confident positions exist
        assert pct["p10"] < pct["p90"] / 3, pct  # and contested ones

    def test_bf16_agreement_high_and_noise_like(self, stat_report):
        s = stat_report["bf16_vs_f32"]
        assert s["points"] == 8 * 7
        assert s["top1_agree_rate"] >= 0.9, s
        # the discriminator: any flip must be at a small margin relative
        # to the perturbation scale (convention bugs flip large margins)
        assert s["max_flipped_margin"] < 1.0, s
        hi = s["agree_by_margin"]["margin_4.0_inf"]
        if hi["n"]:
            assert hi["agree_rate"] == 1.0, s

    def test_cross_implementation_bf16_null_model(self, stat_report):
        """ours-bf16 vs torch-bf16: two independent bf16 implementations
        must agree wherever either is confident."""
        s = stat_report["bf16_vs_torch_bf16"]
        assert s["top1_agree_rate"] >= 0.85, s
        assert s["max_flipped_margin"] < 1.0, s

    def test_torch_bf16_vs_f32_calibrates_noise(self, stat_report):
        """torch's own bf16-vs-f32 disagreement is the null model our
        bf16 is judged against — it must be present in the report."""
        s = stat_report["torch_bf16_vs_f32"]
        assert s["points"] == 8 * 7
        assert s["top5_overlap_mean"] > 4.0, s

    def test_w4a8_deployed_recipe(self, stat_report):
        """The serving headline recipe (halves-packed int4 weights + int8
        lm_head + int8 KV): teacher-forced agreement must be noise-like
        (int4 rounding is ~18x bf16's step, so the tolerances are wider
        than bf16's but flips must still concentrate at low margins), and
        the REAL deployed decode path must produce trajectories that
        track the bf16 engine."""
        s = stat_report["w4a8_vs_f32"]
        assert s["points"] == 8 * 7
        assert s["top1_agree_rate"] >= 0.6, s
        assert s["top5_overlap_mean"] > 3.0, s
        traj = stat_report["w4a8_traj_agreement"]
        assert "identical_frac" in traj, traj
        assert traj["matched_prefix_mean"] >= 1.0, traj
