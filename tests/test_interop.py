"""Checkpoint interop: numerical parity of imported HF/torch weights.

These are the golden tests of SURVEY.md §7.2's parity oracle at tiny scale:
random-weight HF models forwarded in torch vs our JAX modules with imported
params — agreement validates every weight-layout convention (transposes,
packed qkv, conv flattening, LoRA A/B orientation).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from lhrs_bot_tpu.core import torch_import as ti
from lhrs_bot_tpu.models.llama import LlamaConfig, llama_apply
from lhrs_bot_tpu.models.lora import LoraConfig, init_lora_params, merge_lora
from lhrs_bot_tpu.models.perceiver import (
    PerceiverConfig,
    init_perceiver_params,
    perceiver_resample,
)
from lhrs_bot_tpu.models.vit import ViTConfig, vit_encode
from lhrs_bot_tpu.models.llama import init_llama_params

F32 = jnp.float32


class TestClipImport:
    @pytest.fixture(scope="class")
    def hf_clip(self):
        from transformers import CLIPVisionConfig, CLIPVisionModel

        cfg = CLIPVisionConfig(
            hidden_size=32, intermediate_size=128, num_hidden_layers=4,
            num_attention_heads=2, image_size=28, patch_size=14,
            hidden_act="quick_gelu")
        torch.manual_seed(0)
        model = CLIPVisionModel(cfg).eval()
        return model, cfg

    def test_forward_parity(self, hf_clip):
        model, hf_cfg = hf_clip
        cfg = ViTConfig(image_size=28, patch_size=14, width=32, layers=4,
                        heads=2, extract_stages=(1, 2, 3))
        params = ti.vit_params_from_hf_state_dict(model.state_dict(), cfg)

        rng = np.random.default_rng(0)
        pixels = rng.normal(size=(2, 3, 28, 28)).astype(np.float32)
        with torch.no_grad():
            out = model(torch.from_numpy(pixels), output_hidden_states=True)
        # reference tap semantics: hidden_states[k], CLS dropped, concat
        expected = np.concatenate(
            [out.hidden_states[k][:, 1:, :].numpy() for k in (1, 2, 3)],
            axis=1)

        got = vit_encode(params, jnp.asarray(pixels), cfg, compute_dtype=F32)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3,
                                   atol=2e-3)


class TestLlamaImport:
    def test_forward_parity(self):
        from transformers import LlamaConfig as HFLlamaConfig
        from transformers import LlamaForCausalLM

        hf_cfg = HFLlamaConfig(
            vocab_size=128, hidden_size=32, intermediate_size=64,
            num_hidden_layers=2, num_attention_heads=4,
            num_key_value_heads=4, max_position_embeddings=64,
            rms_norm_eps=1e-5, attn_implementation="eager")
        torch.manual_seed(0)
        model = LlamaForCausalLM(hf_cfg).eval()

        cfg = LlamaConfig(vocab_size=128, hidden_size=32,
                          intermediate_size=64, num_hidden_layers=2,
                          num_attention_heads=4, max_position_embeddings=64)
        params = ti.llama_params_from_hf_state_dict(model.state_dict(), cfg)

        ids = np.random.default_rng(0).integers(0, 128, size=(2, 10))
        with torch.no_grad():
            expected = model(torch.from_numpy(ids)).logits.numpy()
        got = llama_apply(params, cfg, input_ids=jnp.asarray(ids),
                          compute_dtype=F32)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3,
                                   atol=2e-3)


class TestPoolerInterop:
    def test_multihead_attention_block_parity(self):
        """Validate the packed in_proj convention against torch's
        nn.MultiheadAttention used by the reference blocks."""
        h, heads, nq, nkv = 32, 4, 6, 10
        torch.manual_seed(1)
        mha = torch.nn.MultiheadAttention(h, heads).eval()

        cfg = PerceiverConfig(num_query=nq, num_layers=1, heads=heads,
                              hidden_size=h, encoder_hidden_size=h,
                              output_size=h, stage_num=(nq,),
                              split_part=(nkv,))
        sd = {f"layers.0.attn.{k}": v for k, v in mha.state_dict().items()}
        # identity norms, zero mlp so only attention acts
        eye = torch.ones(h)
        zero = torch.zeros(h)
        sd.update({
            "layers.0.ln_1.weight": eye, "layers.0.ln_1.bias": zero,
            "layers.0.ln_1_kv.weight": eye, "layers.0.ln_1_kv.bias": zero,
            "layers.0.ln_2.weight": eye, "layers.0.ln_2.bias": zero,
            "layers.0.mlp.c_fc.weight": torch.zeros(4 * h, h),
            "layers.0.mlp.c_fc.bias": torch.zeros(4 * h),
            "layers.0.mlp.c_proj.weight": torch.zeros(h, 4 * h),
            "layers.0.mlp.c_proj.bias": torch.zeros(h),
            "query": torch.zeros(1, nq, h),
            "out_proj.weight": torch.eye(h), "out_proj.bias": torch.zeros(h),
        })
        params = ti.pooler_params_from_torch_state_dict(sd, cfg)

        rng = np.random.default_rng(0)
        q = rng.normal(size=(2, nq, h)).astype(np.float32)
        kv = rng.normal(size=(2, nkv, h)).astype(np.float32)

        # torch: (L, B, D) layout, attention only (post-LN of normalized in)
        import torch.nn.functional as tF

        def torch_ln(x):
            return tF.layer_norm(x, (h,))

        with torch.no_grad():
            attn_out, _ = mha(
                torch_ln(torch.from_numpy(q)).permute(1, 0, 2),
                torch_ln(torch.from_numpy(kv)).permute(1, 0, 2),
                torch_ln(torch.from_numpy(kv)).permute(1, 0, 2),
                need_weights=False)
        expected = q + attn_out.permute(1, 0, 2).numpy()

        from lhrs_bot_tpu.models.perceiver import _cross_block

        lp = jax.tree_util.tree_map(lambda x: jnp.asarray(x)[0],
                                    params["layers"])
        got = _cross_block(jnp.asarray(q), jnp.asarray(kv), lp, cfg)
        np.testing.assert_allclose(np.asarray(got), expected, rtol=2e-3,
                                   atol=2e-3)

    def test_export_import_roundtrip(self, tmp_path):
        cfg = PerceiverConfig.tiny_test()
        params = init_perceiver_params(jax.random.PRNGKey(0), cfg)
        vit_cfg = ViTConfig.tiny_test()
        from lhrs_bot_tpu.models.vit import init_vit_params

        full = {"vit": init_vit_params(jax.random.PRNGKey(1), vit_cfg),
                "pooler": params}
        path = str(tmp_path / "FINAL.pt")
        ti.export_final_pt(path, full, vit_cfg, cfg)
        back = ti.load_final_pt(path, vit_cfg, cfg)

        for tree_name in ("vit", "pooler"):
            flat_a, _ = jax.tree_util.tree_flatten(full[tree_name])
            flat_b, _ = jax.tree_util.tree_flatten(back[tree_name])
            for a, b in zip(flat_a, flat_b):
                np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                           rtol=1e-5, atol=1e-6)


class TestFinalPtFormats:
    """Fuzz load_final_pt against the GENUINE reference artifact layout:
    other_ckpt is nested {rgb_pooler: {...}, text_proj: {}, embed_tokens:
    {...}, lm_head: {}} per get_other_maybe_zero_3 (UniBind.py:275-294),
    possibly wrapped in a {"model": ...} envelope (UniBind.py:90-92)."""

    def _nested_ckpt(self, tmp_path, wrap_model=False, extra_keys=False,
                     with_embed=False):
        cfg = PerceiverConfig.tiny_test()
        vit_cfg = ViTConfig.tiny_test()
        from lhrs_bot_tpu.models.vit import init_vit_params

        full = {"vit": init_vit_params(jax.random.PRNGKey(1), vit_cfg),
                "pooler": init_perceiver_params(jax.random.PRNGKey(0), cfg)}
        path = str(tmp_path / "FINAL.pt")
        ti.export_final_pt(path, full, vit_cfg, cfg)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        assert isinstance(ckpt["other_ckpt"]["rgb_pooler"], dict)
        assert set(ckpt["other_ckpt"]) == {
            "rgb_pooler", "text_proj", "embed_tokens", "lm_head"}
        if with_embed:
            ckpt["other_ckpt"]["embed_tokens"] = {
                "weight": torch.randn(32, 8)}
        if extra_keys:
            # keys a real fp32 consolidation can carry that we don't model
            ckpt["other_ckpt"]["rgb_pooler"]["rotary_emb.inv_freq"] = (
                torch.randn(4))
            ckpt["rgb_ckpt"]["vision_model.embeddings.position_ids"] = (
                torch.arange(10)[None])
        if wrap_model:
            ckpt = {"model": ckpt}
        torch.save(ckpt, path)
        return path, full, cfg, vit_cfg

    def test_nested_layout_loads_pooler(self, tmp_path):
        path, full, cfg, vit_cfg = self._nested_ckpt(tmp_path)
        back = ti.load_final_pt(path, vit_cfg, cfg)
        np.testing.assert_allclose(
            np.asarray(full["pooler"]["query"]),
            np.asarray(back["pooler"]["query"]), rtol=1e-5, atol=1e-6)

    def test_model_envelope_and_extra_keys(self, tmp_path):
        path, full, cfg, vit_cfg = self._nested_ckpt(
            tmp_path, wrap_model=True, extra_keys=True, with_embed=True)
        back = ti.load_final_pt(path, vit_cfg, cfg)
        np.testing.assert_allclose(
            np.asarray(full["pooler"]["out_proj_w"]),
            np.asarray(back["pooler"]["out_proj_w"]), rtol=1e-5, atol=1e-6)
        assert back["extra"]["embed_tokens.weight"].shape == (32, 8)

    def test_legacy_flat_layout_still_loads(self, tmp_path):
        path, full, cfg, vit_cfg = self._nested_ckpt(tmp_path)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        flat = {f"rgb_pooler.{k}": v
                for k, v in ckpt["other_ckpt"]["rgb_pooler"].items()}
        flat["model.embed_tokens.weight"] = torch.randn(32, 8)
        torch.save({"rgb_ckpt": ckpt["rgb_ckpt"], "other_ckpt": flat}, path)
        back = ti.load_final_pt(path, vit_cfg, cfg)
        np.testing.assert_allclose(
            np.asarray(full["pooler"]["query"]),
            np.asarray(back["pooler"]["query"]), rtol=1e-5, atol=1e-6)
        assert back["extra"]["model.embed_tokens.weight"].shape == (32, 8)

    def test_missing_pooler_group_tolerated(self, tmp_path):
        path, full, cfg, vit_cfg = self._nested_ckpt(tmp_path)
        ckpt = torch.load(path, map_location="cpu", weights_only=False)
        ckpt["other_ckpt"]["rgb_pooler"] = {}
        torch.save(ckpt, path)
        back = ti.load_final_pt(path, vit_cfg, cfg)
        assert "pooler" not in back and "vit" in back


class TestLoraInterop:
    def test_export_import_roundtrip(self, tmp_path):
        cfg = LlamaConfig.tiny_test()
        lcfg = LoraConfig(r=4, alpha=8)
        lora = init_lora_params(jax.random.PRNGKey(0), cfg, lcfg)
        # make B nonzero so the roundtrip is meaningful
        lora = jax.tree_util.tree_map(
            lambda x: x + 0.01 * jnp.arange(x.size).reshape(x.shape), lora)
        lora_dir = str(tmp_path / "TextLoRA")
        ti.export_text_lora(lora_dir, lora, cfg, r=4, alpha=8)
        back = ti.load_text_lora(lora_dir, cfg, r=4, alpha=8)
        assert back is not None and set(back) == set(lora)
        for name in lora:
            np.testing.assert_allclose(np.asarray(lora[name]["a"]),
                                       back[name]["a"], rtol=1e-5)
            np.testing.assert_allclose(np.asarray(lora[name]["b"]),
                                       back[name]["b"], rtol=1e-5)

    def test_missing_dir_returns_none(self, tmp_path):
        assert ti.load_text_lora(str(tmp_path / "nope"),
                                 LlamaConfig.tiny_test(), 4, 8) is None
