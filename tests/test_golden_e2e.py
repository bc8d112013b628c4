"""Golden end-to-end parity: our JAX VLM vs a torch/HF reference pipeline.

This is SURVEY.md §7.2's parity oracle at tiny scale: the SAME weights run
through (a) our stack (vit_encode → perceiver_resample → splice →
llama_apply) and (b) a torch pipeline assembled exactly like the reference
architecture — HF CLIPVisionModel with multi-level hidden_states taps, a
torch MultiheadAttention perceiver (the reference's ResidualAttentionBlock
semantics), embedding splice, HF LlamaForCausalLM loss/greedy decode.

Agreement here pins down every cross-framework convention at once: conv
flattening, taps indexing, packed qkv, pre-LN block wiring, splice layout,
label masking interplay, loss reduction, and the KV-cached greedy loop.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
import torch.nn as nn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from lhrs_bot_tpu.core import torch_import as ti  # noqa: E402
from lhrs_bot_tpu.models import (  # noqa: E402
    IGNORE_INDEX,
    IMAGE_TOKEN_INDEX,
    VLMConfig,
    init_vlm_params,
    llama_apply,
    vlm_forward_loss,
)
from lhrs_bot_tpu.models.perceiver import PerceiverConfig  # noqa: E402
from lhrs_bot_tpu.models.vit import ViTConfig  # noqa: E402
from lhrs_bot_tpu.models.llama import LlamaConfig  # noqa: E402

F32 = jnp.float32


class TorchPooler(nn.Module):
    """Reference-architecture perceiver: pre-LN cross-attn blocks with
    q = evolving group queries, kv = fixed concat(initial queries, level
    tokens), shared across groups (common_arch.py:93-173 semantics)."""

    def __init__(self, cfg: PerceiverConfig):
        super().__init__()
        self.cfg = cfg
        h = cfg.hidden_size
        self.query = nn.Parameter(torch.zeros(1, cfg.num_query, h))
        self.layers = nn.ModuleList()
        for _ in range(cfg.num_layers):
            blk = nn.Module()
            blk.ln_1 = nn.LayerNorm(h)
            blk.ln_1_kv = nn.LayerNorm(h)
            blk.attn = nn.MultiheadAttention(h, cfg.heads)
            blk.ln_2 = nn.LayerNorm(h)
            blk.mlp = nn.Sequential()
            blk.mlp.c_fc = nn.Linear(h, h * cfg.mlp_ratio)
            blk.mlp.c_proj = nn.Linear(h * cfg.mlp_ratio, h)
            self.layers.append(blk)
        self.out_proj = nn.Linear(h, cfg.output_size)

    def forward(self, image_embs):
        b = image_embs.shape[0]
        queries = self.query.expand(b, -1, -1)
        q_groups = torch.split(queries, list(self.cfg.stage_num), dim=1)
        img_groups = torch.split(image_embs, list(self.cfg.split_part), dim=1)
        outs = []
        for q0, img in zip(q_groups, img_groups):
            kv = torch.cat([q0, img], dim=1).permute(1, 0, 2)
            x = q0.permute(1, 0, 2)
            for blk in self.layers:
                kvn = blk.ln_1_kv(kv)
                attn, _ = blk.attn(blk.ln_1(x), kvn, kvn, need_weights=False)
                x = x + attn
                h2 = blk.ln_2(x)
                x = x + blk.mlp.c_proj(tF.gelu(blk.mlp.c_fc(h2)))
            outs.append(x.permute(1, 0, 2))
        return self.out_proj(torch.cat(outs, dim=1))


def _load_pooler_weights(pooler: TorchPooler, other_sd):
    # nested reference layout (UniBind.py:275-294): other_ckpt["rgb_pooler"]
    # carries the pooler state dict with the group prefix stripped
    sd = dict(other_sd["rgb_pooler"])
    # query stored (1, nq, h)
    missing, unexpected = pooler.load_state_dict(sd, strict=False)
    assert not missing, missing
    return pooler


@pytest.fixture(scope="module")
def setup():
    vit = ViTConfig(image_size=28, patch_size=14, width=32, layers=4,
                    heads=2, extract_stages=(1, 2, 3))
    pooler = PerceiverConfig(
        num_query=6, num_layers=2, heads=2, hidden_size=32,
        encoder_hidden_size=32, output_size=48,
        stage_num=(3, 2, 1), split_part=(4, 4, 4))
    llama = LlamaConfig(vocab_size=160, hidden_size=48, intermediate_size=96,
                        num_hidden_layers=2, num_attention_heads=4,
                        max_position_embeddings=96)
    cfg = VLMConfig(vit=vit, pooler=pooler, llama=llama, stage=1)
    params = init_vlm_params(jax.random.PRNGKey(42), cfg)

    # --- torch side, fed OUR weights through the interop exporters ---
    import tempfile

    from transformers import (
        CLIPVisionConfig, CLIPVisionModel, LlamaConfig as HFLlamaConfig,
        LlamaForCausalLM)

    with tempfile.NamedTemporaryFile(suffix=".pt") as tmp:
        ti.export_final_pt(tmp.name, params, vit, pooler)
        ckpt = torch.load(tmp.name, map_location="cpu", weights_only=False)

    hf_vit = CLIPVisionModel(CLIPVisionConfig(
        hidden_size=32, intermediate_size=128, num_hidden_layers=4,
        num_attention_heads=2, image_size=28, patch_size=14,
        hidden_act="quick_gelu")).eval()
    missing, unexpected = hf_vit.load_state_dict(ckpt["rgb_ckpt"],
                                                 strict=False)
    assert not [m for m in missing if "position_ids" not in m], missing

    tpool = TorchPooler(pooler).eval()
    _load_pooler_weights(tpool, ckpt["other_ckpt"])

    hf_llama = LlamaForCausalLM(HFLlamaConfig(
        vocab_size=160, hidden_size=48, intermediate_size=96,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=4,
        max_position_embeddings=96, rms_norm_eps=1e-5,
        attn_implementation="eager")).eval()
    sd = ti.export_hf_llama_state_dict(params["llama"], llama)
    missing, unexpected = hf_llama.load_state_dict(sd, strict=False)
    assert not [m for m in missing if "rotary" not in m], missing

    return cfg, params, hf_vit, tpool, hf_llama


def _torch_encode_image(hf_vit, tpool, pixel_values, stages=(1, 2, 3)):
    with torch.no_grad():
        out = hf_vit(pixel_values, output_hidden_states=True)
        feats = torch.cat([out.hidden_states[s][:, 1:, :] for s in stages],
                          dim=1)
        return tpool(feats)


def _torch_splice(ids_row, img_embs, embed_layer):
    pos = int((ids_row == IMAGE_TOKEN_INDEX).nonzero()[0])
    before = embed_layer(ids_row[:pos])
    after = embed_layer(ids_row[pos + 1:])
    return torch.cat([before, img_embs, after], dim=0)


class TestGoldenE2E:
    def test_training_loss_parity(self, setup):
        cfg, params, hf_vit, tpool, hf_llama = setup
        rng = np.random.default_rng(0)
        b, t = 2, 10
        ids = rng.integers(4, 150, size=(b, t)).astype(np.int64)
        ids[:, 1] = IMAGE_TOKEN_INDEX
        labels = ids.copy()
        labels[:, :3] = IGNORE_INDEX
        pixels = rng.normal(size=(b, 3, 28, 28)).astype(np.float32)

        # ours
        out = vlm_forward_loss(
            params, cfg,
            {"input_ids": jnp.asarray(ids.astype(np.int32)),
             "labels": jnp.asarray(labels.astype(np.int32)),
             "attention_mask": jnp.ones((b, t), bool),
             "images": jnp.asarray(pixels)},
            compute_dtype=F32)
        ours = float(out["total_loss"])

        # torch reference pipeline
        with torch.no_grad():
            img_embs = _torch_encode_image(
                hf_vit, tpool, torch.from_numpy(pixels))
            embeds, tgt = [], []
            n_img = img_embs.shape[1]
            for row in range(b):
                emb = _torch_splice(torch.from_numpy(ids[row]),
                                    img_embs[row],
                                    hf_llama.get_input_embeddings())
                embeds.append(emb)
                lab = torch.from_numpy(labels[row])
                pos = int((torch.from_numpy(ids[row]) ==
                           IMAGE_TOKEN_INDEX).nonzero()[0])
                tgt.append(torch.cat([
                    lab[:pos],
                    torch.full((n_img,), IGNORE_INDEX, dtype=lab.dtype),
                    lab[pos + 1:]]))
            inputs_embeds = torch.stack(embeds)
            target = torch.stack(tgt)
            theirs = float(hf_llama(inputs_embeds=inputs_embeds,
                                    labels=target).loss)

        assert ours == pytest.approx(theirs, rel=2e-3), (ours, theirs)

    def test_greedy_generation_parity(self, setup):
        cfg, params, hf_vit, tpool, hf_llama = setup
        rng = np.random.default_rng(1)
        t = 8
        ids = rng.integers(4, 150, size=(1, t)).astype(np.int64)
        ids[0, 1] = IMAGE_TOKEN_INDEX
        pixels = rng.normal(size=(1, 3, 28, 28)).astype(np.float32)

        from lhrs_bot_tpu.serve.engine import GenerationConfig, GenerationEngine

        engine = GenerationEngine(cfg, params, max_seq_len=64,
                                  compute_dtype=F32, cache_dtype=F32)
        ours = engine.generate(
            ids.astype(np.int32), np.asarray([t], np.int32),
            images=pixels,
            gen_cfg=GenerationConfig(max_new_tokens=6,
                                     eos_token_id=cfg.llama.eos_token_id))[0]

        with torch.no_grad():
            img_embs = _torch_encode_image(
                hf_vit, tpool, torch.from_numpy(pixels))
            emb = _torch_splice(torch.from_numpy(ids[0]), img_embs[0],
                                hf_llama.get_input_embeddings())[None]
            out_ids = hf_llama.generate(
                inputs_embeds=emb, max_new_tokens=6, do_sample=False,
                num_beams=1, pad_token_id=0,
                eos_token_id=cfg.llama.eos_token_id)
            theirs = [int(x) for x in out_ids[0]
                      if int(x) != cfg.llama.eos_token_id]

        assert ours == theirs, (ours, theirs)
