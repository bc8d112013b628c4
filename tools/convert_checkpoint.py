"""Convert reference-format checkpoints to a native orbax checkpoint.

Torch deserialization (FINAL.pt + HF shards + TextLoRA) is slow and
host-memory heavy at 7B; production serving wants a one-time conversion to
orbax so startup is a parallel mmap'd read:

    python tools/convert_checkpoint.py -c Config/multi_modal_eval.yaml \
        --model-path FINAL.pt --output ckpt_orbax/

Loading back: lhrs_bot_tpu.core.model_io.load_orbax_params(path, cfg).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    from lhrs_bot_tpu.core.bootstrap import parse_config, setup
    from lhrs_bot_tpu.core.model_io import load_pretrained, save_orbax_params
    from lhrs_bot_tpu.models.vlm import VLMConfig

    config = parse_config("Convert reference checkpoints to orbax")
    logger = setup(config)
    cfg = VLMConfig.from_config_dict(config)
    params = load_pretrained(
        cfg,
        model_path=getattr(config, "model_path", None),
        vit_path=getattr(config.rgb_vision, "vit_name", None),
        llama_path=getattr(config.text, "path", None),
    )
    out = os.path.join(config.output, "orbax")
    save_orbax_params(out, params)
    logger.info("wrote orbax checkpoint to %s", out)


if __name__ == "__main__":
    main()
