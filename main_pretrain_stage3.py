"""Stage-3 pretraining: high-quality instruction tuning, iteration-based.

Parity with the reference main_pretrain_stage3.py: IterBasedTrainer with
max_iters = config.epochs (=1200 in the recipe), weighted source mixing
(weight_sample), perceiver frozen, the stage-2 LoRA adapters keep training.

Run: python main_pretrain_stage3.py -c Config/multi_modal_stage3.yaml \
       --model-path out_stage2/FINAL.pt --data-path <dir>
"""

from __future__ import annotations


def main():
    import jax

    from lhrs_bot_tpu.core.bootstrap import (
        build_model_and_tokenizer, parse_config, setup)
    from lhrs_bot_tpu.core.model_io import save_final
    from lhrs_bot_tpu.data.build_loader import build_loader
    from lhrs_bot_tpu.models.vlm import trainable_mask
    from lhrs_bot_tpu.parallel.mesh import make_mesh
    from lhrs_bot_tpu.train import (
        IterBasedTrainer, build_optimizer, build_schedule)

    config = parse_config("LHRS-Bot TPU stage-3 pretraining")
    logger = setup(config)

    cfg, params, tokenizer = build_model_and_tokenizer(config)
    loader = build_loader(config, tokenizer, mode="pretrain",
                          rank=config.rank, world_size=config.world_size)

    max_iters = int(config.epochs)  # the stage-3 recipe treats epochs as iters
    schedule = build_schedule(config, max_iters)
    tx = build_optimizer(config, params, trainable_mask(params, cfg),
                         schedule=schedule)
    mesh = make_mesh(dp=config.dp, tp=config.tp) if (
        config.dp or config.tp or len(jax.devices()) > 1) else None

    trainer = IterBasedTrainer(
        cfg, params, tx, loader,
        max_iters=max_iters,
        mesh=mesh,
        work_dir=config.output,
        remat=bool(config.use_checkpoint),
        log_period=50,
        ckpt_period=int(getattr(config, "ckpt_period", 100)),
        max_to_keep=1,
        schedule=schedule,
    )
    trainer.train(resume=bool(config.auto_resume))

    if config.rank == 0:
        save_final(config.output, trainer.params, cfg)
        logger.info("stage-%d training complete", int(config.stage))


if __name__ == "__main__":
    main()
