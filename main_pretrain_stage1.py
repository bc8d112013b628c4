"""Stage-1 pretraining: caption alignment (perceiver trains, towers frozen).

Entry-point parity with the reference main_pretrain_stage1.py (same CLI
surface: -c Config/multi_modal_stage1.yaml plus --data-path/--batch-size/...),
rebuilt on the SPMD trainer: DeepSpeed ZeRO-2 is replaced by pjit-sharded
training over a ("data","model") mesh.

Run: python main_pretrain_stage1.py -c Config/multi_modal_stage1.yaml \
       --data-path <dir> --batch-size 8 --output out_stage1
"""

from __future__ import annotations

import os


def main(config=None):
    import jax

    from lhrs_bot_tpu.core.bootstrap import (
        build_model_and_tokenizer, parse_config, setup)
    from lhrs_bot_tpu.core.model_io import save_final
    from lhrs_bot_tpu.data.build_loader import build_loader
    from lhrs_bot_tpu.models.vlm import trainable_mask
    from lhrs_bot_tpu.parallel.mesh import make_mesh
    from lhrs_bot_tpu.train import (
        EpochBasedTrainer, build_optimizer, build_schedule)

    if config is None:
        config = parse_config("LHRS-Bot TPU stage-1 pretraining")
    logger = setup(config)

    cfg, params, tokenizer = build_model_and_tokenizer(config)
    loader = build_loader(config, tokenizer, mode="pretrain",
                          rank=config.rank, world_size=config.world_size)

    iters_per_epoch = len(loader)
    total_iters = int(config.epochs) * iters_per_epoch
    schedule = build_schedule(config, total_iters)
    tx = build_optimizer(config, params, trainable_mask(params, cfg),
                         schedule=schedule)
    mesh = make_mesh(dp=config.dp, tp=config.tp) if (
        config.dp or config.tp or len(jax.devices()) > 1) else None

    trainer = EpochBasedTrainer(
        cfg, params, tx, loader,
        epochs=int(config.epochs),
        mesh=mesh,
        work_dir=config.output,
        remat=bool(config.use_checkpoint),
        log_period=50,
        ckpt_period=int(getattr(config, "ckpt_period", 1000)),
        max_to_keep=1,
        schedule=schedule,
    )
    trainer.train(resume=bool(config.auto_resume))

    if config.rank == 0:
        save_final(config.output, trainer.params, cfg)
        logger.info("stage-%d training complete", int(config.stage))


if __name__ == "__main__":
    main()
