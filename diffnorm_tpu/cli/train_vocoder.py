"""Vocoder (code-HiFi-GAN) GAN-training CLI.

Capability parity with the reference's vocoder fine-tune path
(fairseq/tasks/code_hifigan.py "unit_to_speech" + the vendored TranSpeech
hifigan trainer): alternating MPD/MSD discriminator + generator updates with
mel/feature-matching losses.

  python -m diffnorm_tpu.cli.train_vocoder \
      --units-file train.units --audio-dir wavs/ \
      --vocoder-cfg config.json --save-dir ckpt/hifigan \
      --max-update 400000 --batch-size 16 --crop-units 32
"""

from __future__ import annotations

import json
import logging
import sys
import time
from typing import Optional

import jax
import numpy as np

from diffnorm_tpu.cli.args import parse_args
from diffnorm_tpu.config import Config
from diffnorm_tpu.data.code_dataset import CodeToSpeechDataset
from diffnorm_tpu.data.iterators import EpochBatchIterator
from diffnorm_tpu.train.checkpoint import CheckpointManager
from diffnorm_tpu.train.gan_trainer import GanTrainer

logger = logging.getLogger("diffnorm_tpu.train_vocoder")


def main(cfg: Optional[Config] = None) -> int:
    logging.basicConfig(level=logging.INFO, force=True,
                        format="%(asctime)s | %(levelname)s | %(message)s")
    if cfg is None:
        cfg = parse_args()
    if cfg.get("cpu"):
        jax.config.update("jax_platforms", "cpu")
    from diffnorm_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()

    with open(cfg["vocoder_cfg"]) as f:
        vcfg = json.load(f)
    common = dict(
        upsample_rates=tuple(vcfg["upsample_rates"]),
        upsample_kernel_sizes=tuple(vcfg["upsample_kernel_sizes"]),
        upsample_initial_channel=vcfg["upsample_initial_channel"],
        resblock_kernel_sizes=tuple(vcfg["resblock_kernel_sizes"]),
        resblock_dilation_sizes=tuple(
            tuple(d) for d in vcfg["resblock_dilation_sizes"]
        ),
    )
    if cfg.get("input_type", "code") == "features":
        # repr_to_speech fine-tune (reference repr_hifigan_task.py)
        from diffnorm_tpu.data.code_dataset import FeatureToSpeechDataset
        from diffnorm_tpu.models.hifigan import FeatureGenerator

        gen = FeatureGenerator(
            feature_dim=vcfg.get("model_in_dim", 768),
            embedding_dim=vcfg["embedding_dim"],
            **common,
        )
        dataset = FeatureToSpeechDataset.from_manifest(
            cfg["feat_manifest"], cfg["audio_dir"],
            crop_units=cfg.get("crop_units", 32),
        )
    else:
        from diffnorm_tpu.models.hifigan import CodeGenerator

        gen = CodeGenerator(
            num_embeddings=vcfg["num_embeddings"],
            embedding_dim=vcfg["embedding_dim"],
            dur_predictor=bool(vcfg.get("dur_predictor_params")),
            # must match CodeHiFiGANVocoder.from_config so fine-tuned
            # checkpoints load back at synthesis time
            var_pred_hidden_dim=(vcfg.get("dur_predictor_params") or {}).get(
                "var_pred_hidden_dim", 256),
            **common,
        )
        data_cfg = None
        if cfg.get("data_config"):
            import yaml

            with open(cfg["data_config"]) as f:
                data_cfg = yaml.safe_load(f)
        dataset = CodeToSpeechDataset.from_files(
            cfg["units_file"], cfg["audio_dir"],
            crop_units=cfg.get("crop_units", 32),
            # waveform_transforms / dataset_transforms blocks (noise /
            # babble / sporadic augments + batch noisy-overlap)
            data_cfg=data_cfg,
            # --dur-training: run-length duration labels so the duration
            # predictor actually trains (needed for --dur-prediction synth)
            dedup_dur=bool(cfg.get("dur_training")
                           or vcfg.get("dur_predictor_params")),
        )
    trainer = GanTrainer(gen, cfg)
    logger.info("dataset: %d utterances", len(dataset))
    itr = EpochBatchIterator(
        dataset, max_sentences=cfg.get("batch_size", 16),
        seed=cfg.get("seed", 1),
        # --num-workers: parallel host audio decode + segment crop (the
        # heaviest host-side collation in the framework)
        num_workers=int(cfg.get("num_workers", 0) or 0),
    )

    example = dataset.collater([dataset[0]])
    state = trainer.init_state(
        jax.random.PRNGKey(cfg.get("seed", 1)),
        example.get("features", example.get("code")), example["wav"]
    )
    ckpt = CheckpointManager(cfg.get("save_dir", "ckpt/vocoder"),
                             keep_last=cfg.get("keep_last_epochs", 3),
                             keep_best=0)
    restored, extra = ckpt.load_latest(target=jax.device_get(state))
    if restored is not None:
        state = jax.device_put(restored)
        logger.info("resumed from step %s", extra.get("step"))

    max_update = cfg.get("max_update", 10000)
    log_interval = cfg.get("log_interval", 100)
    save_interval = cfg.get("save_interval_updates", 5000)
    step = int(jax.device_get(state.step))
    t0 = time.time()
    while step < max_update:
        for batch in itr.next_epoch_itr():
            state, mets = trainer.train_step(state, batch)
            step += 1
            if step % log_interval == 0:
                ups = log_interval / max(time.time() - t0, 1e-9)
                logger.info("step %d | %s | ups %.2f", step,
                            " ".join(f"{k} {v:.4f}" for k, v in mets.items()),
                            ups)
                t0 = time.time()
            if step % save_interval == 0 or step >= max_update:
                ckpt.save(step, jax.device_get(state))
                logger.info("saved checkpoint at step %d", step)
            if step >= max_update:
                break
        itr.finish_epoch()
    ckpt.finalize()  # commit any in-flight async save before exit
    logger.info("vocoder training done at step %d", step)
    return 0


if __name__ == "__main__":
    sys.exit(main())
