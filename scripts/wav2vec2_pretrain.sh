#!/bin/bash
# wav2vec 2.0 base contrastive pretraining. Parity with the reference
# recipe (examples/wav2vec/config/pretraining/wav2vec2_base_librispeech.yaml):
# quantize_targets, infonce + loss_weights [0.1, 10], adam 5e-4 poly-decay
# 32k warmup, 400k updates. Expects a wav2vec-style manifest
# ($DATA_DIR/{train,dev}.tsv) — no labels needed.
set -euo pipefail

data_dir=${DATA_DIR:?}
out=${EXP_DIR:-exp}/ckpt/wav2vec2_base_pretrain

python -m diffnorm_tpu.cli.train $data_dir \
  --task audio_pretraining \
  --max-sample-size 250000 --min-sample-size 32000 \
  --arch wav2vec2 --criterion wav2vec \
  --final-dim 256 --latent-vars 320 --latent-groups 2 \
  --latent-temp "(2,0.5,0.999995)" --num-negatives 100 \
  --mask-prob 0.65 --mask-length 10 \
  --dropout 0.1 --attention-dropout 0.1 --dropout-input 0.1 \
  --dropout-features 0.1 --encoder-layerdrop 0.05 \
  --feature-grad-mult 0.1 --loss-weights "[0.1,10]" \
  --train-subset train --valid-subset dev \
  --save-dir $out \
  --keep-best-checkpoints 5 --best-checkpoint-metric loss \
  --lr 5e-4 --lr-scheduler polynomial_decay --warmup-updates 32000 \
  --total-num-update 400000 --adam-betas "(0.9,0.98)" --adam-eps 1e-6 \
  --weight-decay 0.01 --clip-norm 25.0 \
  --max-update 400000 --batch-size 8 \
  --seed 42 --prng-impl rbg --log-interval 100 --dtype bfloat16
