#!/bin/bash
# Latent diffusion training over the frozen VAE. Parity with reference
# scripts/diffusion/train.sh: lr 1e-4, 2M updates, max-tokens 12k, T=200.
set -euo pipefail

lang=${LANG_CODE:-fr}
data_dir=${DATA_DIR:?}/$lang-en/en2${lang}/orig_unit
feat_dir=${DATA_DIR}/$lang-en/${lang}/feat
latent_dim=${1:-128}
vae_ckpt=${VAE_CKPT:?path to the trained speech_vae_decoder checkpoint step dir}
out=${EXP_DIR:-exp}/ckpt/diff-norm-vae-${latent_dim}-multitask/en2${lang}

python -m diffnorm_tpu.cli.train $data_dir \
  --speech-decoder-ckpt $vae_ckpt \
  --tgt-feat-dir $feat_dir \
  --task speech_diffusion_discrete --target-code-size 1000 \
  --criterion ddpm_discrete_loss \
  --arch diff_discrete --latent-dim $latent_dim --multitask true \
  --dropout 0.1 \
  --train-subset train --valid-subset dev \
  --save-dir $out \
  --keep-best-checkpoints 5 --best-checkpoint-metric loss --keep-last-epochs 5 \
  --lr 1e-4 --lr-scheduler inverse_sqrt --warmup-init-lr 1e-7 --warmup-updates 10000 \
  --adam-betas "(0.9,0.98)" --clip-norm 2.0 \
  --max-update 2000000 --max-tokens 12000 --max-target-positions 2048 \
  --validate-interval 5 --save-interval 5 \
  --seed 42 --prng-impl rbg --log-interval 50 --dtype bfloat16
