#!/bin/bash
# Speech VAE training. Parity with reference scripts/vae/train.sh:
# lr 5e-4, inverse_sqrt warmup 10k, 200k updates, max-tokens 15k, clip 2.0.
set -euo pipefail

lang=${LANG_CODE:-fr}
data_dir=${DATA_DIR:?}/$lang-en/en2${lang}/orig_unit
feat_dir=${DATA_DIR}/$lang-en/${lang}/feat
latent_dim=${1:-128}
out=${EXP_DIR:-exp}/ckpt/speech_vae_decoder_${latent_dim}/en2${lang}

python -m diffnorm_tpu.cli.train $data_dir \
  --tgt-feat-dir $feat_dir \
  --task speech_decoder --target-code-size 1000 \
  --criterion speech_vae_decoder_loss \
  --arch speech_vae_decoder --latent-dim $latent_dim \
  --dropout 0.1 \
  --train-subset train --valid-subset dev \
  --save-dir $out \
  --keep-best-checkpoints 5 --best-checkpoint-metric loss --keep-last-epochs 5 \
  --lr 5e-4 --lr-scheduler inverse_sqrt --warmup-init-lr 1e-7 --warmup-updates 10000 \
  --adam-betas "(0.9,0.98)" --clip-norm 2.0 \
  --max-update 200000 --max-tokens 15000 --max-target-positions 2048 \
  --seed 42 --prng-impl rbg --log-interval 50 --dtype bfloat16
