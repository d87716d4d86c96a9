#!/bin/bash
# HuBERT base masked-unit pretraining. Parity with the reference recipe
# (fairseq examples/hubert/config/pretrain/hubert_base_librispeech.yaml):
# 12L/768d encoder, mask_prob 0.8 span 10, adam 5e-4 poly-decay 32k warmup,
# 400k updates, loss_weights [10] on features_pen. Expects a wav2vec-style
# manifest ($DATA_DIR/{train,dev}.tsv) and k-means labels + dict in
# $LABEL_DIR ({train,dev}.km, dict.km.txt) — produce them with
# scripts/prepare.sh (mHuBERT feature dump + k-means fit/predict).
set -euo pipefail

data_dir=${DATA_DIR:?}
label_dir=${LABEL_DIR:-$data_dir}
out=${EXP_DIR:-exp}/ckpt/hubert_base_pretrain

python -m diffnorm_tpu.cli.train $data_dir \
  --task hubert_pretraining --labels km --label-dir $label_dir \
  --label-rate 50 --sample-rate 16000 \
  --max-sample-size 250000 --min-sample-size 32000 \
  --arch hubert --criterion hubert \
  --mask-prob 0.80 --mask-length 10 \
  --dropout 0.1 --attention-dropout 0.1 --encoder-layerdrop 0.05 \
  --feature-grad-mult 0.1 --loss-weights "[10]" \
  --train-subset train --valid-subset dev \
  --save-dir $out \
  --keep-best-checkpoints 5 --best-checkpoint-metric loss \
  --lr 5e-4 --lr-scheduler polynomial_decay --warmup-updates 32000 \
  --total-num-update 400000 --adam-betas "(0.9,0.98)" --adam-eps 1e-6 \
  --weight-decay 0.01 --clip-norm 10.0 \
  --max-update 400000 --batch-size 8 \
  --seed 42 --prng-impl rbg --log-interval 100 --dtype bfloat16
