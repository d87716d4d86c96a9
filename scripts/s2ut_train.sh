#!/bin/bash
# NAR CMLM S2UT training on (normalized) units. Parity with reference
# scripts/s2ut/train.sh: conformer arch, label smoothing 0.2, lr 5e-4,
# 400k updates, max-tokens 40k, clip 10.
set -euo pipefail

lang=${LANG_CODE:-fr}
start_step=${1:-50}
data_dir=${S2UT_DATA_DIR:?dir with {split}.tsv unit manifests + config.yaml}
out=${EXP_DIR:-exp}/ckpt/nar_dist_${start_step}/en2${lang}

python -m diffnorm_tpu.cli.train $data_dir \
  --config-yaml config.yaml \
  --cg-prob ${CG_PROB:-0.0} \
  --task speech_to_speech_fasttranslate --target-code-size 1000 \
  --criterion nar_speech_to_unit --label-smoothing 0.2 \
  --arch nar_s2ut_conformer \
  --dropout 0.1 \
  --train-subset train --valid-subset dev \
  --save-dir $out \
  --keep-best-checkpoints 5 --best-checkpoint-metric loss --keep-last-epochs 5 \
  --lr 5e-4 --lr-scheduler inverse_sqrt --warmup-init-lr 1e-7 --warmup-updates 10000 \
  --adam-betas "(0.9,0.98)" --clip-norm 10.0 \
  --max-update 400000 --max-tokens 40000 --max-target-positions 1024 \
  --seed 42 --prng-impl rbg --validate-interval 5 --save-interval 5 --dtype bfloat16
