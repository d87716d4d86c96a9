#!/bin/bash
# The complete DiffNorm CVSS recipe, end to end (the per-stage scripts in
# this directory, chained): prepare -> VAE -> latent diffusion ->
# DDIM-normalize units -> NAR S2UT on normalized manifests -> vocoder
# fine-tune -> eval (decode -> waveforms -> ASR-BLEU). Reference:
# scripts/{prepare,vae,diffusion,s2ut}/*.sh run in this order.
#
# tests/test_pipeline_e2e.py runs this exact 8-stage shape on synthetic
# data under pytest; this script is the real-data driver.
set -euo pipefail

here=$(dirname "$0")

: "${RAW_AUDIO_DIR:?dir of source/target wavs}"
: "${DATA_DIR:?working data dir (manifests + features land here)}"
: "${CKPT_ROOT:?checkpoint root}"

# 1. mHuBERT features + k-means units + manifests
bash "$here/prepare.sh"

# 2. speech VAE over reduced-unit features
VAE_SAVE_DIR="$CKPT_ROOT/vae" bash "$here/vae_train.sh"

# 3. latent diffusion over the frozen VAE
VAE_CKPT=$(ls -d "$CKPT_ROOT"/vae/step_* | sort | tail -1) \
  DIFF_SAVE_DIR="$CKPT_ROOT/diffusion" bash "$here/diffusion_train.sh"

# 4. DDIM normalization -> rewritten {split}.tsv unit manifests
DIFF_CKPT=$(ls -d "$CKPT_ROOT"/diffusion/step_* | sort | tail -1) \
  NORM_DIR="$DATA_DIR/normalized" bash "$here/unit_gen.sh"

# 5. NAR S2UT translator on the normalized units
S2UT_DATA_DIR="$DATA_DIR/normalized" \
  S2UT_SAVE_DIR="$CKPT_ROOT/nar" bash "$here/s2ut_train.sh"

# 6. code-HiFi-GAN vocoder fine-tune (duration predictor trains from
#    run-length labels whenever the config declares one)
python -m diffnorm_tpu.cli.train_vocoder \
  --units-file "$DATA_DIR/train.units" --audio-dir "$RAW_AUDIO_DIR" \
  --vocoder-cfg "${VOCODER_CFG:?config.json}" \
  --save-dir "$CKPT_ROOT/vocoder" \
  --max-update "${VOCODER_UPDATES:-500000}" --batch-size 32 --crop-units 28

# 7+8. decode -> waveforms -> ASR-BLEU
NAR_CKPT=$(ls -d "$CKPT_ROOT"/nar/step_* | sort | tail -1) \
  VOCODER_CKPT=$(ls -d "$CKPT_ROOT"/vocoder/step_* | sort | tail -1) \
  VOCODER_CFG="$VOCODER_CFG" \
  S2UT_DATA_DIR="$DATA_DIR/normalized" bash "$here/s2ut_eval.sh"
