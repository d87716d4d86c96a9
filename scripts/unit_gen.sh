#!/bin/bash
# Diffusion normalization: rewrite unit manifests with DDIM-normalized units.
# Parity with reference scripts/diffusion/unit_gen.sh (start_step 50 of 200).
set -euo pipefail

lang=${LANG_CODE:-fr}
start_step=${1:-50}
data_dir=${DATA_DIR:?}/$lang-en/en2${lang}/orig_unit
feat_dir=${DATA_DIR}/$lang-en/${lang}/feat
diff_ckpt=${DIFF_CKPT:?path to the trained diffusion checkpoint step dir}
out_dir=${DATA_DIR}/$lang-en/en2${lang}/diff_unit_vae_${start_step}

python -m diffnorm_tpu.cli.diff_norm_synthesis $data_dir \
  --ckpt $diff_ckpt --tgt-feat-dir $feat_dir \
  --latent-dim ${LATENT_DIM:-128} \
  --output-dir $out_dir --start-step $start_step --batch-size 100
