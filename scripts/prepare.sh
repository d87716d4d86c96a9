#!/bin/bash
# Preprocessing: mHuBERT feature dump + K=1000 k-means quantization.
# Capability parity with reference scripts/prepare/{feature_dump.sh,quantize_unit.sh}.
set -euo pipefail

lang=${LANG_CODE:-fr}
data_dir=${DATA_DIR:?set DATA_DIR to the CVSS data root}
hubert_ckpt=${HUBERT_CKPT:?set HUBERT_CKPT to the mHuBERT .pt checkpoint}
feat_dir=$data_dir/$lang/feat

for split in train dev test; do
  python -m diffnorm_tpu.cli.prepare dump-features \
    --manifest $data_dir/$lang/$split.tsv \
    --hubert-ckpt $hubert_ckpt --layer 11 \
    --out-dir $feat_dir --split $split
done

# K=1000 codebook on train features (or reuse the released mhubert km)
if [ -z "${KMEANS_MODEL:-}" ]; then
  python -m diffnorm_tpu.cli.prepare learn-kmeans \
    --feat-dir $feat_dir --split train --num-clusters 1000 \
    --out $data_dir/$lang/km1000.npy
  KMEANS_MODEL=$data_dir/$lang/km1000.npy
fi

for split in train dev test; do
  python -m diffnorm_tpu.cli.prepare quantize \
    --feat-dir $feat_dir --split $split --kmeans $KMEANS_MODEL \
    --out $data_dir/$lang/$split.units
done
