#!/bin/bash
# Full released-asset parity evaluation: the day the reference's released
# checkpoints are available, this one command reproduces the DiffNorm
# CVSS ASR-BLEU pipeline end to end (reference README.md:214-218 asset
# table + scripts/s2ut/eval.sh + examples/speech_to_speech/asr_bleu):
#
#   1. convert every torch asset (strict key-inventory audit fails loud on
#      released-checkpoint quirks the converters don't know)
#   2. mHuBERT-L11 feature dump + K=1000 k-means units for the eval split
#   3. DiffNorm DDIM normalization of the reference units (optional stage)
#   4. NAR S2UT decode (mask-predict, 15 iters, optional CG cond-scale)
#   5. unit BLEU vs the normalized references
#   6. code-HiFi-GAN waveform synthesis (fused one-process cli.s2st path)
#   7. ASR-BLEU: per-language HF wav2vec2 ASR transcription + sacrebleu
#
# Required env:
#   ASSETS_DIR     released torch checkpoints:
#                    mhubert_base_vp_en_es_fr_it3.pt
#                    mhubert_base_vp_en_es_fr_it3_L11_km1000.bin
#                    speech_vae.pt  diff_discrete.pt  nar_s2ut_<lang>.pt
#                    g_00500000 (+ config.json)
#   S2UT_DATA_DIR  CVSS-C eval manifests (test.tsv + config.yaml)
#   REF_TRANSCRIPTS reference text for ASR-BLEU
# Optional:
#   LANG_CODE (fr) COND_SCALE (1.0) RESULTS_DIR (results) NORMALIZE (1)
set -euo pipefail

lang=${LANG_CODE:-fr}
assets=${ASSETS_DIR:?released checkpoint directory}
data_dir=${S2UT_DATA_DIR:?}
results=${RESULTS_DIR:-results}/parity_en2${lang}
cond_scale=${COND_SCALE:-1.0}
ck=$results/converted
mkdir -p $results

# ---- 1. convert (strict inventory audit on every asset) -------------------
[ -d $ck/hubert ] || python -m diffnorm_tpu.cli.convert_checkpoint \
  --type hubert --input $assets/mhubert_base_vp_en_es_fr_it3.pt \
  --hubert-layers 12 --output $ck/hubert
[ -d $ck/vae ] || python -m diffnorm_tpu.cli.convert_checkpoint \
  --type vae --input $assets/speech_vae.pt --output $ck/vae
[ -d $ck/diffusion ] || python -m diffnorm_tpu.cli.convert_checkpoint \
  --type diffusion --input $assets/diff_discrete.pt --output $ck/diffusion
[ -d $ck/nar ] || python -m diffnorm_tpu.cli.convert_checkpoint \
  --type nar --input $assets/nar_s2ut_${lang}.pt --output $ck/nar
[ -d $ck/vocoder ] || python -m diffnorm_tpu.cli.convert_checkpoint \
  --type hifigan --input $assets/g_00500000 \
  --vocoder-cfg $assets/config.json --output $ck/vocoder

# ---- 2. feature dump + k-means units (target-side references) -------------
[ -d $results/feats ] || python -m diffnorm_tpu.cli.prepare \
  dump-features --manifest $data_dir/test.tsv --hubert-ckpt $ck/hubert \
  --layer 11 --split test --out-dir $results/feats
[ -f $results/units/test.unit ] || python -m diffnorm_tpu.cli.prepare \
  quantize --feat-dir $results/feats --split test \
  --kmeans $assets/mhubert_base_vp_en_es_fr_it3_L11_km1000.bin \
  --out $results/units/test.unit

# ---- 3. DiffNorm normalization of the target features (NORMALIZE=1) -------
if [ "${NORMALIZE:-1}" = "1" ] && [ ! -d $results/norm ]; then
  python -m diffnorm_tpu.cli.diff_norm_synthesis \
    --data $results/feats --ckpt $ck/diffusion \
    --splits test --start-step 50 --batch-size 100 \
    --output-dir $results/norm
fi

# ---- 4-6. fused decode -> waveforms (one process, one program) ------------
python -m diffnorm_tpu.cli.s2st $data_dir \
  --task speech_to_speech_fasttranslate --target-code-size 1000 \
  --arch nar_s2ut_conformer --path $ck/nar \
  --gen-subset test --batch-size 16 \
  --iter-decode-max-iter 15 --cond-scale $cond_scale \
  --vocoder $ck/vocoder --vocoder-cfg $assets/config.json \
  --dur-prediction --results-path $results/wav

# unit BLEU of the decoded streams vs the (normalized) references
python -m diffnorm_tpu.eval.unit_bleu $results/wav/s2st-test.unit \
  ${NORMALIZE:+$results/norm/test.unit} || true

# ---- 7. ASR-BLEU (per-language HF wav2vec2 ASR + sacrebleu) ---------------
python -m diffnorm_tpu.eval.asr_bleu \
  --audio-dir $results/wav --reference-path ${REF_TRANSCRIPTS:?} \
  --lang $lang --transcripts-path $results/asr_transcripts.txt | tee $results/asr_bleu.json

echo "parity_eval done -> $results/asr_bleu.json"
