#!/bin/bash
# Full released-asset parity evaluation: the day the reference's released
# checkpoints are available, this one command reproduces the DiffNorm
# CVSS ASR-BLEU pipeline end to end (reference README.md:214-218 asset
# table + scripts/s2ut/eval.sh + examples/speech_to_speech/asr_bleu):
#
#   1. convert every torch asset (strict key-inventory audit fails loud on
#      released-checkpoint quirks the converters don't know)
#   2. mHuBERT-L11 feature dump + K=1000 k-means units of the TARGET speech
#   3. DiffNorm DDIM normalization of the reference units (optional stage)
#   4. NAR S2UT decode (mask-predict, 15 iters, optional CG cond-scale)
#   5. unit BLEU of the decoded streams vs the (normalized) references
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
#   TGT_AUDIO_MANIFEST  wav2vec-style manifest (root line + rel\tn_samples)
#                  of the eval split's TARGET speech (feature dump input)
#   REF_TRANSCRIPTS reference text for ASR-BLEU
# Optional:
#   LANG_CODE (fr) COND_SCALE (1.0) RESULTS_DIR (results) NORMALIZE (1)
#   START_STEP (50) CODE_SIZE (1000) ITERS (15) BATCH (16)
#   CPU_FLAG (--cpu to force the CPU backend; default uses the TPU)
#   MODEL_FLAGS (extra size flags for non-released-scale stand-in assets —
#   the synthetic-asset rehearsal in tests/test_parity_eval_script.py)
#   ASR_MODEL (HF model name/path override for the ASR-BLEU stage)
set -euo pipefail

lang=${LANG_CODE:-fr}
assets=${ASSETS_DIR:?released checkpoint directory}
data_dir=${S2UT_DATA_DIR:?}
tgt_audio_manifest=${TGT_AUDIO_MANIFEST:?target-speech audio manifest}
results=${RESULTS_DIR:-results}/parity_en2${lang}
cond_scale=${COND_SCALE:-1.0}
start_step=${START_STEP:-50}
code_size=${CODE_SIZE:-1000}
iters=${ITERS:-15}
batch=${BATCH:-16}
cpu=${CPU_FLAG:-}
model_flags=${MODEL_FLAGS:-}
km_bin=${KM_BIN:-$assets/mhubert_base_vp_en_es_fr_it3_L11_km1000.bin}
ck=$results/converted
mkdir -p $results

# ---- 1. convert (strict inventory audit on every asset) -------------------
[ -d $ck/hubert ] || python -m diffnorm_tpu.cli.convert_checkpoint \
  --type hubert --input $assets/mhubert_base_vp_en_es_fr_it3.pt \
  --output $ck/hubert
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
[ -f $results/feats/test.manifest.tsv ] || python -m diffnorm_tpu.cli.prepare \
  $cpu dump-features --manifest $tgt_audio_manifest --hubert-ckpt $ck/hubert \
  --layer 11 --split test --out-dir $results/feats
[ -f $results/units/test.unit ] || { mkdir -p $results/units && \
  python -m diffnorm_tpu.cli.prepare $cpu quantize \
  --feat-dir $results/feats --split test \
  --kmeans $km_bin --out $results/units/test.unit; }

# ---- 3. DiffNorm normalization of the target units (NORMALIZE=1) ----------
# Joins the quantized units with the dumped features into the translation
# manifest diff_norm_synthesis consumes, then rewrites the units through
# the partial-noise DDIM chain.
if [ "${NORMALIZE:-1}" = "1" ] && [ ! -f $results/norm/test.tsv ]; then
  python - "$results/units/test.unit" "$results/norm_in/test.tsv" <<'PYEOF'
import os, sys
units_file, out_tsv = sys.argv[1], sys.argv[2]
os.makedirs(os.path.dirname(out_tsv), exist_ok=True)
from diffnorm_tpu.data.manifest import write_translation_manifest
rows = []
for line in open(units_file):
    line = line.strip()
    if not line:
        continue
    uid, units = line.split("|", 1)
    n = len(units.split())
    rows.append({"id": uid, "src_audio": "none", "src_n_frames": 0,
                 "tgt_audio": units, "tgt_n_frames": n})
write_translation_manifest(out_tsv, rows)
PYEOF
  python -m diffnorm_tpu.cli.diff_norm_synthesis \
    --data $results/norm_in --ckpt $ck/diffusion \
    --tgt-feat-dir $results/feats \
    --splits test --start-step $start_step --batch-size 100 \
    --output-dir $results/norm $cpu $model_flags
fi

# ---- 4+6. fused decode -> waveforms (one process, one program) ------------
[ -f $results/wav/s2st-test.unit ] || python -m diffnorm_tpu.cli.s2st $data_dir \
  --task speech_to_speech_fasttranslate --target-code-size $code_size \
  --arch nar_s2ut_conformer --path $ck/nar \
  --gen-subset test --batch-size $batch \
  --iter-decode-max-iter $iters --cond-scale $cond_scale \
  --vocoder $ck/vocoder --vocoder-cfg $assets/config.json \
  --dur-prediction --results-path $results/wav $cpu $model_flags

# ---- 5. unit BLEU of the decoded streams vs the (normalized) references ---
# The decoded streams are REDUCED unit sequences (the NAR trains on
# reduced/normalized targets, research/TranSpeech dataset + unit_bleu.py
# scores generate T- lines = reduced targets), so the raw quantized
# references are reduced before scoring; the normalization manifests are
# already reduced (diff_norm_synthesis re-reduce semantics).
if [ "${NORMALIZE:-1}" = "1" ]; then
  python -m diffnorm_tpu.eval.unit_bleu $results/wav/s2st-test.unit \
    $results/norm/test.tsv | tee $results/unit_bleu.txt
else
  python - "$results/units/test.unit" "$results/units/test.reduced.unit" <<'PYEOF'
import sys
from diffnorm_tpu.ops.unit_reduce import reduce_units
src, dst = sys.argv[1], sys.argv[2]
with open(src) as f, open(dst, "w") as out:
    for line in f:
        line = line.strip()
        if not line or "|" not in line:
            continue
        uid, units = line.split("|", 1)
        red, _, _ = reduce_units([int(u) for u in units.split()])
        out.write(uid + "|" + " ".join(str(int(u)) for u in red) + "\n")
PYEOF
  python -m diffnorm_tpu.eval.unit_bleu $results/wav/s2st-test.unit \
    $results/units/test.reduced.unit | tee $results/unit_bleu.txt
fi

# ---- 7. ASR-BLEU (per-language HF wav2vec2 ASR + sacrebleu) ---------------
# Waveforms are named {utt_id}_pred.wav; plain-text REF_TRANSCRIPTS (one
# line per utterance, decode-manifest order) are joined to them by id via
# the manifest's id column (id-keyed `utt_id\ttext` REF_TRANSCRIPTS need
# no ids file). Never pair positionally against a directory listing.
tail -n +2 $data_dir/test.tsv | cut -f1 > $results/utt_ids.txt
python -m diffnorm_tpu.eval.asr_bleu \
  --audio-dir $results/wav --reference-path ${REF_TRANSCRIPTS:?} \
  --ids-file $results/utt_ids.txt \
  --lang $lang ${ASR_MODEL:+--asr-model $ASR_MODEL} \
  --transcripts-path $results/asr_transcripts.txt | tee $results/asr_bleu.json

echo "parity_eval done -> $results/asr_bleu.json"
