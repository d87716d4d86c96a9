#!/bin/bash
# NAR S2UT eval: mask-predict decode (15 iters) -> unit files ->
# code-HiFi-GAN waveforms -> ASR-BLEU. Parity with reference
# scripts/s2ut/eval.sh + eval_cg.sh (cond-scale for classifier-free
# guidance) + examples/speech_to_speech/generate_waveform_from_code.py.
set -euo pipefail

lang=${LANG_CODE:-fr}
data_dir=${S2UT_DATA_DIR:?}
ckpt=${NAR_CKPT:?path to NAR checkpoint step dir}
vocoder=${VOCODER_CKPT:?code-hifigan checkpoint}
vocoder_cfg=${VOCODER_CFG:?code-hifigan config.json}
results=${RESULTS_DIR:-results}/en2${lang}
cond_scale=${COND_SCALE:-1.0}

python -m diffnorm_tpu.cli.generate $data_dir \
  --task speech_to_speech_fasttranslate --target-code-size 1000 \
  --arch nar_s2ut_conformer --path $ckpt \
  --gen-subset test --max-tokens 20000 \
  --iter-decode-max-iter 15 --cond-scale $cond_scale \
  --results-path $results

python -m diffnorm_tpu.eval.unit_bleu $results/generate-test.txt $results

python -m diffnorm_tpu.cli.generate_waveform \
  --in-code-file $results/hyp.unit \
  --vocoder $vocoder --vocoder-cfg $vocoder_cfg \
  --results-path $results/wav --dur-prediction

python -m diffnorm_tpu.eval.asr_bleu \
  --audio-dir $results/wav --reference-path ${REF_TRANSCRIPTS:?} --lang en
