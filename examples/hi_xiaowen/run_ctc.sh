#!/bin/bash
# Hi Xiaowen / Nihao Wenwen, CTC path (customizable wake word).
# Mirrors the reference run_fsmn_ctc.sh / run_ctc.sh staging.
# Usage: ./run_ctc.sh [--flag value ...] <stage> <stop_stage>
#   e.g. ./run_ctc.sh --config conf/ds_tcn_ctc.yaml 0 5
#        ./run_ctc.sh --trainbase true 0 5   # ASR-base pretrain first
set -eo pipefail

. ./path.sh

stage=0
stop_stage=4
config=conf/fsmn_ctc.yaml
num_average=30
keywords="嗨小问,你好问问"
download_dir=./data/local
# Optional base pretraining on general ASR data before the wake-word
# fine-tune (reference run_ctc.sh stage 1, trainbase=true): put
# KALDI-format wav.scp + text (token-level transcripts) under
# $trainbase_dir/{train,dev}.  Fine-tuning then starts from the base
# model's final checkpoint (and, matching the reference's resume
# semantics, continues the epoch count from the base schedule — the
# fine-tune config's max_epoch must exceed the base config's).
trainbase=false
trainbase_dir=data/asr_base
trainbase_config=conf/ds_tcn_ctc_base.yaml
trainbase_exp=exp/ctc_base

# Kaldi convention: leading --flag value pairs override the defaults
# above; positional <stage> <stop_stage> follow the flags.
. ../../tools/parse_options.sh
stage=${1:-$stage}
stop_stage=${2:-$stop_stage}
dir=exp/$(basename $config .yaml)
score_checkpoint=$dir/avg_${num_average}.ckpt

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "Stage 0: prepare CTC dict (token per char + <blank>/<filler>)"
  mkdir -p dict data
  python local/prepare_ctc_dict.py \
    $download_dir/mobvoi_hotword_dataset_resources dict
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: CMVN + data.list (text transcripts)"
  python -c "
from wekws_tpu.tools import compute_cmvn_stats
from wekws_tpu.tools.cmvn_stats import wav_paths_from_scp
import yaml
conf = yaml.safe_load(open('$config'))['dataset_conf']
compute_cmvn_stats(wav_paths_from_scp('data/train/wav.scp'), conf,
                   'data/train/global_cmvn')
"
  for x in train dev test; do
    python -c "
from wekws_tpu.tools import make_list, wav_durations
wav_durations([l.strip().split(maxsplit=1) for l in open('data/$x/wav.scp')],
              'data/$x/wav.dur')
make_list('data/$x/wav.scp', 'data/$x/text', 'data/$x/wav.dur',
          'data/$x/data.list')
"
  done
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ] && [ "$trainbase" = true ]; then
  echo "Stage 1b: base CTC pretraining on ASR data ($trainbase_dir)"
  for x in train dev; do
    if [ ! -f $trainbase_dir/$x/wav.scp ] || [ ! -f $trainbase_dir/$x/text ]; then
      echo "trainbase=true needs KALDI-format wav.scp + text under $trainbase_dir/$x" >&2
      exit 1
    fi
    python -c "
from wekws_tpu.tools import make_list, wav_durations
wav_durations([l.strip().split(maxsplit=1)
               for l in open('$trainbase_dir/$x/wav.scp')],
              '$trainbase_dir/$x/wav.dur')
make_list('$trainbase_dir/$x/wav.scp', '$trainbase_dir/$x/text',
          '$trainbase_dir/$x/wav.dur', '$trainbase_dir/$x/data.list')
"
  done
  mkdir -p $trainbase_exp
  python -m wekws_tpu.bin.train \
    --config $trainbase_config \
    --train_data $trainbase_dir/train/data.list \
    --cv_data $trainbase_dir/dev/data.list \
    --model_dir $trainbase_exp \
    --seed 666 \
    --dict ./dict \
    --cmvn_file data/train/global_cmvn \
    --norm_var
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: train (CTC)"
  mkdir -p $dir
  checkpoint_opt=
  if [ "$trainbase" = true ]; then
    echo "fine-tuning from base model $trainbase_exp/final.ckpt"
    checkpoint_opt="--checkpoint $trainbase_exp/final.ckpt"
  fi
  python -m wekws_tpu.bin.train \
    --config $config \
    --train_data data/train/data.list \
    --cv_data data/dev/data.list \
    --model_dir $dir \
    --seed 666 \
    --dict ./dict \
    --cmvn_file data/train/global_cmvn \
    --norm_var \
    $checkpoint_opt
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: average + offline CTC score + DET"
  python -m wekws_tpu.bin.average_model \
    --dst_model $score_checkpoint --src_path $dir \
    --num $num_average --val_best
  result_dir=$dir/test_$(basename $score_checkpoint)
  mkdir -p $result_dir
  python -m wekws_tpu.bin.score_ctc \
    --config $dir/config.yaml \
    --test_data data/test/data.list \
    --checkpoint $score_checkpoint \
    --score_file $result_dir/score.txt \
    --dict ./dict \
    --keywords "$keywords"
  python -m wekws_tpu.bin.compute_det_ctc \
    --test_data data/test/data.list \
    --keywords "$keywords" \
    --score_file $result_dir/score.txt
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  echo "Stage 4: streaming-simulation CTC score + DET"
  result_dir=$dir/stream_$(basename $score_checkpoint)
  mkdir -p $result_dir
  python -m wekws_tpu.bin.stream_score_ctc \
    --config $dir/config.yaml \
    --test_data data/test/data.list \
    --checkpoint $score_checkpoint \
    --token_file dict/dict.txt \
    --lexicon_file dict/words.txt \
    --keywords "$keywords" \
    --score_file $result_dir/score.txt
  python -m wekws_tpu.bin.compute_det_ctc \
    --test_data data/test/data.list \
    --keywords "$keywords" \
    --score_file $result_dir/score.txt
fi

if [ ${stage} -le 5 ] && [ ${stop_stage} -ge 5 ]; then
  echo "Stage 5: export graph artifact + calibrated int8 quantization"
  # reference run_ctc.sh stage 4 (export_jit/export_onnx) analog
  python -m wekws_tpu.bin.export_model \
    --config $dir/config.yaml \
    --checkpoint $score_checkpoint \
    --output_dir $dir/export
  python -m wekws_tpu.bin.static_quantize \
    --model_dir $dir/export \
    --output_dir $dir/export_int8 \
    --calib_data data/dev/data.list
fi
