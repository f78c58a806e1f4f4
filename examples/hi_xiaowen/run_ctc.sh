#!/bin/bash
# Hi Xiaowen / Nihao Wenwen, CTC path (customizable wake word).
# Mirrors the reference run_fsmn_ctc.sh staging.
# Usage: ./run_ctc.sh <stage> <stop_stage> [--config conf/fsmn_ctc.yaml]
set -eo pipefail

stage=${1:-0}
stop_stage=${2:-4}
config=conf/fsmn_ctc.yaml
dir=exp/fsmn_ctc
num_average=30
score_checkpoint=$dir/avg_${num_average}.ckpt
keywords="嗨小问,你好问问"
download_dir=./data/local

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

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  echo "Stage 2: train (CTC)"
  mkdir -p $dir
  python -m wekws_tpu.bin.train \
    --config $config \
    --train_data data/train/data.list \
    --cv_data data/dev/data.list \
    --model_dir $dir \
    --seed 666 \
    --dict ./dict \
    --cmvn_file data/train/global_cmvn \
    --norm_var
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
