#!/bin/bash
# Hey Snips wake-word recipe (TPU-native).  Staged like the reference
# (examples/hey_snips/s0/run.sh): data prep -> cmvn -> train -> average
# -> score -> DET.
# Usage: ./run.sh [--flag value ...] <stage> <stop_stage>
#   e.g. ./run.sh --config conf/mdtc_small.yaml 0 4
set -eo pipefail

. ./path.sh

stage=0
stop_stage=4
config=conf/ds_tcn.yaml
download_dir=./data/local
num_average=30

# Kaldi convention: leading --flag value pairs override the defaults
# above; positional <stage> <stop_stage> follow the flags.
. ../../tools/parse_options.sh
stage=${1:-$stage}
stop_stage=${2:-$stop_stage}
dir=exp/$(basename $config .yaml)
score_checkpoint=$dir/avg_${num_average}.ckpt

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "Stage 0: prepare hey_snips data lists"
  # expects the Snips dataset json layout under $download_dir
  python local/prepare_data.py $download_dir data
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: compute CMVN and build data.list"
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
  echo "Stage 2: train"
  mkdir -p $dir
  python -m wekws_tpu.bin.train \
    --config $config \
    --train_data data/train/data.list \
    --cv_data data/dev/data.list \
    --model_dir $dir \
    --num_keywords 1 \
    --min_duration 50 \
    --seed 666 \
    --cmvn_file data/train/global_cmvn \
    --norm_var
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: average + score + DET"
  python -m wekws_tpu.bin.average_model \
    --dst_model $score_checkpoint --src_path $dir \
    --num $num_average --val_best
  result_dir=$dir/test_$(basename $score_checkpoint)
  mkdir -p $result_dir
  python -m wekws_tpu.bin.score \
    --config $dir/config.yaml \
    --test_data data/test/data.list \
    --checkpoint $score_checkpoint \
    --score_file $result_dir/score.txt
  python -m wekws_tpu.bin.compute_det \
    --keyword 0 \
    --test_data data/test/data.list \
    --score_file $result_dir/score.txt \
    --stats_file $result_dir/stats.0.txt
fi
