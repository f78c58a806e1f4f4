#!/bin/bash
# Google Speech Commands v1 (12-class) recipe.
# Usage: ./run.sh [--flag value ...] <stage> <stop_stage>
set -eo pipefail

. ./path.sh

stage=-1
stop_stage=3
config=conf/mdtc.yaml
num_average=10
download_dir=./data/local
# Speech Commands v1 archive (same source as the reference recipe,
# /root/reference/examples/speechcommand_v1/s0/run.sh stage -1)
data_url=http://download.tensorflow.org/data/speech_commands_v0.01.tar.gz

# Kaldi convention: leading --flag value pairs override the defaults
# above; positional <stage> <stop_stage> follow the flags.
. ../../tools/parse_options.sh
stage=${1:-$stage}
stop_stage=${2:-$stop_stage}
dir=exp/$(basename $config .yaml)
score_checkpoint=$dir/avg_${num_average}.ckpt

if [ ${stage} -le -1 ] && [ ${stop_stage} -ge -1 ]; then
  echo "Stage -1: download and extract Google Speech Commands v1"
  mkdir -p $download_dir
  archive=$download_dir/$(basename $data_url)
  if [ ! -f $download_dir/.extracted ]; then
    if [ ! -f $archive ]; then
      wget -O $archive $data_url || curl -L -o $archive $data_url
    fi
    tar -xzf $archive -C $download_dir
    touch $download_dir/.extracted
  fi
fi

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "Stage 0: prepare speech commands lists (12-class)"
  python local/prepare_data.py $download_dir data
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  echo "Stage 1: CMVN + data.list"
  python -c "
from wekws_tpu.tools import compute_cmvn_stats
from wekws_tpu.tools.cmvn_stats import wav_paths_from_scp
import yaml
conf = yaml.safe_load(open('$config'))['dataset_conf']
compute_cmvn_stats(wav_paths_from_scp('data/train/wav.scp'), conf,
                   'data/train/global_cmvn')
"
  for x in train valid test; do
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
    --cv_data data/valid/data.list \
    --model_dir $dir \
    --num_keywords 12 \
    --seed 777 \
    --cmvn_file data/train/global_cmvn \
    --norm_var
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: average + accuracy"
  python -m wekws_tpu.bin.average_model \
    --dst_model $score_checkpoint --src_path $dir \
    --num $num_average --val_best
  python -m wekws_tpu.bin.compute_accuracy \
    --config $dir/config.yaml \
    --test_data data/test/data.list \
    --checkpoint $score_checkpoint
fi
