#!/bin/bash
# Self-contained synthetic command-classification recipe (the Speech
# Commands CE path: generation -> cmvn -> train -> average ->
# accuracy).  Usage: ./run.sh [stage] [stop_stage] [config]
set -eo pipefail

. ./path.sh

stage=${1:-0}
stop_stage=${2:-3}
config=${3:-conf/mdtc_ce.yaml}
data=data
dir=exp/$(basename "$config" .yaml)
num_classes=8
num_average=5
score_checkpoint=$dir/avg_${num_average}.ckpt

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  python local/gen_data.py $data --classes $num_classes
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  python -c "
from wekws_tpu.tools import compute_cmvn_stats
from wekws_tpu.tools.cmvn_stats import wav_paths_from_data_list
import yaml, itertools
conf = yaml.safe_load(open('$config'))['dataset_conf']
paths = itertools.islice(wav_paths_from_data_list('$data/train.list'), 200)
compute_cmvn_stats(paths, conf, '$data/global_cmvn')
"
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  mkdir -p $dir
  python -m wekws_tpu.bin.train \
    --config $config \
    --train_data $data/train.list \
    --cv_data $data/dev.list \
    --model_dir $dir \
    --num_keywords $num_classes \
    --seed 777 \
    --cmvn_file $data/global_cmvn \
    --norm_var
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  python -m wekws_tpu.bin.average_model \
    --dst_model $score_checkpoint --src_path $dir \
    --num $num_average --val_best
  python -m wekws_tpu.bin.compute_accuracy \
    --config $dir/config.yaml \
    --test_data $data/test.list \
    --checkpoint $score_checkpoint
fi
