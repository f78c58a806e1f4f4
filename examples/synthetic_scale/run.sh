#!/bin/bash
# Reference-scale synthetic wake-word recipe (r3 verdict item 5):
# 20k train utts / 10 test filler hours, flagship MDTC, trained with
# the device-resident epoch mode.  Statistically meaningful DET.
# Usage: ./run.sh [stage] [stop_stage] [config]
set -eo pipefail

. ./path.sh

stage=${1:-0}
stop_stage=${2:-4}
config=${3:-conf/mdtc.yaml}
data=data
dir=exp/$(basename "$config" .yaml)
num_average=5
score_checkpoint=$dir/avg_${num_average}.ckpt

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  python local/gen_data.py $data
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  python -c "
from wekws_tpu.tools import compute_cmvn_stats
from wekws_tpu.tools.cmvn_stats import wav_paths_from_data_list
import yaml, itertools
conf = yaml.safe_load(open('$config'))['dataset_conf']
paths = itertools.islice(wav_paths_from_data_list('$data/train.list'), 400)
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
    --num_keywords 1 \
    --min_duration 20 \
    --seed 666 \
    --cmvn_file $data/global_cmvn \
    --norm_var \
    --device_resident
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  python -m wekws_tpu.bin.average_model \
    --dst_model $score_checkpoint --src_path $dir \
    --num $num_average --val_best
  python -m wekws_tpu.bin.score \
    --config $dir/config.yaml \
    --test_data $data/test.list \
    --checkpoint $score_checkpoint \
    --score_file $dir/score.txt \
    --batch_size 256
  python -m wekws_tpu.bin.compute_det \
    --keyword 0 \
    --test_data $data/test.list \
    --score_file $dir/score.txt \
    --stats_file $dir/stats.0.txt
  echo "DET written to $dir/stats.0.txt"
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  python -m wekws_tpu.bin.export_model \
    --config $dir/config.yaml \
    --checkpoint $score_checkpoint \
    --output_dir $dir/export
fi
