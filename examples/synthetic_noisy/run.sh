#!/bin/bash
# Noisy synthetic wake-word recipe: trains the SAME DS-TCN twice —
# with the full waveform-augmentation stack (speed perturb + blobstore
# noise + RIR reverb + spec_aug) and clean — and compares DET on a
# held-out NOISY test split.  No downloads; runs end to end on one
# chip.  Usage: ./run.sh [stage] [stop_stage]
set -eo pipefail

. ./path.sh

stage=${1:-0}
stop_stage=${2:-3}
data=data
num_average=5

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  python local/gen_data.py $data
fi

if [ ${stage} -le 1 ] && [ ${stop_stage} -ge 1 ]; then
  python -c "
from wekws_tpu.tools import compute_cmvn_stats
from wekws_tpu.tools.cmvn_stats import wav_paths_from_data_list
import yaml, itertools
conf = yaml.safe_load(open('conf/ds_tcn_aug.yaml'))['dataset_conf']
paths = itertools.islice(wav_paths_from_data_list('$data/train.list'), 200)
compute_cmvn_stats(paths, conf, '$data/global_cmvn')
"
fi

if [ ${stage} -le 2 ] && [ ${stop_stage} -ge 2 ]; then
  for config in conf/ds_tcn_aug.yaml conf/ds_tcn_clean.yaml; do
    dir=exp/$(basename "$config" .yaml)
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
      --norm_var
  done
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  for name in ds_tcn_aug ds_tcn_clean; do
    dir=exp/$name
    ckpt=$dir/avg_${num_average}.ckpt
    python -m wekws_tpu.bin.average_model \
      --dst_model $ckpt --src_path $dir \
      --num $num_average --val_best
    for split in test test_noisy; do
      python -m wekws_tpu.bin.score \
        --config $dir/config.yaml \
        --test_data $data/$split.list \
        --checkpoint $ckpt \
        --score_file $dir/score_$split.txt
      python -m wekws_tpu.bin.compute_det \
        --keyword 0 \
        --test_data $data/$split.list \
        --score_file $dir/score_$split.txt \
        --stats_file $dir/stats_$split.txt
    done
  done
  python local/report.py exp/ds_tcn_aug exp/ds_tcn_clean
fi
