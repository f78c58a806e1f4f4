#!/bin/bash
# Hi Xiaowen / Nihao Wenwen (mobvoi_hotword) recipe, max-pooling path.
# Staged like the reference (examples/hi_xiaowen/s0/run.sh).
# Usage: ./run.sh [--flag value ...] <stage> <stop_stage>
#   e.g. ./run.sh --config conf/mdtc.yaml 0 3
set -eo pipefail

. ./path.sh

stage=-1
stop_stage=3
num_keywords=2
config=conf/ds_tcn.yaml
num_average=30
download_dir=./data/local
window_shift=50
# mobvoi_hotword_dataset (openslr-87 mirror, same source as reference
# examples/hi_xiaowen/s0/run.sh stage -1)
data_url=https://www.openslr.org/resources/87

# Kaldi convention: leading --flag value pairs override the defaults
# above; positional <stage> <stop_stage> follow the flags.
. ../../tools/parse_options.sh
stage=${1:-$stage}
stop_stage=${2:-$stop_stage}
dir=exp/$(basename $config .yaml)
score_checkpoint=$dir/avg_${num_average}.ckpt

if [ ${stage} -le -1 ] && [ ${stop_stage} -ge -1 ]; then
  echo "Stage -1: download mobvoi_hotword_dataset"
  mkdir -p $download_dir
  if [ ! -f $download_dir/.extracted ]; then
    for f in mobvoi_hotword_dataset.tgz mobvoi_hotword_dataset_resources.tgz; do
      [ -f $download_dir/$f ] || \
        wget -O $download_dir/$f $data_url/$f || \
        curl -L -o $download_dir/$f $data_url/$f
      tar -xzf $download_dir/$f -C $download_dir
    done
    touch $download_dir/.extracted
  fi
fi

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  echo "Stage 0: prepare dict + datasets"
  mkdir -p dict
  printf '<FILLER> -1\n<HI_XIAOWEN> 0\n<NIHAO_WENWEN> 1\n' > dict/dict.txt
  awk '{print $1}' dict/dict.txt > dict/words.txt
  for folder in train dev test; do
    mkdir -p data/$folder
    python local/prepare_data.py \
      $download_dir/mobvoi_hotword_dataset \
      $download_dir/mobvoi_hotword_dataset_resources \
      dict/dict.txt $folder data/$folder
  done
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
    --num_keywords $num_keywords \
    --min_duration 50 \
    --seed 666 \
    --cmvn_file data/train/global_cmvn \
    --norm_var
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  echo "Stage 3: average, score, DET"
  python -m wekws_tpu.bin.average_model \
    --dst_model $score_checkpoint --src_path $dir \
    --num $num_average --val_best
  result_dir=$dir/test_$(basename $score_checkpoint)
  mkdir -p $result_dir
  python -m wekws_tpu.bin.score \
    --config $dir/config.yaml \
    --test_data data/test/data.list \
    --checkpoint $score_checkpoint \
    --score_file $result_dir/score.txt \
    --dict ./dict
  for keyword in $(tail -n +2 dict/words.txt); do
    python -m wekws_tpu.bin.compute_det \
      --keyword $keyword \
      --test_data data/test/data.list \
      --window_shift $window_shift \
      --score_file $result_dir/score.txt \
      --stats_file $result_dir/stats.${keyword}.txt
  done
  python -m wekws_tpu.bin.plot_det_curve \
    --keywords_dict dict/words.txt \
    --stats_dir $result_dir \
    --figure_file $result_dir/det.png
fi
