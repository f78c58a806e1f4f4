#!/bin/bash
# Self-contained synthetic CTC recipe (the hi_xiaowen wake-sequence
# path: generation -> cmvn -> bucketed CTC train -> average ->
# score_ctc -> DET -> streaming detection sim).
# Usage: ./run.sh [stage] [stop_stage]
set -eo pipefail

. ./path.sh

stage=${1:-0}
stop_stage=${2:-4}
config=conf/fsmn_ctc.yaml
data=data
dir=exp/fsmn_ctc
keyword=123
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
    --dict ./dict \
    --seed 888 \
    --cmvn_file $data/global_cmvn \
    --norm_var
fi

if [ ${stage} -le 3 ] && [ ${stop_stage} -ge 3 ]; then
  python -m wekws_tpu.bin.average_model \
    --dst_model $score_checkpoint --src_path $dir \
    --num $num_average --val_best
  python -m wekws_tpu.bin.score_ctc \
    --config $dir/config.yaml \
    --test_data $data/test.list \
    --checkpoint $score_checkpoint \
    --score_file $dir/score.txt \
    --dict ./dict \
    --keywords $keyword
  python -m wekws_tpu.bin.compute_det_ctc \
    --test_data $data/test.list \
    --keywords $keyword \
    --score_file $dir/score.txt \
    --stats_dir $dir \
    --figure_file $dir/det.png
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  # frame-synchronous streaming detection simulation
  python -m wekws_tpu.bin.stream_score_ctc \
    --config $dir/config.yaml \
    --checkpoint $score_checkpoint \
    --test_data $data/test.list \
    --token_file dict/dict.txt \
    --keywords $keyword \
    --score_file $dir/stream_score.txt \
    --threshold 0.1
fi
