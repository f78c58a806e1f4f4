#!/bin/bash
# Reference-scale synthetic CTC recipe (r3 verdict item 5, CTC half):
# the hi_xiaowen FSMN-CTC production dimensions on a 20k-utt
# token-sequence corpus with ~11 test filler hours, trained with the
# device-resident epoch mode.  Reuses the synthetic_ctc generator at
# scale.  Usage: ./run_ctc.sh [stage] [stop_stage]
set -eo pipefail

. ./path.sh

stage=${1:-0}
stop_stage=${2:-4}
config=conf/fsmn_ctc.yaml
data=data_ctc
dir=exp/fsmn_ctc
keyword=123
num_average=5
score_checkpoint=$dir/avg_${num_average}.ckpt

if [ ${stage} -le 0 ] && [ ${stop_stage} -ge 0 ]; then
  python ../synthetic_ctc/local/gen_data.py $data \
    --train 20000 --dev 2000 --test 33000 --seed 20260820
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
    --dict ./dict \
    --seed 888 \
    --cmvn_file $data/global_cmvn \
    --norm_var \
    --device_resident
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
    --keywords $keyword \
    --batch_size 256
  python -m wekws_tpu.bin.compute_det_ctc \
    --test_data $data/test.list \
    --keywords $keyword \
    --score_file $dir/score.txt \
    --stats_dir $dir \
    --figure_file $dir/det.png
fi

if [ ${stage} -le 4 ] && [ ${stop_stage} -ge 4 ]; then
  # serving SLOs on the trained model (r3 verdict item 6)
  python ../../tools/bench_serving_slo.py \
    --config $dir/config.yaml \
    --checkpoint $score_checkpoint \
    --tokens dict/dict.txt \
    --keyword $keyword \
    --threshold 0.1 | tee $dir/slo.json
fi
