#!/bin/bash
# Tones-4k retry at a gentler LR (3e-4 + 4x steps/epoch collapsed to the
# unigram basin at ep15-25 despite clip 1.0), then the queue-6 tail.
set -x
cd /root/repo
python tools/run_grid.py --workdir runs/grid_r05_tones4k --train_n 4096 --eval_n 128 \
  --n_measures 30 --measures_range 2 30 --render_style grand --audio_style tones \
  --epochs 60 --schedule_epochs 150 --learning_rate 1.5e-4 --clip_norm 1.0 \
  --encoder_dropout 0 --decoder_dropout 0 --pos_dropout 0 --teacher_forcing_prob 0 \
  --check_val_every_n_epoch 5 --legs audio --skip_fusion \
  --out reports/grid_r05_tones_audio.json > /tmp/grid_C.log 2>&1
bash tools/r05_queue6.sh
