#!/bin/bash
# Round-5 serialized TPU job queue (one chip): runs after the phase-1
# image+audio bands legs finish. Order = expected value per TPU-minute:
#   A. warm-started GATED-RESIDUAL attention mixers (the round's designed
#      early-fusion fix: init == the trained unimodal query-modality system)
#   B. concat mixer from scratch on bands (the reference mixer that trains)
#   C. tones audio-only retrain (300 ep) for the VERDICT #3 deficit attack
#   D. warm-started PLAIN mixers (restores the r4 warm-start artifact, #4)
#   E. gated-residual attn_img from scratch (does gating alone fix the latch?)
set -x
cd /root/repo

# 0: user-surface verify (train -> test -> transcribe on the tiny synthetic
# corpus, .claude/skills/verify recipe) on the TPU — the CPU variant hangs
# under host contention; the chip is free right now between queue jobs.
(
  W=/tmp/verify_ws; rm -rf $W; mkdir -p $W
  SYN='{"n":6,"img_height_range":[32,33],"img_width_range":[64,96],"audio_seconds_range":[0.3,0.5],"n_measures":1}'
  timeout 900 python -m omr_a2s_multimodal_transformer_tpu.cli.train \
    --ds_name synthetic --krn_encoding kern --synthetic --synthetic_config "$SYN" \
    --cache_root $W/cache --batch_size 3 --num_workers 1 \
    --input_modality image --epochs 2 --check_val_every_n_epoch 1 \
    --weights_dir $W/weights --run_dir $W/run --no_bf16 && \
  timeout 600 python -m omr_a2s_multimodal_transformer_tpu.cli.test \
    --ds_name synthetic --krn_encoding kern --synthetic --synthetic_config "$SYN" \
    --cache_root $W/cache --batch_size 3 --num_workers 1 \
    --input_modality image --checkpoint_path $W/weights/best --run_dir $W/t --no_bf16 \
    --save_preds $W/preds.jsonl && \
  python - <<'PYEOF' && \
import os
import sys; sys.path.insert(0, ".")
from omr_a2s_multimodal_transformer_tpu.data import sources
src = sources.SyntheticSource(n=4, seed=3, n_measures=1, encoding="kern",
                              img_height_range=(32, 33), img_width_range=(64, 96))
os.makedirs("/tmp/verify_ws/imgs", exist_ok=True)
for i in range(4):
    src[i]["image"].save(f"/tmp/verify_ws/imgs/s{i}.png")
print("imgs exported")
PYEOF
  timeout 600 python -m omr_a2s_multimodal_transformer_tpu.cli.transcribe \
    --checkpoint_path $W/weights/best --vocab_path $W/cache/vocabs/ar_w2i_kern.json \
    --inputs "$W/imgs/*.png" --out_dir $W/out --batch_size 2 && \
  python tools/diagnose_seq_errors.py --preds $W/preds.jsonl --out /tmp/verify_diag.json && \
  echo VERIFY_OK
) > /tmp/verify_tpu.log 2>&1

GRID="--workdir runs/grid_r05 --train_n 1024 --eval_n 128 --n_measures 30 \
  --measures_range 2 30 --render_style grand --audio_style bands --epochs 60 \
  --learning_rate 3e-4 --clip_norm 1.0 --check_val_every_n_epoch 5 --reuse_existing"

# A: golden legs
python tools/run_grid.py $GRID --legs attn_img attn_audio \
  --mixer_residual --warm_start_mixers --leg_suffix _warm_gres --skip_fusion \
  --out reports/grid_r05_warm_gres.json > /tmp/grid_A.log 2>&1

# B: concat from scratch
python tools/run_grid.py $GRID --legs concat --skip_fusion \
  --out reports/grid_r05_concat.json > /tmp/grid_B.log 2>&1

# C: tones audio-only, 300 epochs (deficit attack needs this checkpoint)
python tools/run_grid.py --workdir runs/grid_r05_tones --train_n 1024 --eval_n 128 \
  --n_measures 30 --measures_range 2 30 --render_style grand --audio_style tones \
  --epochs 300 --learning_rate 3e-4 --clip_norm 1.0 --check_val_every_n_epoch 10 \
  --reuse_existing --legs audio --skip_fusion \
  --out reports/grid_r05_tones_audio.json > /tmp/grid_C.log 2>&1

# D: warm plain mixers (r4 claimed concat_warm 7.23 / attn warm ~355 on tones;
# artifact was lost — re-measure on the bands corpus)
python tools/run_grid.py $GRID --legs concat attn_img \
  --warm_start_mixers --leg_suffix _warm --skip_fusion \
  --out reports/grid_r05_warm.json > /tmp/grid_D.log 2>&1

# E: gated-residual from scratch
python tools/run_grid.py $GRID --legs attn_img \
  --mixer_residual --leg_suffix _gres --skip_fusion \
  --out reports/grid_r05_gres_scratch.json > /tmp/grid_E.log 2>&1

echo QUEUE_DONE
