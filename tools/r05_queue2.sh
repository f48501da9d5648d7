#!/bin/bash
# Round-5 queue, part 2. Part 1 (tools/r05_queue.sh) established:
#   - image control leg: latched, val 4.98 / test 5.01 (zero-reg + 150-ep
#     decay horizon — the r4 latch recipe)
#   - audio on bands does NOT latch under zero-reg at lr 3e-4 (train loss
#     0.85 = memorizing, val ~48 = no generalization, through ep108) —
#     the audio modality needs the REFERENCE recipe (constant 1e-4 +
#     dropout 0.5/0.1/0.1 + tf 0.2 = run_convergence defaults, the recipe
#     behind r4's runs/audio_bands 2.23/2.60).
# This part retrains the audio leg with the reference recipe, then runs
# the mixer grid and the rest of the round agenda.
set -x
cd /root/repo

GRID="--workdir runs/grid_r05 --train_n 1024 --eval_n 128 --n_measures 30 \
  --measures_range 2 30 --render_style grand --audio_style bands --epochs 60 \
  --schedule_epochs 150 --learning_rate 3e-4 --clip_norm 1.0 \
  --encoder_dropout 0 --decoder_dropout 0 --pos_dropout 0 \
  --teacher_forcing_prob 0 --check_val_every_n_epoch 5 --reuse_existing"

# A0: audio control, reference recipe, 300 epochs (audio steps ~5 s/epoch;
# val decode every 10 dominates wall)
python tools/run_grid.py --workdir runs/grid_r05 --train_n 1024 --eval_n 128 \
  --n_measures 30 --measures_range 2 30 --render_style grand --audio_style bands \
  --epochs 300 --learning_rate 1e-4 --clip_norm 0.0 \
  --encoder_dropout 0.5 --decoder_dropout 0.1 --pos_dropout 0.1 \
  --teacher_forcing_prob 0.2 --warmup_epochs 0 \
  --check_val_every_n_epoch 10 --legs audio --skip_fusion \
  --out reports/grid_r05_audio.json > /tmp/grid_A0.log 2>&1

# A1: fusion refresh with both controls (rewrites the phase-1 report)
python tools/run_grid.py $GRID --skip_training --legs image audio \
  --alphas 0.1 0.3 0.5 0.7 0.9 \
  --out reports/grid_r05_bands.json > /tmp/grid_A1.log 2>&1

# A: golden legs — warm-started gated-residual mixers
python tools/run_grid.py $GRID --legs attn_img attn_audio \
  --mixer_residual --warm_start_mixers --leg_suffix _warm_gres --skip_fusion \
  --out reports/grid_r05_warm_gres.json > /tmp/grid_A.log 2>&1

# B: concat from scratch
python tools/run_grid.py $GRID --legs concat --skip_fusion \
  --out reports/grid_r05_concat.json > /tmp/grid_B.log 2>&1

# C: tones audio-only for the deficit attack — reference recipe (the
# zero-reg tones leg memorizes the same way bands does)
python tools/run_grid.py --workdir runs/grid_r05_tones --train_n 1024 --eval_n 128 \
  --n_measures 30 --measures_range 2 30 --render_style grand --audio_style tones \
  --epochs 200 --learning_rate 1e-4 --clip_norm 0.0 \
  --encoder_dropout 0.5 --decoder_dropout 0.1 --pos_dropout 0.1 \
  --teacher_forcing_prob 0.2 --warmup_epochs 0 \
  --check_val_every_n_epoch 10 --reuse_existing --legs audio --skip_fusion \
  --out reports/grid_r05_tones_audio.json > /tmp/grid_C.log 2>&1

# C2: tones-audio deficit measurements (beam sweep + decomposition)
TONES_DATA="--ds_name synthetic --krn_encoding kern --use_distorted_images \
  --cache_root runs/grid_r05_tones/grandstaff_cache --batch_size 8 \
  --eval_batch_size 8 --num_workers 8 --input_modality audio \
  --checkpoint_path runs/grid_r05_tones/weights/audio/best"
TONES_CFG=$(python -c "import sys; sys.path.insert(0,'.'); from tools.run_convergence import synth_cfg; print(synth_cfg(1024,128,False,30,'grand',measures_range=[2,30],audio_style='tones'))")
for BEAM in 1 4 8; do
  python -m omr_a2s_multimodal_transformer_tpu.cli.test $TONES_DATA \
    --synthetic_config "$TONES_CFG" --beam_size $BEAM --length_penalty 0.0 \
    --run_dir runs/grid_r05_tones/runs/beam$BEAM \
    --save_preds reports/preds_tones_audio_beam$BEAM.jsonl \
    > /tmp/tones_beam$BEAM.log 2>&1
done
python tools/diagnose_audio_errors.py --workdir runs/grid_r05_tones \
  --ckpt runs/grid_r05_tones/weights/audio/best --split test \
  --out reports/diagnose_audio_errors_r05.json > /tmp/tones_diag.log 2>&1

# I: reference-scale ingest — 25,691 samples through the grain loader at
# production geometry, no device cache
ING_CFG=$(python -c "import sys; sys.path.insert(0,'.'); from tools.run_convergence import synth_cfg; print(synth_cfg(25691,128,False,30,'grand',measures_range=[2,30],audio_style='bands'))")
timeout 3600 python -m omr_a2s_multimodal_transformer_tpu.cli.train \
  --ds_name synthetic --synthetic_config "$ING_CFG" --krn_encoding kern \
  --use_distorted_images --cache_root runs/ingest_25k/grandstaff_cache \
  --eval_batch_size 8 --keep_cache \
  --input_modality image --attn_window 100 --batch_size 8 --num_workers 8 \
  --loader_backend grain --teacher_forcing_prob 0.2 --learning_rate 3e-4 \
  --warmup_steps 1600 --decay_steps 96000 --clip_norm 1.0 \
  --encoder_dropout 0.5 --decoder_dropout 0.1 --pos_dropout 0.1 \
  --epochs 2 --patience 1000000 --check_val_every_n_epoch 2 \
  --weights_dir runs/ingest_25k/weights --run_dir runs/ingest_25k/runs \
  --use_flash_cross > /tmp/ingest.log 2>&1

# D: warm plain mixers (restore the r4 warm-start artifact on bands)
python tools/run_grid.py $GRID --epochs 30 --legs concat attn_img \
  --warm_start_mixers --leg_suffix _warm --skip_fusion \
  --out reports/grid_r05_warm.json > /tmp/grid_D.log 2>&1

# Z: validate the edited bench.py end-to-end on the chip
timeout 2400 python bench.py > /tmp/bench_r05_check.log 2>&1

# F: small-geometry control closure (zero-reg + 150-ep horizon at the
# grid_resid_small geometry — does the r4 broken control latch now?)
python tools/run_grid.py --workdir runs/grid_r05_small --train_n 512 --eval_n 128 \
  --n_measures 10 --measures_range 1 4 --render_style grand --audio_style bands \
  --epochs 60 --schedule_epochs 150 --learning_rate 3e-4 --clip_norm 1.0 \
  --encoder_dropout 0 --decoder_dropout 0 --pos_dropout 0 --teacher_forcing_prob 0 \
  --check_val_every_n_epoch 5 --reuse_existing --legs image --skip_fusion \
  --out reports/grid_r05_small_control.json > /tmp/grid_F.log 2>&1

# E (best-effort): gated-residual from scratch
python tools/run_grid.py $GRID --legs attn_img \
  --mixer_residual --leg_suffix _gres --skip_fusion \
  --out reports/grid_r05_gres_scratch.json > /tmp/grid_E.log 2>&1

echo QUEUE2_DONE
