#!/bin/bash
# Full DDSP-Piano training recipe: alternating two-phase strategy
# (equivalent of the reference train_ddsp_piano.sh:8-52).
#
# Phase 1: everything except the tuning stack (7 epochs, lr 1e-3, batch 6)
# Phase 2: fine-tune detuner/inharmonicity only (3 epochs, lr 1e-5, batch 3)
# Phase 3: phase-1 modules again (10 epochs, lr 1e-3, batch 6)
#
# Usage: ./train_ddsp_piano.sh <maestro_path> <exp_dir> [config]
# Preemption-safe: relaunching the script resumes the interrupted
# phase from its last_iter checkpoint (--auto_resume beats the
# cross-phase --restore seed once a phase has its own progress).
set -e

MAESTRO_PATH=${1:?usage: train_ddsp_piano.sh <maestro_path> <exp_dir> [config]}
EXP_DIR=${2:?usage: train_ddsp_piano.sh <maestro_path> <exp_dir> [config]}
CONFIG=${3:-maestro_v2}
STEPS_PER_EPOCH=${STEPS_PER_EPOCH:-15904}

python train_single_phase.py \
    --config "$CONFIG" --phase 1 \
    --batch_size 6 --epochs 7 --lr 1e-3 \
    --steps_per_epoch "$STEPS_PER_EPOCH" \
    --auto_resume \
    "$MAESTRO_PATH" "$EXP_DIR"

python train_single_phase.py \
    --config "$CONFIG" --phase 2 \
    --batch_size 3 --epochs 3 --lr 1e-5 \
    --steps_per_epoch "$STEPS_PER_EPOCH" \
    --restore "$EXP_DIR/phase_1/last_iter" --auto_resume \
    "$MAESTRO_PATH" "$EXP_DIR"

python train_single_phase.py \
    --config "$CONFIG" --phase 3 \
    --batch_size 6 --epochs 10 --lr 1e-3 \
    --steps_per_epoch "$STEPS_PER_EPOCH" \
    --restore "$EXP_DIR/phase_2/last_iter" --auto_resume \
    "$MAESTRO_PATH" "$EXP_DIR"
