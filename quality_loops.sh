#!/bin/bash
# The full in-repo quality-loop recipe, one variant per block — the exact
# commands behind the committed gate/ anchors and PERF.md quality tables.
# Each composite follows the reference's training protocol (flow
# pretraining -> 3-phase composite schedule; ref: train.py:27-269 +
# DCEIFlow README recipe) on the in-repo simulated dataset, then exports
# a standing gate anchor. Serial on one chip; ~40-80 min per composite.
#
#   ./quality_loops.sh eiflow|eraft|idnet|ft|gates
#
# The `ft` block reproduces the SERVING fine-tunes (PERF.md round 5):
# depth-D serving flagships fine-tuned from the depth-5 epoch-40
# checkpoint — 12 rec-only epochs (flow frozen; the alternating phase's
# 'both' loss pulls flow off GT) + 4 pure supervised-flow epochs
# (phase-1 loss) to repair the EPE drift from the changed rec input.
set -e
cd "$(dirname "$0")"

FLOW_EPOCHS=16   # raft recipe (AdamW+OneCycle+clip): held-out EPE 0.888
                 # at 16 epochs; plain Adam stalls at the zero-flow
                 # baseline (see sim_flow_quality.py --opt/--aug help)
COMP="--n_videos 32 --epochs 40 --flow_epoch 8 --rec_epoch 16 --remat"

case "${1:-all}" in
eiflow|all)
  python sim_flow_quality.py --workdir /tmp/r4flow --opt raft \
    --epochs $FLOW_EPOCHS
  python sim_quality.py --workdir /tmp/r4simq --model_mode cista-eiflow \
    $COMP --path_to_flownet /tmp/r4flow/models/dceiflow_sim_$FLOW_EPOCHS.pth.tar
  ;;&
eraft|all)
  python sim_flow_quality.py --workdir /tmp/r4flowE --flow_arch eraft \
    --opt raft --epochs $FLOW_EPOCHS
  python sim_quality.py --workdir /tmp/r4simq_eraft --model_mode cista-eraft \
    $COMP --path_to_flownet /tmp/r4flowE/models/eraft_sim_$FLOW_EPOCHS.pth.tar
  ;;&
idnet|all)
  # IDNet trains its flow arm inside phase 1 of the composite schedule
  # (no separate pretraining stage in the reference recipe either)
  python sim_quality.py --workdir /tmp/r4simq_idnet --model_mode cista-idnet \
    $COMP
  ;;&
ft|all)
  # serving-efficient depth fine-tunes (the committed *_ft2/ft3 anchors):
  # mm:depth:src-workdir:anchor-stem:extra-gate-args
  for spec in \
    cista-eiflow:3:/tmp/r4simq:flagship_ft3:--flow_iters=2 \
    cista-eiflow:2:/tmp/r4simq:flagship_ft2:--flow_iters=2 \
    cista-idnet:2:/tmp/r5_idnet:idnet_ft2: \
    cista-eraft:2:/tmp/r4simq_eraft:eraft_ft2:--flow_iters=3; do
    IFS=: read -r mm D src stem extra <<< "$spec"
    wd=/tmp/r5ft_${mm#cista-}_d$D
    name="${mm}_b5_d${D}_c64"
    srcname="${mm}_b5_d5_c64"
    mkdir -p "$wd/models/$name"
    cp -n "$src/models/$srcname/${srcname}_40.pth.tar" \
      "$wd/models/$name/${name}_40.pth.tar"
    ln -sfn "$src/train" "$wd/train"
    ln -sfn "$src/eval" "$wd/eval"
    python sim_quality.py --workdir "$wd" --model_mode "$mm" \
      --n_videos 32 --epochs 52 --flow_epoch 0 --rec_epoch 52 --remat \
      --depth "$D" --load_epoch_for_train 40
    python sim_quality.py --workdir "$wd" --model_mode "$mm" \
      --n_videos 32 --epochs 56 --flow_epoch 56 --rec_epoch 0 --remat \
      --depth "$D" --load_epoch_for_train 52
    python gate_export.py \
      --ckpt "$wd/models/$name/${name}_56.pth.tar" \
      --model_mode "$mm" --stem "$stem" --depth "$D" ${extra:+$extra} \
      --workdir "/tmp/gate_eval_$stem" --gate_dir gate --cpu
  done
  ;;&
gates|all)
  # export whatever trained checkpoints exist into committed gate anchors
  for mm in cista-eiflow:/tmp/r4simq cista-eraft:/tmp/r4simq_eraft \
            cista-idnet:/tmp/r4simq_idnet; do
    mode="${mm%%:*}"; wd="${mm#*:}"
    ckpt=$(ls "$wd"/models/*/*_40.pth.tar 2>/dev/null | head -1) || true
    if [ -n "$ckpt" ]; then
      python gate_export.py --ckpt "$ckpt" \
        --model_mode "$mode" --workdir /tmp/gate_eval_"$mode" \
        --gate_dir gate --cpu
    fi
  done
  ;;
esac
