#!/usr/bin/env bash
# Sweep LOST + CorLoc over pruning iterations (counterpart of
# /root/reference/run_lost_pruning_iterations.sh:4-19, driving our CLI).
# Usage: run_lost_pruning_iterations.sh <model> <ckpt_dir> <data_path> <out_dir> [first] [last]
set -euo pipefail
MODEL=${1:?model}; CKPTS=${2:?ckpt dir}; DATA=${3:?data path}; OUT=${4:?out dir}
FIRST=${5:-0}; LAST=${6:-13}
for SET in trainval val; do
  for ((i=FIRST; i<=LAST; i++)); do
    NN=$(printf "%02d" "$i")
    # our flat layout, then the reference's {model}/ subdir layout
    CKPT=$(ls -d "$CKPTS"/${MODEL}_epoch_*_pruning_iteration_${NN} \
                 "$CKPTS/$MODEL"/*_epoch_*_pruning_iteration_${NN}* \
                 2>/dev/null | sort -V | tail -1 || true)
    if [[ -z "$CKPT" ]]; then
      echo "ERROR: no checkpoint for iteration ${NN} under $CKPTS" >&2
      echo "(set VIPERS_ALLOW_RANDOM=1 to run untrained weights)" >&2
      [[ "${VIPERS_ALLOW_RANDOM:-0}" == "1" ]] || exit 1
    fi
    python -m vipers.cli.main lost --model "$MODEL" --arch vit \
      --dataset VOC07 --set "$SET" --data-path "$DATA" \
      ${CKPT:+--checkpoint "$CKPT"} --iteration "$i" \
      --output-dir "$OUT/${SET}"
  done
done
