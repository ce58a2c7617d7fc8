#!/usr/bin/env bash
# Box-visualization batch driver (counterpart of
# /root/reference/generate_boxes_lost.py:3-21): fixed image list x pruning
# iterations, rendering predicted boxes.
# Usage: generate_boxes_lost.sh <model> <ckpt_dir> <data_path> <out_dir> [last_iter]
set -euo pipefail
MODEL=${1:?model}; CKPTS=${2:?ckpt dir}; DATA=${3:?data}; OUT=${4:?out}; LAST=${5:-13}
for ((i=0; i<=LAST; i++)); do
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
    --dataset VOC12 --set trainval --data-path "$DATA" \
    ${CKPT:+--checkpoint "$CKPT"} --iteration "$i" \
    --visualize pred --output-dir "$OUT/iter_${NN}"
done
