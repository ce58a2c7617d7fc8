#!/usr/bin/env bash
# Sweep RMA/RRA explanation scoring over pruning iterations (counterpart of
# /root/reference/run_explainations_evaluations.sh:3-7).
# Usage: run_explainations_evaluations.sh <model> <ckpt_dir> <voc_root> <out_dir> [first] [last]
set -euo pipefail
MODEL=${1:?model}; CKPTS=${2:?ckpt dir}; VOC=${3:?voc root}; OUT=${4:?out dir}
FIRST=${5:-0}; LAST=${6:-13}
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
  python -m vipers.cli.main explain-eval --model "$MODEL" \
    ${CKPT:+--checkpoint "$CKPT"} --voc-root "$VOC" \
    --iteration "$i" --output-dir "$OUT"
done
