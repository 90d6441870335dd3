#!/bin/bash
# Fetch the public artifacts the reference pipeline trains/infers from
# (reference scripts/download_checkpoints.sh, download_fma_large.sh,
# download_fma_metadata.sh). Requires network access; this build environment
# has none — run wherever you stage data, then point the CLIs at the files.
set -e

DEST=${1:-./checkpoints}
DATA=${2:-./data}

case "${3:-all}" in
  clap|all)
    mkdir -p "$DEST"
    # LAION CLAP music checkpoint (used by create_clap_quantized)
    wget -c -P "$DEST" \
      'https://huggingface.co/lukewys/laion_clap/resolve/main/music_speech_audioset_epoch_15_esc_89.98.pt'
    ;;&
  mert|all)
    mkdir -p "$DEST/mert-v0"
    wget -c -P "$DEST/mert-v0" \
      'https://huggingface.co/m-a-p/MERT-v0/resolve/main/pytorch_model.bin' \
      'https://huggingface.co/m-a-p/MERT-v0/resolve/main/config.json'
    ;;&
  encodec|all)
    mkdir -p "$DEST"
    wget -c -P "$DEST" \
      'https://dl.fbaipublicfiles.com/encodec/v0/encodec_24khz-d7cc33bc.th'
    ;;&
  roberta|all)
    mkdir -p "$DEST/roberta-base"
    wget -c -P "$DEST/roberta-base" \
      'https://huggingface.co/roberta-base/resolve/main/vocab.json' \
      'https://huggingface.co/roberta-base/resolve/main/merges.txt' \
      'https://huggingface.co/roberta-base/resolve/main/pytorch_model.bin'
    ;;&
  fma_metadata|all)
    mkdir -p "$DATA"
    wget -c -P "$DATA" 'https://os.unil.cloud.switch.ch/fma/fma_metadata.zip'
    unzip -n "$DATA/fma_metadata.zip" -d "$DATA"
    ;;&
  fma_large)
    mkdir -p "$DATA"
    wget -c -P "$DATA" 'https://os.unil.cloud.switch.ch/fma/fma_large.zip'
    unzip -n "$DATA/fma_large.zip" -d "$DATA"
    ;;
esac
echo "done"
