#!/bin/sh
# End-to-end pipeline via the CLI, mirroring the reference's
# `aindex compute-aindex` workflow.
set -e
PREFIX=${1:-/tmp/aindex_demo/p23}
mkdir -p "$(dirname "$PREFIX")"

python -m aindex_tpu.cli compute-aindex \
    -i tests/data/test_R1.fastq,tests/data/test_R2.fastq \
    -t fastq -o "$PREFIX" -k 23 --keep-dat

python -m aindex_tpu.cli info -p "$PREFIX" --stats
