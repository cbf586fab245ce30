#!/bin/bash
# All-pairs ASMC posterior sums (equivalent of reference decode.sh)
set -e
cd "$(dirname "$0")/.."

python -m fastsmc_tpu.cli asmc \
  --inFileRoot /root/reference/FILES/EXAMPLE/exampleFile.n300.array \
  --decodingQuantFile artifacts/n300.array.decodingQuantities.npz \
  --outFileRoot /tmp/asmc_out \
  --posteriorSums --majorMinorPosteriorSums --useKnownSeed
