#!/bin/bash
# FastSMC two-stage IBD detection on the example panel
# (equivalent of reference cpp_example/FastSMC_example.sh)
set -e
cd "$(dirname "$0")/.."

python -m fastsmc_tpu.cli fastsmc \
  --inFileRoot artifacts/panels/example_array/example \
  --outFileRoot /tmp/FastSMC_output_example \
  --decodingQuantFile artifacts/n300.array.decodingQuantities.npz \
  --mode array \
  --time 50 \
  --min_m 1.5 \
  --noConditionalAgeEstimates \
  --useKnownSeed

zcat /tmp/FastSMC_output_example.1.1.FastSMC.ibd.gz | head
