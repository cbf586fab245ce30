#!/bin/bash
# Multi-job FastSMC (equivalent of cpp_example/FastSMC_example_multiple_jobs.sh):
# 4 independent jobs over the triangular pair tiling, then concatenate.
set -e
cd "$(dirname "$0")/.."
total_num_jobs=4

for ((i = 1; i <= total_num_jobs; i++)); do
  python -m fastsmc_tpu.cli fastsmc \
    --inFileRoot artifacts/panels/example_array/example \
    --outFileRoot /tmp/FastSMC_jobs \
    --decodingQuantFile artifacts/n300.array.decodingQuantities.npz \
    --mode array --time 50 --min_m 1.5 --noConditionalAgeEstimates \
    --jobs ${total_num_jobs} --jobInd "$i" --useKnownSeed
done

cat /tmp/FastSMC_jobs.*.${total_num_jobs}.FastSMC.ibd.gz > /tmp/FastSMC_jobs.all.ibd.gz
zcat /tmp/FastSMC_jobs.all.ibd.gz | wc -l
