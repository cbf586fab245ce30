#!/bin/bash
# Decoding-quantities generation (equivalent of reference prepare.sh)
set -e
cd "$(dirname "$0")/.."

python -m fastsmc_tpu.cli prepare \
  -D /root/reference/FILES/CEU.demo \
  -d /root/reference/FILES/DISC/30-100-2000.disc \
  -C /root/reference/FILES/DECODING_QUANTITIES/30-100-2000.csfs \
  -f /root/reference/FILES/EXAMPLE/exampleFile.n300.array \
  -n 300 -o /tmp/prepared
