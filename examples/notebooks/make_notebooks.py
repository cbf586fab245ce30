"""Generate the example notebooks (equivalents of the reference's
notebooks/{asmc-api-test,fastsmc-minimal,fastsmc}.ipynb) against the
fastsmc_tpu compat surface.

Run:  /opt/venv/bin/python examples/notebooks/make_notebooks.py [--execute]
"""

import os
import sys

import nbformat as nbf

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(os.path.dirname(HERE))

HEADER = """\
import os, sys
sys.path.insert(0, os.path.abspath(os.path.join(os.getcwd(), '..', '..')))
import jax
jax.config.update('jax_platforms', 'cpu')  # drop for TPU runs\
"""


def nb(cells):
    book = nbf.v4.new_notebook()
    out = []
    for kind, src in cells:
        if kind == "md":
            out.append(nbf.v4.new_markdown_cell(src))
        else:
            out.append(nbf.v4.new_code_cell(src))
    book["cells"] = out
    return book


ASMC_API = nb([
    ("md", "# ASMC python API tour\n"
           "TPU-native equivalent of the reference "
           "`notebooks/asmc-api-test.ipynb`: targeted pair decoding through "
           "the drop-in `asmc`-compatible surface."),
    ("code", HEADER),
    ("code", """\
import itertools
import time
import numpy as np

# Drop-in replacement for `from asmc import *`
import fastsmc_tpu.compat as asmc
from fastsmc_tpu import preparedecoding"""),
    ("md", "Create the ASMC object from the input files root and the "
           "decoding quantities file."),
    ("code", """\
input_files_root = '../../artifacts/panels/example_array/example'
decoding_quantities_file = '../../artifacts/example.decodingQuantities.npz'

a = asmc.ASMC(input_files_root, decoding_quantities_file)"""),
    ("md", "Decode specific pairs; flags choose what gets computed."),
    ("code", """\
all_combos = list(itertools.combinations(range(40), 2))
pa = [x[0] for x in all_combos]
pb = [x[1] for x in all_combos]

print(f'Decoding {len(pa)} pairs')
ts = time.time()
a.decodePairs(pa, pb, per_pair_posteriors=True, sum_of_posteriors=True,
              per_pair_posterior_means=True, per_pair_MAPs=True)
print(f'{time.time() - ts:.2f} s')"""),
    ("code", "return_vals = a.get_copy_of_results()\n"
             "return_vals_ref = a.get_ref_of_results()"),
    ("md", "`per_pair_indices` — each row is `[iInd, iHap, jInd, jHap]`."),
    ("code", "return_vals.per_pair_indices[:5]"),
    ("md", "`per_pair_posteriors` — numPairs arrays of "
           "(numStates x numSites)."),
    ("code", "print(len(return_vals.per_pair_posteriors), "
             "return_vals.per_pair_posteriors[0].shape)"),
    ("md", "`sum_of_posteriors` — one (numStates x numSites) matrix."),
    ("code", "return_vals.sum_of_posteriors.shape"),
    ("md", "Posterior means with column-wise min / argmin."),
    ("code", """\
print(return_vals.per_pair_posterior_means.shape)
print(return_vals.min_posterior_means[:8])
print(return_vals.argmin_posterior_means[:8])"""),
    ("md", "MAPs with column-wise min / argmin."),
    ("code", """\
print(return_vals.per_pair_MAPs.shape)
print(return_vals.min_MAPs[:8])
print(return_vals.argmin_MAPs[:8])"""),
    ("md", "Decoding by string id (`FAMID_IID#hap`) works too."),
    ("code", """\
a.decodePairs(['1_1#1', '1_2#1'], ['1_10#2', '1_20#1'],
              per_pair_posterior_means=True)
a.get_ref_of_results().per_pair_posterior_means.shape"""),
])


FASTSMC_MINIMAL = nb([
    ("md", "# FastSMC, minimal\n"
           "Equivalent of the reference `notebooks/fastsmc-minimal.ipynb`: "
           "run the full two-stage pipeline with defaults, then look at the "
           "detected IBD segments."),
    ("code", HEADER),
    ("code", "import fastsmc_tpu.compat as asmc"),
    ("code", """\
input_files_root = '../../artifacts/panels/example_array/example'
output_files_root = '/tmp/nb_output_minimal'"""),
    ("code", """\
fast_smc = asmc.FastSMC(in_dir=input_files_root, out_dir=output_files_root)
fast_smc.run()"""),
    ("md", "Per-job output lands at `<out>.<jobInd>.<jobs>.FastSMC.ibd.gz` "
           "with the reference column layout."),
    ("code", """\
import numpy as np
import pandas as pd
import matplotlib.pyplot as plt

data = pd.read_csv(output_files_root + '.1.1.FastSMC.ibd.gz', sep='\\t',
                   header=None)
data.columns = ['ind1_famid', 'ind1_id', 'ind1_hap', 'ind2_famid',
                'ind2_id', 'ind2_hap', 'chromosome', 'ibd_start', 'ibd_end',
                'length_in_cM', 'ibd_score', 'post_est', 'map_est']

filtered = data[data['ibd_score'] > 0.1]
filtered.head()"""),
    ("code", """\
plt.xlabel('MAP age estimate (in generations)')
filtered['map_est'].hist(range=(0, 100))
plt.gca().set_yscale('linear')"""),
    ("code", """\
plt.xlabel('IBD segments length (in cM)')
filtered['length_in_cM'].hist(range=(0, 15))
plt.gca().set_yscale('log')"""),
])


FASTSMC_FULL = nb([
    ("md", "# FastSMC, full configuration\n"
           "Equivalent of the reference `notebooks/fastsmc.ipynb`: explicit "
           "`DecodingParams`, binary output, and the `BinaryDataReader`."),
    ("code", HEADER),
    ("code", "import fastsmc_tpu.compat as asmc\n"
             "from fastsmc_tpu.compat import DecodingMode"),
    ("code", """\
input_files_root = '../../artifacts/panels/example_array/example'
decoding_quantities_file = '../../artifacts/example.decodingQuantities.npz'
output_files_root = '/tmp/nb_output_full'"""),
    ("code", """\
params = asmc.DecodingParams()
params.decodingQuantFile = decoding_quantities_file
params.inFileRoot = input_files_root
params.outFileRoot = output_files_root
params.decodingModeString = 'array'
params.decodingMode = DecodingMode.arrayFolded
params.foldData = True
params.usingCSFS = True
params.batchSize = 32
params.recallThreshold = 3
params.min_m = 1.5
params.hashing = True
params.FastSMC = True
params.BIN_OUT = True
params.outputIbdSegmentLength = True
params.time = 50
params.noConditionalAgeEstimates = True
params.doPerPairMAP = True
params.doPerPairPosteriorMean = True

assert params.validateParamsFastSMC()"""),
    ("code", """\
fast_smc = asmc.FastSMC(params)
fast_smc.run()"""),
    ("md", "Read the `.bibd.gz` binary records back with "
           "`BinaryDataReader`."),
    ("code", """\
import math
import numpy as np
import matplotlib.pyplot as plt

vals_MAP = np.linspace(0, 100, num=10)
bins_MAP = np.zeros((10,), dtype=int)
vals_segLen = np.linspace(0., 15., num=10)
bins_segLen = np.zeros((10,), dtype=int)

reader = asmc.BinaryDataReader(
    output_files_root + '.1.1.FastSMC.bibd.gz')
while reader.moreLinesInFile():
    line = reader.getNextLine()
    if line.ibdScore > 0.1:
        if line.mapEst < 100.:
            bins_MAP[math.floor(line.mapEst / 10.)] += 1
        if line.lengthInCentimorgans < 15.:
            bins_segLen[math.floor(line.lengthInCentimorgans / 1.5)] += 1"""),
    ("code", """\
plt.xlabel('MAP age estimate (in generations)')
plt.hist(vals_MAP, weights=bins_MAP)
plt.gca().set_yscale('linear')
plt.grid(visible=True, which='major', axis='both')"""),
    ("code", """\
plt.xlabel('IBD segments length (in cM)')
plt.hist(vals_segLen, weights=bins_segLen)
plt.gca().set_yscale('log')
plt.grid(visible=True, which='major', axis='both')"""),
])


BOOKS = {
    "asmc-api-test.ipynb": ASMC_API,
    "fastsmc-minimal.ipynb": FASTSMC_MINIMAL,
    "fastsmc.ipynb": FASTSMC_FULL,
}


def main():
    execute = "--execute" in sys.argv
    for name, book in BOOKS.items():
        path = os.path.join(HERE, name)
        if execute:
            from nbclient import NotebookClient
            client = NotebookClient(book, timeout=1200,
                                    resources={"metadata": {"path": HERE}})
            client.execute()
        nbf.write(book, path)
        print("wrote", path)


if __name__ == "__main__":
    main()
