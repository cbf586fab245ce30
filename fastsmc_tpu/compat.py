"""Drop-in compatibility surface for the reference ``asmc`` Python module.

The reference ships a pybind11 module (ASMC_SRC/SRC/pybind.cpp:54-252,
re-exported by ASMC_SRC/SRC/__init__.py) whose classes use camelCase
methods. This module maps that surface onto the native fastsmc_tpu
implementation so existing scripts can switch with

    import fastsmc_tpu.compat as asmc

Covered: ``DecodingParams`` (both profiles), ``DecodingQuantities``,
``ASMC`` (decodeAllInJob / decodePairs by index or "ind#hap" id /
get_copy_of_results), ``FastSMC`` (run), ``BinaryDataReader``
(getNextLine / moreLinesInFile), ``IbdPairDataLine`` (toString), and the
return structs. Attribute spellings follow the pybind bindings
(``per_pair_MAPs`` etc. aliased onto the snake_case natives).
"""

from __future__ import annotations

import enum
from typing import List, Optional, Sequence, Union

from .config import DecodingParams as _Params
from .io.decoding_quantities import DecodingQuantities as _DQ
from .io.writers import BinaryDataReader as _Reader
from .io.writers import IbdPairDataLine

# reference method spelling (pybind.cpp:195)
if not hasattr(IbdPairDataLine, "toString"):
    IbdPairDataLine.toString = IbdPairDataLine.to_string
from .pipelines import asmc as _asmc
from .pipelines import fastsmc as _fastsmc

# notebooks do `from asmc.preparedecoding import *` (asmc-api-test.ipynb);
# expose the same submodule name on this compat surface
from . import preparedecoding  # noqa: E402,F401

__all__ = [
    "DecodingParams", "DecodingQuantities", "ASMC", "FastSMC",
    "BinaryDataReader", "IbdPairDataLine", "DecodePairsReturnStruct",
    "DecodingReturnValues", "DecodingMode", "DecodingModeOverall",
    "preparedecoding",
]


class DecodingModeOverall(enum.IntEnum):
    """pybind.cpp:55-57."""
    sequence = 0
    array = 1


class DecodingMode(enum.IntEnum):
    """pybind.cpp:58-62."""
    sequenceFolded = 0
    arrayFolded = 1
    sequence = 2
    array = 3


# camelCase pybind attribute -> native snake_case field
# (pybind.cpp:146-178; names that already match are omitted)
_PARAM_ALIASES = {
    "inFileRoot": "in_file_root",
    "decodingQuantFile": "decoding_quant_file",
    "outFileRoot": "out_file_root",
    "jobInd": "job_ind",
    "decodingModeString": "decoding_mode",
    "decodingSequence": "decoding_sequence",
    "foldData": "fold_data",
    "usingCSFS": "using_csfs",
    "useAncestral": "use_ancestral",
    "skipCSFSdistance": "skip_csfs_distance",
    "noBatches": "no_batches",
    "batchSize": "batch_size",
    "recallThreshold": "recall_threshold",
    "FastSMC": "fastsmc",
    "BIN_OUT": "bin_out",
    "useKnownSeed": "use_known_seed",
    "outputIbdSegmentLength": "output_ibd_segment_length",
    "hashingWordSize": "hashing_word_size",
    "constReadAhead": "const_read_ahead",
    "noConditionalAgeEstimates": "no_conditional_age_estimates",
    "doPosteriorSums": "do_posterior_sums",
    "doPerPairMAP": "do_per_pair_map",
    "doPerPairPosteriorMean": "do_per_pair_posterior_mean",
    "expectedCoalTimesFile": "expected_coal_times_file",
    "withinOnly": "within_only",
    "doMajorMinorPosteriorSums": "do_major_minor_posterior_sums",
}

# the real config fields (strict-attribute check in __setattr__)
import dataclasses as _dataclasses  # noqa: E402

_PARAM_FIELDS = frozenset(f.name for f in _dataclasses.fields(_Params))


class DecodingParams(_Params):
    """Reference pybind DecodingParams: camelCase read/write attributes and
    the validate methods, as used attribute-style in notebooks/fastsmc.ipynb
    (pybind.cpp:122-179)."""

    def __getattr__(self, name):
        # only called when normal lookup fails, i.e. for camelCase spellings
        snake = _PARAM_ALIASES.get(name)
        if snake is None:
            raise AttributeError(name)
        return getattr(self, snake)

    def __setattr__(self, name, value):
        if name == "decodingMode":
            # the enum field is distinct from decodingModeString in the
            # reference (DecodingParams.hpp:37-38): assigning it does NOT
            # rewrite the string, and validate re-derives the enum from the
            # string (processOptions, DecodingParams.cpp:502-533) — so a
            # bare enum assignment is overridden at validate time, exactly
            # like the pybind surface.
            object.__setattr__(self, "_decoding_mode_enum",
                               DecodingMode(value))
            return
        snake = _PARAM_ALIASES.get(name, name)
        # strict surface (pybind rejects unknown attributes): only known
        # camelCase aliases, real config fields, and private state pass
        if snake not in _PARAM_FIELDS and not snake.startswith("_"):
            raise AttributeError(
                f"'DecodingParams' has no attribute {name!r}")
        object.__setattr__(self, snake, value)

    @property
    def decodingMode(self) -> DecodingMode:
        shadow = self.__dict__.get("_decoding_mode_enum")
        if shadow is not None:
            return shadow
        if self.decoding_mode == "array":
            return (DecodingMode.arrayFolded if self.fold_data
                    else DecodingMode.array)
        return (DecodingMode.sequenceFolded if self.fold_data
                else DecodingMode.sequence)

    @decodingMode.setter
    def decodingMode(self, value):
        self.__setattr__("decodingMode", value)

    def validateParamsFastSMC(self) -> bool:
        """DecodingParams.cpp:278-464 — returns True when consistent.

        Like the reference, validating FastSMC params with the FastSMC flag
        unset is a hard error (DecodingParams.cpp:282-287)."""
        if not self.fastsmc:
            raise RuntimeError(
                "Attempting to validate FastSMC parameters but FastSMC flag "
                "is false. Set DecodingParams.FastSMC to true?")
        object.__setattr__(self, "_decoding_mode_enum", None)
        self.finalize()
        return True

    def validateParams(self) -> bool:
        object.__setattr__(self, "_decoding_mode_enum", None)
        self.finalize()
        return True


def DecodingQuantities(path: str) -> _DQ:
    """Reference ctor signature: DecodingQuantities(fileName)
    (pybind.cpp:100-101)."""
    return _DQ.load(path)


class DecodePairsReturnStruct:
    """camelCase view over the native result struct
    (pybind.cpp:79-88 attribute spellings)."""

    def __init__(self, native):
        self._native = native

    def __getattr__(self, name):
        aliases = {
            "per_pair_MAPs": "per_pair_maps",
            "min_MAPs": "min_maps",
            "argmin_MAPs": "argmin_maps",
        }
        return getattr(self._native, aliases.get(name, name))


class DecodingReturnValues:
    """pybind.cpp:71-78 field spellings."""

    def __init__(self, native):
        self._native = native

    @property
    def sumOverPairs(self):
        return self._native.sum_over_pairs

    @property
    def sumOverPairs00(self):
        return self._native.sum_over_pairs00

    @property
    def sumOverPairs01(self):
        return self._native.sum_over_pairs01

    @property
    def sumOverPairs11(self):
        return self._native.sum_over_pairs11

    @property
    def siteWasFlippedDuringFolding(self):
        return self._native.site_was_flipped

    def __getattr__(self, name):
        return getattr(self._native, name)


class ASMC:
    """ASMC facade with the reference constructor overloads and camelCase
    methods (ASMC.hpp:30-69, pybind.cpp:235-251)."""

    def __init__(self, params_or_in_file_root: Union[_Params, str],
                 decoding_quant_file: str = "",
                 out_file_root: str = ""):
        if isinstance(params_or_in_file_root, _Params):
            params = params_or_in_file_root
        else:
            params = _Params.asmc(params_or_in_file_root,
                                  decoding_quant_file,
                                  out_file_root or params_or_in_file_root)
        self._impl = _asmc.ASMC(params)
        self._results = None

    def decodeAllInJob(self):
        return DecodingReturnValues(
            self._impl.decode_all_in_job(verbose=False))

    def decodePairs(self, hap_indices_a: Sequence, hap_indices_b: Sequence,
                    per_pair_posteriors: bool = False,
                    sum_of_posteriors: bool = False,
                    per_pair_posterior_means: bool = False,
                    per_pair_MAPs: bool = False) -> None:
        self._results = self._impl.decode_pairs(
            list(hap_indices_a), list(hap_indices_b),
            per_pair_posteriors=per_pair_posteriors,
            sum_of_posteriors=sum_of_posteriors,
            per_pair_posterior_means=per_pair_posterior_means,
            per_pair_maps=per_pair_MAPs)

    def get_copy_of_results(self) -> DecodePairsReturnStruct:
        import copy
        return DecodePairsReturnStruct(copy.deepcopy(self._results))

    def get_ref_of_results(self) -> DecodePairsReturnStruct:
        return DecodePairsReturnStruct(self._results)


class FastSMC:
    """FastSMC facade (FastSMC.hpp:26-55, pybind.cpp:231-234)."""

    def __init__(self, params_or_in_dir: Union[_Params, str, None] = None,
                 out_dir: Optional[str] = None, *,
                 in_dir: Optional[str] = None):
        # reference pybind exposes both FastSMC(params) and
        # FastSMC(in_dir=..., out_dir=...) (pybind.cpp:231-234, used
        # keyword-style in notebooks/fastsmc-minimal.ipynb)
        if in_dir is not None:
            params_or_in_dir = in_dir
        if isinstance(params_or_in_dir, _Params):
            self._params = params_or_in_dir
        else:
            if params_or_in_dir is None or out_dir is None:
                raise TypeError("FastSMC(in_dir, out_dir) needs both")
            self._params = _Params.fastsmc_defaults(
                params_or_in_dir, out_file_root=out_dir)
        self._impl = None

    def run(self) -> None:
        if self._impl is None:
            self._impl = _fastsmc.FastSMC(self._params)
        self._impl.run(verbose=False)


class BinaryDataReader:
    """camelCase reader methods (pybind.cpp:197-200)."""

    def __init__(self, binary_file: str):
        self._impl = _Reader(binary_file)
        self._it = iter(self._impl)
        self._next = self._advance()

    def _advance(self):
        try:
            return next(self._it)
        except StopIteration:
            return None

    def moreLinesInFile(self) -> bool:
        return self._next is not None

    def getNextLine(self) -> IbdPairDataLine:
        line = self._next
        if line is None:
            raise RuntimeError("no more lines in file")
        self._next = self._advance()
        return line
