"""satdump_tpu — a TPU-native satellite baseband/decoding framework.

A from-scratch reimplementation of the capabilities of SatDump
(https://github.com/SatDump/SatDump) designed for TPUs: DSP stages are pure,
batched JAX transforms over large fixed-size blocks of IQ samples; FEC codecs
(Viterbi, Reed-Solomon, LDPC, ...) are lane-parallel vectorized kernels; and
scale-out shards channels and time-blocks over `jax.sharding.Mesh` with
overlap-save halo exchange.

Data-level contract (kept compatible with the reference,
see /root/reference SURVEY.md §0):

    baseband (IQ) -> soft (int8 soft symbols) -> cadu (FEC-decoded frames)
                  -> products (per-instrument images + metadata) -> composites

Top-level subpackages:
  core      config / logging / registry / events (ref: src-core/core, init.cpp)
  io        baseband file formats (ref: src-core/common/dsp/io)
  ops       DSP + FEC compute kernels, pure JAX/Pallas (ref: common/dsp, common/codings)
  pipeline  JSON pipeline engine + processing modules (ref: src-core/pipeline)
  models    per-mission decoders/instruments (ref: plugins/*_support)
  products  product/dataset model (ref: src-core/products)
  image     raster images + IO (ref: src-core/image)
  parallel  mesh sharding / halo exchange (new, TPU-native)
  utils     misc helpers
"""

__version__ = "0.1.0"

from satdump_tpu.core.config import Config, get_config  # noqa: F401
from satdump_tpu.core.log import logger  # noqa: F401
