"""FEC codecs as lane-parallel vectorized kernels (ref: src-core/common/codings/)."""
