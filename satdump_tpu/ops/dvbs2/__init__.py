"""DVB-S2 (EN 302 307-1) receive/transmit chain, TPU-first.

Reference behavior: plugins/dvb_support/dvbs2/ (PL sync, pilot PLL, soft
demap, demod module) and plugins/dvb_support/codings/dvb-s2/ (LDPC, BCH,
descramblers). The layout here is re-designed for batched JAX execution:
whole PLFRAMEs are processed as arrays (frames in lanes), the PL header
search is one differential-correlation pass over the block, and the
LDPC/BCH decoders are batched over frames.
"""
