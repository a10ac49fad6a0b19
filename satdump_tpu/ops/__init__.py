"""Compute kernels: batched, pure-JAX DSP stages and FEC codecs.

Design (see SURVEY.md §7): every op is a pure function
``(state, block) -> (state, block')`` over large fixed-size sample blocks.
Linear recurrences (DC blocker, NCO) use closed forms / associative scans;
nonlinear feedback loops (Costas, clock recovery) are `lax.scan`s carrying
loop state, with feedforward fast-path variants; FEC codecs are lane-parallel
vectorized kernels over batches of frames.
"""
