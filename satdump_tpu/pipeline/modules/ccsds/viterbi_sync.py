"""Self-synchronizing r=1/2 Viterbi with phase/shift/IQ-swap ambiguity search.

Reference: src-core/common/codings/viterbi/viterbi_1_2.h — the decoder tries
every constellation phase x puncturing shift x optional IQ swap on a 2048-soft
test window, picks the hypothesis whose re-encoded BER clears the threshold,
then decodes the stream under that hypothesis until BER degrades.

TPU formulation: all hypotheses are decoded in ONE batched Viterbi call
(hypotheses ride the lane dimension), instead of the reference's serial loop.
"""

from __future__ import annotations

from typing import List, Tuple

import jax.numpy as jnp
import numpy as np

from satdump_tpu.ops.fec import convolutional as cc
from satdump_tpu.ops.fec.rotation import (PHASE_0, PHASE_90, PHASE_180,
                                          PHASE_270, rotate_soft)
from satdump_tpu.utils import xfer

TEST_BITS = 2048  # soft values in the BER test window (ref TEST_BITS_LENGTH)

ST_IDLE = 0
ST_SYNCED = 1


def _ber(raw_u8: np.ndarray, reenc: np.ndarray) -> float:
    """ref get_ber (viterbi_1_2.cpp:38-50): fraction mismatching, x2.5."""
    mask = raw_u8 != 128
    total = int(mask.sum())
    if total == 0:
        return 10.0
    errors = int((((raw_u8 > 127).astype(np.uint8) != reenc) & mask).sum())
    return errors / total * 2.5


class Viterbi12Sync:
    def __init__(self, ber_threshold: float, max_outsync: int,
                 phases: List[int] | None = None, check_iq_swap: bool = False,
                 traceback: int = 96):
        self.ber_threshold = ber_threshold
        self.max_outsync = max_outsync
        self.phases = phases if phases is not None else [PHASE_0, PHASE_90, PHASE_180, PHASE_270]
        self.check_swap = check_iq_swap
        self.state = ST_IDLE
        self.phase = PHASE_0
        self.shift = 0
        self.iq_swap = False
        self.invalid = 0
        self.ber = 10.0
        self.traceback = traceback
        self._stream = cc.StreamViterbi(batch=1, traceback=traceback)
        self._leftover = np.zeros(0, np.int8)

    # -- lock search ---------------------------------------------------------
    def _search(self, soft: np.ndarray) -> bool:
        test = soft[:TEST_BITS]
        if len(test) < TEST_BITS:
            return False
        hyps: List[Tuple[int, int, bool]] = []
        windows = []
        for swap in ([False, True] if self.check_swap else [False]):
            for ph in self.phases:
                rotated = rotate_soft(test, ph, swap)
                u8 = cc.soft_int8_to_u8(rotated)
                for shift in (0, 1):
                    w = u8[shift: shift + TEST_BITS - 2]
                    hyps.append((ph, shift, swap))
                    windows.append(w)
        W = np.stack(windows).astype(np.float32)         # (H, TEST-2)
        softs = W.reshape(len(hyps), -1, 2)
        bits, _ = cc.viterbi_decode_block(xfer.put(softs))
        bits = xfer.get(bits).astype(np.uint8)          # (H, T)
        reenc = cc.conv_encode_batch(bits)               # (H, 2T)
        best_i, best_ber = -1, 10.0
        for i, (ph, shift, swap) in enumerate(hyps):
            b = _ber(windows[i].astype(np.uint8), reenc[i])
            if b < self.ber_threshold and b < best_ber:
                best_i, best_ber = i, b
        if best_i < 0:
            self.ber = best_ber if best_ber < 10 else 10.0
            return False
        self.phase, self.shift, self.iq_swap = hyps[best_i]
        self.ber = best_ber
        self.state = ST_SYNCED
        self.invalid = 0
        self._stream = cc.StreamViterbi(batch=1, traceback=self.traceback)
        self._leftover = np.zeros(0, np.int8)
        return True

    # -- streaming decode ----------------------------------------------------
    def work(self, soft: np.ndarray) -> np.ndarray:
        """soft: signed int8 soft symbols (interleaved for QPSK). Returns
        decoded hard bits (uint8), possibly empty while unlocked."""
        soft = np.asarray(soft, np.int8)
        if self.state == ST_IDLE:
            if not self._search(soft):
                return np.zeros(0, np.uint8)
            # apply the shift once at lock: drop the first `shift` values
            soft = soft[self.shift:]

        rotated = rotate_soft(soft, self.phase, self.iq_swap)
        u8 = cc.soft_int8_to_u8(rotated)
        buf = np.concatenate([self._leftover_u8() , u8]) if len(self._leftover) else u8
        n_pairs = len(buf) // 2
        self._leftover = buf[n_pairs * 2:].astype(np.int8)  # store raw u8-128
        if n_pairs == 0:
            return np.zeros(0, np.uint8)
        pairs = buf[: n_pairs * 2].astype(np.float32).reshape(1, n_pairs, 2)
        bits = self._stream.decode(xfer.put(pairs))[0]

        # BER check on the first TEST_BITS of this buffer via re-encode
        # (ref viterbi_1_2.cpp:105-122) — note the streamed bits lag by D,
        # so compare the re-encode of aligned history instead: cheap proxy =
        # re-encode the freshly decoded bits against the matching delayed softs
        D = self.traceback
        if n_pairs > D + 256:
            reenc = cc.conv_encode_batch(bits[D:])
            raw = buf[: len(reenc)]
            self.ber = _ber(raw.astype(np.uint8), reenc)
            if self.ber > self.ber_threshold:
                self.invalid += 1
                if self.invalid > self.max_outsync:
                    self.state = ST_IDLE
            else:
                self.invalid = 0
        return bits

    def _leftover_u8(self) -> np.ndarray:
        return self._leftover.astype(np.uint8)

    def getState(self) -> int:
        return self.state
