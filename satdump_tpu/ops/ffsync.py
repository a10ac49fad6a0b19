"""Feedforward carrier + timing synchronization — the TPU fast path.

The reference recovers carrier and symbol timing with per-sample feedback
loops (Costas ``common/dsp/pll/costas_loop.cpp``, M&M
``common/dsp/clock_recovery/clock_recovery_mm.cpp``) — strictly sequential
recurrences that a vector machine cannot parallelize. This module replaces
them with the classical *feedforward* estimators, which are embarrassingly
parallel and map directly onto the TPU's FFT + VPU units:

* carrier: FFT of x^M for the coarse frequency (M-PSK modulation stripping),
  then per-sub-block Viterbi&Viterbi phase estimates, unwrapped and linearly
  interpolated per sample;
* timing: the Oerder&Meyr / squaring spectral-line estimator — the symbol-rate
  tone of |x|^2 yields the fractional timing phase per sub-block; a linear fit
  over sub-blocks gives (offset, clock skew); symbols are then produced by a
  batched polyphase gather (the same interpolator bank as the reference's M&M
  block, firdes.mm_interpolator_bank / clock_recovery_mm.cpp:18).

Equivalence contract: the BASELINE demands bit-exactness only *after FEC*
(SURVEY.md §7), which these estimators satisfy at operating SNRs; the faithful
scan loops in costas.py / clock_recovery.py remain available for golden parity
against the reference's soft symbols.

Everything here is shape-static and jit/shard_map friendly: no data-dependent
control flow, outputs use the fixed-capacity + valid-mask convention.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from satdump_tpu.ops.firdes import mm_interpolator_bank


_KERNEL_DEFAULT = True  # flip False to force the XLA gather path


def _on_tpu() -> bool:
    """True when the default JAX backend is a TPU (incl. the axon tunnel)."""
    import jax
    try:
        plat = jax.default_backend()
    except Exception:
        return False
    return plat in ("tpu", "axon")
from satdump_tpu.utils import xfer


# ---------------------------------------------------------------------------
# Carrier frequency: FFT of x^M (modulation stripping)
# ---------------------------------------------------------------------------
def cfo_estimate(x: jnp.ndarray, order: int,
                 suppress_nyquist_image: bool = False) -> jnp.ndarray:
    """Coarse+fine carrier frequency offset estimate, cycles/sample.

    Raises the (unit-normalized) signal to the Mth power to strip M-PSK
    modulation, takes the FFT, and refines the peak bin with quadratic
    interpolation. Accurate to ~1/(10·N) cycles/sample at working SNR.

    At 2 samples/symbol, x^M alternates clean symbol-instant tones with
    mid-symbol junk; this fs/2 alternation modulates the carrier line into
    an equal-strength image at f±fs/2 that the argmax can lock instead
    (measured: -0.1249 for a true +0.0001). `suppress_nyquist_image`
    pre-averages adjacent samples (an exact null at fs/2) before the FFT.
    """
    n = x.shape[-1]
    u = x / jnp.maximum(jnp.abs(x), 1e-12)
    xm = u ** order
    if suppress_nyquist_image:
        xm = 0.5 * (xm + jnp.roll(xm, -1))
    X = jnp.fft.fft(xm)
    p = jnp.abs(X)
    k = jnp.argmax(p)
    # quadratic peak interpolation on the magnitude spectrum
    pm1 = p[(k - 1) % n]
    p0 = p[k]
    pp1 = p[(k + 1) % n]
    denom = pm1 - 2.0 * p0 + pp1
    delta = jnp.where(jnp.abs(denom) > 1e-9,
                      0.5 * (pm1 - pp1) / denom, 0.0)
    delta = jnp.clip(delta, -0.5, 0.5)
    f = (k.astype(jnp.float32) + delta) / n
    f = jnp.mod(f + 0.5, 1.0) - 0.5          # wrap to [-0.5, 0.5)
    return f / order


def cfo_correct(x: jnp.ndarray, f: jnp.ndarray, phase0: jnp.ndarray = 0.0
                ) -> jnp.ndarray:
    """Mix x by exp(-j(2π f n + phase0))."""
    n = jnp.arange(x.shape[-1], dtype=jnp.float32)
    return x * jnp.exp(-1j * (2 * jnp.pi * f * n + phase0)).astype(x.dtype)


# ---------------------------------------------------------------------------
# Carrier phase: per-sub-block Viterbi&Viterbi, unwrapped + interpolated
# ---------------------------------------------------------------------------
def _wrap(a: jnp.ndarray, period: float) -> jnp.ndarray:
    return jnp.mod(a + period / 2, period) - period / 2


def vv_phase_track(x: jnp.ndarray, order: int, sub: int,
                   last_phase: jnp.ndarray | None = None,
                   const_rotation: float = 0.0
                   ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Viterbi&Viterbi feedforward phase over sub-blocks of length `sub`.

    Returns (per-sample phase estimate (N,), final phase scalar). The 2π/M
    M-fold ambiguity is resolved *for continuity only*: each sub-block phase
    is unwrapped relative to its neighbor (and optionally to `last_phase`
    from the previous block), leaving one global ambiguity for the downstream
    deframer/Viterbi phase search — same division of labor as the reference
    (generic_correlator.h rotated-syncword replicas).

    `const_rotation` is the constellation's first-point angle θ0: for points at
    θ0 + k·2π/M, u^M carries a constant factor e^{jMθ0} (= -1 for diagonal
    QPSK, θ0=π/4) which must be divided out before taking the argument.
    """
    n = x.shape[-1]
    nsub = n // sub
    u = x[: nsub * sub].reshape(nsub, sub)
    un = u / jnp.maximum(jnp.abs(u), 1e-12)
    s = jnp.sum(un ** order, axis=-1)                    # (nsub,)
    if const_rotation:
        s = s * jnp.exp(-1j * order * const_rotation)
    ph = jnp.angle(s) / order                            # (-π/M, π/M]
    period = 2 * jnp.pi / order

    # unwrap: cumulative sum of wrapped diffs
    d = _wrap(jnp.diff(ph), period)
    first = ph[0] if last_phase is None else (
        last_phase + _wrap(ph[0] - last_phase, period))
    ph_u = jnp.concatenate([first[None], first + jnp.cumsum(d)])

    # Per-sample linear interpolation between sub-block centers. The centers
    # are UNIFORM, so the lerp is pure reshape/broadcast — jnp.interp's
    # searchsorted+gather lowers catastrophically on TPU (measured 8 Msps vs
    # multi-Gsps for the rest of the chain, tools/ffprofile.py).
    # Segment j covers samples [sub/2 + j·sub, sub/2 + (j+1)·sub); the head
    # and tail half-blocks clamp to the end values (jnp.interp semantics).
    if nsub > 1:
        slopes = ph_u[1:] - ph_u[:-1]                        # (nsub-1,)
        ramp = jnp.arange(sub, dtype=jnp.float32) / sub
        core = ph_u[:-1, None] + slopes[:, None] * ramp[None, :]
        core = core.reshape(-1)                              # (n - sub,)
        head = jnp.full((sub // 2,), ph_u[0], jnp.float32)
        tail_n = n - (nsub - 1) * sub - sub // 2
        tail = jnp.full((tail_n,), ph_u[-1], jnp.float32)
        ph_t = jnp.concatenate([head, core, tail])
    else:
        ph_t = jnp.full((n,), ph_u[0], jnp.float32)
    return ph_t, ph_u[-1]


# ---------------------------------------------------------------------------
# Timing: Oerder&Meyr spectral-line estimator + linear drift fit
# ---------------------------------------------------------------------------
_HALF_SAMPLE_FIR = None


def _half_sample_taps(ntaps: int = 15) -> np.ndarray:
    global _HALF_SAMPLE_FIR
    if _HALF_SAMPLE_FIR is None:
        k = np.arange(ntaps) - ntaps // 2
        h = np.sinc(k - 0.5) * np.hamming(ntaps)
        _HALF_SAMPLE_FIR = (h / h.sum()).astype(np.float32)
    return _HALF_SAMPLE_FIR


def om_timing_fit(x: jnp.ndarray, sps: float, sub: int
                  ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Estimate (tau0, skew) such that symbol k sits at tau0 + k·sps·(1+skew).

    Per sub-block, correlate |x|² against the symbol-rate tone e^{-j2πn/sps};
    the argument gives the local fractional timing in samples. A least-squares
    line through the unwrapped per-sub-block estimates yields the block-wide
    timing offset and clock skew (two scalars — this *is* the two-pass
    "timing-estimate then resample" formulation from SURVEY.md §7).

    Near 2 samples/symbol the symbol-rate line of |x|² sits at Nyquist and
    its quadrature component is unobservable (the +Rs/−Rs alias fold is
    real). x itself is bandlimited below Nyquist though, so the timing
    observable is rebuilt alias-free: interpolate x by 2 (15-tap half-sample
    FIR), form |x|² at 4 sps, and run the same estimator there.
    """
    if sps < 2.1:
        hs = _half_sample_taps()
        nt = len(hs)
        xe = jnp.concatenate(
            [jnp.zeros(nt // 2, x.dtype), x, jnp.zeros(nt // 2, x.dtype)])
        xh = jnp.zeros_like(x)
        for k in range(nt):
            xh = xh + hs[k] * xe[k: k + x.shape[-1]]
        # doubled-rate stream e2[2k]=|x|², e2[2k+1]=|xh|² correlated with
        # the 2·sps tone — WITHOUT materializing the interleave (a (N,2)
        # ->(2N,) relayout): split the tone into its even/odd combs and
        # take two matvecs (numerically the same sum, reassociated)
        n = x.shape[-1]
        nsub2 = (2 * n) // (2 * sub)
        nps = nsub2 * sub                 # per-phase samples used
        ex = _pw(x)[:nps].reshape(nsub2, sub)
        eh = _pw(xh)[:nps].reshape(nsub2, sub)
        sps2 = 2.0 * sps
        tke = np.exp(-2j * np.pi * ((2.0 * np.arange(sub)) % sps2) / sps2)
        tko = np.exp(-2j * np.pi * ((2.0 * np.arange(sub) + 1) % sps2)
                     / sps2)
        cr = ex @ jnp.asarray(tke.real, jnp.float32) \
            + eh @ jnp.asarray(tko.real, jnp.float32)
        ci = ex @ jnp.asarray(tke.imag, jnp.float32) \
            + eh @ jnp.asarray(tko.imag, jnp.float32)
        tj = np.exp(-2j * np.pi * ((np.arange(nsub2) * float(2 * sub))
                                   % sps2) / sps2)
        c = jnp.asarray(tj.astype(np.complex64)) * (cr + 1j * ci)
        tau_e, skew = _om_fit(c, sps2, 2 * sub)
        return tau_e * 0.5, skew
    return _om_core(_pw(x), sps, sub)


def _pw(x: jnp.ndarray) -> jnp.ndarray:
    """|x|² without the sqrt that jnp.abs(complex) spends."""
    return jnp.real(x) ** 2 + jnp.imag(x) ** 2


def _om_core(e_sig: jnp.ndarray, sps: float, sub: int
             ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    n = e_sig.shape[-1]
    nsub = n // sub
    e = e_sig[: nsub * sub].reshape(nsub, sub)
    # tone exp(-2πj n/sps) with n = j·sub + k separates into an outer
    # product tone_j ⊗ tone_k — nsub + sub transcendentals instead of n
    # (the full-grid exp was 4.6 ms of the 29 ms bench block, r5 profile),
    # and the per-sub-block correlation collapses to ONE real×complex
    # matvec: c_j = tone_j · Σ_k e[j,k]·tone_k. The tones are host f64
    # constants: the phase 2π·n/sps needs exact modular reduction (at
    # n ~ 4M a float32 phase has ~0.5 rad of rounding — the old full-grid
    # f32 exp silently suffered exactly this).
    tk = np.exp(-2j * np.pi * (np.arange(sub) % sps) / sps)
    tj = np.exp(-2j * np.pi * ((np.arange(nsub) * float(sub)) % sps) / sps)
    cr = e @ jnp.asarray(tk.real, jnp.float32)
    ci = e @ jnp.asarray(tk.imag, jnp.float32)
    c = jnp.asarray(tj.astype(np.complex64)) * (cr + 1j * ci)  # (nsub,)
    return _om_fit(c, sps, sub)


def _om_fit(c: jnp.ndarray, sps: float, sub: int
            ) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-sub-block complex correlations -> (tau0, skew) line fit."""
    nsub = c.shape[0]
    tau = -jnp.angle(c) / (2 * jnp.pi) * sps               # samples, mod sps

    # unwrap modulo sps across sub-blocks
    d = _wrap(jnp.diff(tau), sps)
    tau_u = jnp.concatenate([tau[:1], tau[0] + jnp.cumsum(d)])

    # weighted LSQ line over sub-block centers (weight = tone magnitude)
    tc = (jnp.arange(nsub, dtype=jnp.float32) + 0.5) * sub
    w = jnp.abs(c) + 1e-12
    wm = jnp.sum(w)
    tm = jnp.sum(w * tc) / wm
    ym = jnp.sum(w * tau_u) / wm
    cov = jnp.sum(w * (tc - tm) * (tau_u - ym))
    var = jnp.sum(w * (tc - tm) ** 2)
    slope = jnp.where(var > 0, cov / var, 0.0)
    slope = jnp.clip(slope, -0.01, 0.01)          # clock skew bound (1e4 ppm)
    tau0 = ym - slope * tm
    return tau0, slope


class FFClockState(NamedTuple):
    next_pos: jnp.ndarray   # float32: position of the next symbol, in samples
                            # relative to the start of the *current* block
    history: jnp.ndarray    # (ntaps-1,) input tail carried between blocks
    last_phase: jnp.ndarray  # float32: last V&V carrier phase (continuity)
    last_f: jnp.ndarray      # float32: last CFO estimate (cycles/sample)
    nco_phase: jnp.ndarray   # float32: CFO-removal NCO phase, carried across
                             # blocks so the corrected signal stays
                             # phase-continuous (else the V&V ambiguity would
                             # re-resolve arbitrarily at every block seam)
    rrc_history: jnp.ndarray = None  # (rrc_ntaps-1,) matched-filter input
                             # tail; empty -> zero-history per block (legacy)
    oq_imag: jnp.ndarray = None      # scalar f32: previous sample's imag for
                             # the OQPSK half-symbol delay (seam carry)
    sym_phase: jnp.ndarray = None    # scalar f32: symbol-domain V&V phase
                             # continuity (OQPSK second-stage refinement)


def ff_clock_init(ntaps: int = 8, dtype=jnp.complex64, rrc_ntaps: int = 0
                  ) -> FFClockState:
    return FFClockState(
        next_pos=jnp.zeros((), jnp.float32),
        history=xfer.zeros((ntaps - 1,), dtype),
        last_phase=jnp.zeros((), jnp.float32),
        last_f=jnp.zeros((), jnp.float32),
        nco_phase=jnp.zeros((), jnp.float32),
        rrc_history=xfer.zeros((max(rrc_ntaps - 1, 0),), dtype),
        oq_imag=jnp.zeros((), jnp.float32),
        sym_phase=jnp.zeros((), jnp.float32),
    )


def ff_resample_at(ext: jnp.ndarray, positions: jnp.ndarray, bank: jnp.ndarray,
                   n_in: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Polyphase interpolation of `ext` (history+block) at fractional sample
    `positions` (relative to block start). Returns (samples, valid mask).

    The interpolator bank evaluated with window ext[floor(p)..floor(p)+ntaps-1]
    produces x evaluated at p − ntaps/2 (the windowed-sinc prototype's group
    delay — derivable from polyphase_bank's reversed-branch layout). A
    feedback loop (M&M) absorbs this constant, but a feedforward sampler must
    compensate, so we shift the requested positions by +ntaps/2 up front;
    validity is still judged against the caller's coordinates.
    """
    nfilt, ntaps = bank.shape
    # (convert inside the trace: host-np constants embed without the D2H
    # fetch that breaks lowering on the axon tunnel backend)
    bank = jnp.asarray(bank)
    # emission window: p ≥ −ntaps/2 reaches back into carried history; the
    # last ntaps/2 samples need the *next* block, so they are deferred (the
    # caller's carried next_pos re-requests them, rebased negative).
    valid_in = (positions >= -(ntaps // 2)) & (positions < n_in - ntaps // 2)
    positions = positions + ntaps / 2
    ip = jnp.floor(positions)
    frac = positions - ip
    src = ip.astype(jnp.int32)
    valid = valid_in & (src < n_in)
    srcc = jnp.clip(src, 0, n_in - 1)
    branch = jnp.clip(jnp.round(frac * nfilt).astype(jnp.int32), 0, nfilt - 1)
    idx = srcc[:, None] + jnp.arange(ntaps)[None, :]
    windows = ext[idx]                  # (cap, ntaps)
    taps = bank[branch]                 # (cap, ntaps)
    y = jnp.sum(windows * taps, axis=-1)
    return jnp.where(valid, y, 0).astype(ext.dtype), valid


def _strip_geometry(sps: float, ntaps: int, skew_max: float = 0.003
                    ) -> Tuple[int, int] | None:
    """(segment length G, strip width D) for the strided-strip resampler,
    or None when sps is too far from an integer for the strip to pay off."""
    s0 = round(sps)
    if s0 < 1:
        return None
    drift_rate = abs(sps - s0) + s0 * skew_max    # samples/symbol of drift
    D = 24
    budget = D - ntaps - 2
    if drift_rate <= 0:
        return 2048, D
    G = int(budget / drift_rate)
    if G < 128:
        return None
    return min(2048, 1 << (G.bit_length() - 1)), D


_BANK_POLY_CACHE: dict = {}


def _bank_poly_coefs(bank: np.ndarray, deg: int = 10) -> np.ndarray:
    """Fit each interpolator tap as a polynomial in the fractional delay.
    bank[branch, tap] with branch = round(frac * nfilt) — i.e. branch b
    covers frac ≈ b/nfilt. Returns Horner-ordered coefficients
    (deg+1, ntaps) float32, highest power first."""
    key = (bank.shape, float(np.sum(bank)), deg)
    hit = _BANK_POLY_CACHE.get(key)
    if hit is not None:
        return hit
    nfilt, ntaps = bank.shape
    fr = np.arange(nfilt) / nfilt
    co = np.stack([np.polyfit(fr, np.asarray(bank[:, t], np.float64), deg)
                   for t in range(ntaps)], axis=1).astype(np.float32)
    err = 0.0
    for t in range(ntaps):
        err = max(err, float(np.abs(
            np.polyval(co[:, t].astype(np.float64), fr)
            - bank[:, t]).max()))
    assert err < 5e-4, f"bank poly fit error {err}"
    _BANK_POLY_CACHE[key] = co
    return co


def resample_strip(ext: jnp.ndarray, start: jnp.ndarray, omega: jnp.ndarray,
                   bank: np.ndarray, *, out_cap: int, sps: float,
                   n_in: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Arithmetic-grid polyphase interpolation as strided strips — the pure
    XLA fast path (measured 199 Msym/s on v5e vs 59 for the banded-matmul
    Pallas kernel and 8 for the naive gather).

    Positions p_k = start + k·omega are split per G-symbol segment into a
    dynamic segment window (one row-gather of nseg contiguous slices), a
    static stride-s0 slice per strip lane m, and a banded weight built from
    8 compare-selects — no per-symbol gather anywhere. Semantics mirror
    ff_resample_at (group-delay shift, validity masking).
    """
    nfilt, ntaps = bank.shape
    geo = _strip_geometry(sps, ntaps)
    assert geo is not None, "resample_strip called with unsuitable sps"
    G, D = geo
    s0 = round(sps)
    n_ext = ext.shape[0]
    nseg = -(-out_cap // G)
    cap = nseg * G
    Lw = s0 * G + D + ntaps + 8
    pad = max(cap * s0 + Lw + 64 - n_ext, 0)
    extp = jnp.concatenate([ext, jnp.zeros(pad, ext.dtype)]) if pad else ext

    s_idx = jnp.arange(nseg, dtype=jnp.float32) * G
    c_s = jnp.floor(start + s_idx * omega).astype(jnp.int32)
    c_s = jnp.clip(c_s, 0, extp.shape[0] - Lw)
    seg = jax.vmap(
        lambda c: jax.lax.dynamic_slice(extp, (c,), (Lw,)))(c_s)

    k = jnp.arange(cap, dtype=jnp.float32)
    p = start + k * omega + ntaps / 2
    ip = jnp.floor(p)
    frac = p - ip
    src = ip.astype(jnp.int32)
    k_rel = jnp.arange(G, dtype=jnp.int32)
    d = src.reshape(nseg, G) - c_s[:, None] - s0 * k_rel[None, :]
    d = jnp.clip(d, 0, D - 1)

    # taps as per-tap POLYNOMIALS in frac (Horner), replacing the one-hot
    # MXU matmul: the (cap, 128) bf16 one-hot materialized ~256 MB of HBM
    # traffic and measured 0.83 ms/blk (tools/pickprofile.py); the
    # windowed-sinc bank is smooth in the branch index, so a degree-10 fit
    # reproduces every branch value to <2e-4 (below the 1/128 branch
    # quantization) in ~ntaps*deg FMAs over (cap,) — pure VPU
    coefs = _bank_poly_coefs(bank)                # (deg+1, ntaps) host np
    tp = jnp.full((cap, ntaps), float(coefs[0, 0]), jnp.float32) * 0 \
        + jnp.asarray(coefs[0])[None, :]
    for row in coefs[1:]:
        tp = tp * frac[:, None] + jnp.asarray(row)[None, :]
    taps = tp.reshape(nseg, G, ntaps)

    M = D + ntaps
    # de-interleave ONCE into s0 contiguous planes so each strip is a
    # static contiguous slice instead of a stride-s0 gather (the 32
    # strided slices were the bulk of this stage's 5.3 ms, r5 profile):
    # seg[:, m : m + s0·G : s0] == planes[m % s0][:, m//s0 : m//s0 + G]
    planes = [seg[:, r::s0] for r in range(s0)]
    y = jnp.zeros((nseg, G), ext.dtype)
    for m in range(M):
        Xm = planes[m % s0][:, m // s0: m // s0 + G]
        md = m - d
        w = jnp.zeros((nseg, G), jnp.float32)
        for t in range(ntaps):
            w = w + jnp.where(md == t, taps[..., t], 0.0)
        y = y + Xm * w
    pos = p - ntaps / 2
    valid = (pos >= -(ntaps // 2)) & (src < n_in) & \
            (pos < n_in - ntaps // 2)
    y = jnp.where(valid[:cap].reshape(nseg, G), y, 0)
    return y.reshape(-1)[:out_cap].astype(ext.dtype), valid[:out_cap]


def ff_clock_recovery(state: FFClockState, x: jnp.ndarray, *, sps: float,
                      sub: int = 2048, bank: jnp.ndarray | None = None,
                      out_cap: int | None = None,
                      use_kernel: bool | None = None
                      ) -> Tuple[FFClockState, jnp.ndarray, jnp.ndarray]:
    """Feedforward symbol-timing recovery over one block.

    Returns (state', symbols[out_cap], valid[out_cap]). The symbol grid is
    anchored to the carried `next_pos`; only the *fractional* part is snapped
    to this block's O&M estimate, so the symbol count stays continuous across
    block boundaries (no duplicated/dropped symbols at seams).
    """
    if bank is None:
        bank = mm_interpolator_bank()  # host np: device-resident closure consts break axon lowering
    nfilt, ntaps = bank.shape
    n = x.shape[-1]
    if out_cap is None:
        out_cap = int(np.ceil(n / sps * 1.01)) + 2

    tau0, skew = om_timing_fit(x, sps, sub)
    omega = sps * (1.0 + skew)

    # snap carried next_pos to the nearest point on the estimated timing grid
    k0 = jnp.round((state.next_pos - tau0) / omega)
    start = tau0 + k0 * omega

    k = jnp.arange(out_cap, dtype=jnp.float32)
    positions = start + k * omega

    ext = jnp.concatenate([state.history[: ntaps - 1], x])
    strip_geo = _strip_geometry(sps, ntaps)
    if use_kernel is None:
        use_kernel = _on_tpu() and _KERNEL_DEFAULT and strip_geo is None
    if strip_geo is not None:
        syms, valid = resample_strip(ext, start, omega, np.asarray(bank),
                                     out_cap=out_cap, sps=sps, n_in=n)
    elif use_kernel:
        # Pallas tile kernel: DMA + one-hot MXU matmuls. The XLA gather
        # formulation runs at ~8 Msymb/s on TPU (tools/gathervariants.py);
        # the kernel is compute-shaped instead. Symbol values may differ by
        # one interpolator-branch step (1-ulp position rounding) vs the XLA
        # path — inside the soft-symbol noise floor, bit-exact after FEC.
        from satdump_tpu.ops.pallas.resample import resample_arith_grid
        y = resample_arith_grid(ext, start, omega, jnp.asarray(bank),
                                out_cap=out_cap, sps_max=sps * 1.02)
        valid_in = (positions >= -(ntaps // 2)) & (positions < n - ntaps // 2)
        src = jnp.floor(positions + ntaps / 2).astype(jnp.int32)
        valid = valid_in & (src < n)
        syms = jnp.where(valid, y, 0)
    else:
        syms, valid = ff_resample_at(ext, positions, bank, n)

    # next symbol position after the last valid one, rebased to the next block
    n_valid = jnp.sum(valid.astype(jnp.int32))
    next_pos = start + n_valid.astype(jnp.float32) * omega - n
    new_state = state._replace(next_pos=next_pos, history=ext[n:])
    return new_state, syms, valid


def _direct_mf(x: jnp.ndarray, taps: np.ndarray) -> jnp.ndarray:
    """Matched filter as ntaps shifted multiply-adds (direct form). Same
    causal alignment as _segmented_mf: y[k] = sum_t taps[t]*x[k-t+ntaps-1]
    windowed on x. For short real-tap filters (RRC, 31 taps) the direct
    form is one fused pass over HBM — the FFT formulation pays 2 full
    transforms (candidate replacement; selected via chainprofile)."""
    ntaps = taps.shape[0]
    n = x.shape[-1]
    xp = jnp.concatenate([jnp.zeros(ntaps - 1, x.dtype), x])
    y = jnp.zeros(n, x.dtype)
    for t in range(ntaps):
        c = float(taps[t])
        if c == 0.0:
            continue
        y = y + c * jax.lax.slice(xp, (ntaps - 1 - t,),
                                  (ntaps - 1 - t + n,))
    return y


def _segmented_mf(x: jnp.ndarray, taps: np.ndarray,
                  seg: int = 1 << 14) -> jnp.ndarray:
    """Matched filter via SEGMENTED overlap-save: a batch of seg-point FFTs
    instead of one next-pow2(n) monolith (for n=2M the monolith pads to 4M
    and runs ~3x slower than the batched small transforms). Output y[k] =
    sum_t taps[t] * x[k - t + ntaps - 1] windowed causally on x (same
    alignment as the single-FFT form it replaces)."""
    ntaps = taps.shape[0]
    n = x.shape[-1]
    if ntaps <= 64:
        # short kernels: the direct shifted-add form is one fused VPU
        # pass and beats both FFT variants (r5 chainprofile: 1.45 ms
        # segmented-FFT vs <0.3 ms direct at 31 taps x 2^21 samples)
        return _direct_mf(x, taps)
    if n <= seg:
        nfft = max(256, 1 << int(np.ceil(np.log2(n + ntaps - 1))))
        X = jnp.fft.fft(x, nfft)
        H = jnp.fft.fft(jnp.asarray(taps, jnp.float32), nfft)
        return jnp.fft.ifft(X * H)[:n].astype(jnp.complex64)
    nseg = -(-n // seg)
    pad = nseg * seg - n
    xp = jnp.concatenate([jnp.zeros(ntaps - 1, x.dtype), x,
                          jnp.zeros(pad, x.dtype)])
    # overlapping windows: segment i covers [i*seg, i*seg + seg + ntaps - 1)
    # of xp -> via two strided views (head: (nseg, ntaps-1), body reshape)
    body = xp[ntaps - 1:].reshape(nseg, seg)
    head = jnp.concatenate([
        xp[: ntaps - 1][None],
        body[:-1, seg - (ntaps - 1):]], axis=0)          # (nseg, ntaps-1)
    wins = jnp.concatenate([head, body], axis=1)         # (nseg, seg+ntaps-1)
    nfft = 1 << int(np.ceil(np.log2(seg + ntaps - 1)))
    H = jnp.fft.fft(jnp.asarray(taps, jnp.float32), nfft)
    Y = jnp.fft.ifft(jnp.fft.fft(wins, nfft, axis=-1) * H[None], axis=-1)
    y = Y[:, ntaps - 1: ntaps - 1 + seg].reshape(-1)
    return y[:n].astype(jnp.complex64)


# ---------------------------------------------------------------------------
# Composite feedforward PSK demod block (the flagship compute path)
# ---------------------------------------------------------------------------
def ff_psk_demod_block(state: FFClockState, x: jnp.ndarray, *, order: int,
                       sps: float, rrc_taps: jnp.ndarray,
                       bank: jnp.ndarray | None = None,
                       sub_phase: int = 1024, sub_timing: int = 2048,
                       out_cap: int | None = None,
                       use_kernel: bool | None = None,
                       oqpsk: bool = False
                       ) -> Tuple[FFClockState, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Full feedforward PSK demod for one IQ block: AGC → RRC (overlap-save
    FFT) → CFO removal (FFT of x^M) → V&V phase → O&M timing + polyphase
    symbol pick. Mirrors PSKDemodModule's chain (module_psk_demod.cpp:88-137)
    with every feedback loop replaced by its feedforward dual.

    `oqpsk=True` adds the half-symbol Q realignment (the feedforward dual of
    DelayOneImagBlock + Costas, module_psk_demod.cpp:119-136): the staggered
    stream's 4th-power line is weak and data-biased, so the coarse V&V runs
    with a large sub-block (residual phase is near-constant once the CFO is
    removed), the imag rail is delayed one sample (seam-carried), and a
    second, symbol-domain V&V refines the phase on the now-clean QPSK points
    (measured: BER 0 at SNR 16 dB where single-stage leaves 35° of jitter).

    Returns (state', symbols[out_cap] complex64, valid[out_cap], snr_db).
    NOTE: RRC history is folded into the carried sample history of the clock
    stage; for block sizes ≫ ntaps the seam error is confined to the halo and
    removed by the deframer (and by halo overlap in the sharded runner).
    """
    if bank is None:
        bank = mm_interpolator_bank()  # host np: device-resident closure consts break axon lowering
    n = x.shape[-1]

    # block AGC: normalize to unit mean magnitude
    g = 1.0 / jnp.maximum(jnp.mean(jnp.abs(x)), 1e-12)
    x = x * g.astype(x.dtype)

    # matched filter (causal overlap-save FFT). When the state carries an
    # RRC history tail the filter is seam-exact across blocks; with an empty
    # history (legacy states) each block starts cold and the deframer halo
    # absorbs the ntaps-long seam transient.
    ntaps_rrc = rrc_taps.shape[0]
    rh = state.rrc_history
    carry_rrc = rh is not None and rh.shape[0] == ntaps_rrc - 1
    xmf_in = jnp.concatenate([rh * g.astype(rh.dtype), x]) if carry_rrc else x
    skip = ntaps_rrc - 1 if carry_rrc else 0
    xf = _segmented_mf(xmf_in, rrc_taps)[skip: skip + n]
    if carry_rrc:
        # store the *pre-AGC-normalized* tail so next block's gain applies
        # (slice first — a full-array divide just to keep 30 samples is HBM
        # traffic for nothing)
        tail = x[n - (ntaps_rrc - 1):]
        state = state._replace(rrc_history=tail / g.astype(tail.dtype))

    # carrier: coarse CFO + fine V&V phase (continuity-carried). Diagonal
    # QPSK (points at ±45°/±135°, the soft-symbol convention of
    # module_psk_demod.cpp:203-213) puts u^4 at e^{jπ}: pass θ0 = π/4.
    f = cfo_estimate(xf, order, suppress_nyquist_image=(sps < 2.1))
    xc = cfo_correct(xf, f, state.nco_phase)
    nco = jnp.mod(state.nco_phase + 2 * jnp.pi * f * n, 2 * jnp.pi)
    theta0 = float(np.pi / 4) if order == 4 else 0.0
    if oqpsk:
        sub_phase = max(sub_phase, 4096)
    ph_t, last_ph = vv_phase_track(xc, order, sub_phase, state.last_phase,
                                   const_rotation=theta0)
    xp = xc * jnp.exp(-1j * ph_t).astype(xc.dtype)

    if oqpsk:
        # realign the Q rail: Im[t] <- Im[t-1] (one sample = T/2 at sps≈2),
        # previous block's trailing imag carried across the seam
        oq = state.oq_imag if state.oq_imag is not None \
            else jnp.zeros((), jnp.float32)
        prev_im = jnp.concatenate([oq[None].astype(jnp.float32),
                                   jnp.imag(xp[:-1])])
        state = state._replace(oq_imag=jnp.imag(xp[-1]).astype(jnp.float32))
        xp = (jnp.real(xp) + 1j * prev_im).astype(xp.dtype)

    # timing + symbol pick
    state2, syms, valid = ff_clock_recovery(
        state._replace(last_phase=last_ph, last_f=f, nco_phase=nco), xp,
        sps=sps, sub=sub_timing, bank=bank, out_cap=out_cap,
        use_kernel=use_kernel)

    if oqpsk:
        # second-stage V&V on the picked symbols: true QPSK points, so the
        # estimate is unbiased; continuity carried in sym_phase
        sp = state2.sym_phase if state2.sym_phase is not None \
            else jnp.zeros((), jnp.float32)
        ph_s, last_sp = vv_phase_track(jnp.where(valid, syms, 0), order,
                                       min(1024, max(64, syms.shape[0] // 8)),
                                       sp, const_rotation=theta0)
        syms = syms * jnp.exp(-1j * ph_s).astype(syms.dtype)
        state2 = state2._replace(sym_phase=last_sp)

    # SNR on the picked symbols (M2M4, as the reference's estimator)
    p = jnp.abs(jnp.where(valid, syms, 0)) ** 2
    cnt = jnp.maximum(jnp.sum(valid), 1)
    m2 = jnp.sum(p) / cnt
    m4 = jnp.sum(p ** 2) / cnt
    es = jnp.sqrt(jnp.maximum(2 * m2 * m2 - m4, 0.0))
    noise = jnp.maximum(m2 - es, 1e-20)
    snr = 10.0 * jnp.log10(jnp.maximum(es / noise, 1e-20))
    return state2, syms, valid, snr
